"""SimHash operator tests: fingerprint properties + the banding pigeonhole
guarantee (every pair within Hamming distance bands-1 is found)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rust_gd_spark.operators import simhash as sh


@pytest.fixture(scope="module")
def turns_df(transcripts_df):
    return transcripts_df.withColumn(
        "uid", F.concat_ws(":", "conv_id", F.col("turn_idx").cast("string"))
    )


def test_fingerprint_identical_texts_equal(spark):
    df = spark.createDataFrame(
        [("a", "hello world this is a text"), ("b", "hello world this is a text"),
         ("c", "a completely different sentence altogether")],
        ["uid", "text"],
    )
    fps = {r.id: r.fp for r in sh.simhash_fingerprints(
        sh.char_ngram_df(df, "uid", "text")).collect()}
    assert fps["a"] == fps["b"]
    assert fps["a"] != fps["c"]


def test_small_edit_small_distance(spark):
    rng = np.random.default_rng(11)
    base = " ".join(
        "".join(chr(97 + c) for c in rng.integers(0, 26, 6)) for _ in range(80)
    )
    edited = base[:100] + "X" + base[101:]
    df = spark.createDataFrame([("a", base), ("b", edited)], ["uid", "text"])
    fps = {r.id: r.fp for r in sh.simhash_fingerprints(
        sh.char_ngram_df(df, "uid", "text")).collect()}
    dist = bin(fps["a"] ^ fps["b"]).count("1")
    assert dist <= 6, dist


def test_banding_pigeonhole_guarantee(spark, turns_df):
    """Operator output == brute-force O(n²) pairs at dist <= bands-1."""
    fps_df = sh.simhash_fingerprints(sh.char_ngram_df(turns_df, "uid", "text", k=8))
    rows = fps_df.collect()
    ids = [r.id for r in rows]
    v = np.array([np.uint64(r.fp) for r in rows], dtype=np.uint64)
    x = v[:, None] ^ v[None, :]
    # popcount via bit tricks on uint64
    cnt = np.zeros(x.shape, dtype=np.int64)
    y = x.copy()
    for _ in range(64):
        cnt += (y & np.uint64(1)).astype(np.int64)
        y >>= np.uint64(1)
    brute = {
        tuple(sorted((ids[i], ids[j])))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if cnt[i, j] <= 3
    }
    got_rows = sh.simhash_near_dup_pairs(
        turns_df, max_dist=3, max_bucket_size=10**6
    ).collect()
    got = {tuple(sorted((r.id_l, r.id_r))) for r in got_rows}
    assert brute, "fixture must contain simhash-close pairs"
    assert got == brute, (len(got), len(brute))
    # verify stage reports true distances
    dist_by_pair = {tuple(sorted((r.id_l, r.id_r))): r.hamming_dist for r in got_rows}
    idx = {u: i for i, u in enumerate(ids)}
    for (a, b), d in list(dist_by_pair.items())[:100]:
        assert d == cnt[idx[a], idx[b]]


def test_band_split_roundtrip(spark):
    df = spark.createDataFrame([("a", 0x123456789ABCDEF0)], ["id", "fp"])
    bands = sh.simhash_bands(df, bands=4).collect()
    vals = {r.band_idx: r.band_val for r in bands}
    assert vals == {0: 0xDEF0, 1: 0x9ABC, 2: 0x5678, 3: 0x1234}
