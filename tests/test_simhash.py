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
    v = np.array([r.fp & 0xFFFFFFFFFFFFFFFF for r in rows], dtype=np.uint64)
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


def test_rotation_bucket_containment_guarantee():
    """Pure math mirror of the Manku rotation scheme: any two fps at
    Hamming distance d < 64/prefix_bits share the full prefix in at least
    one rotation table (defaults: d <= 7, 8 tables, 8-bit prefix)."""
    import numpy as np

    tables, prefix_bits = 8, 8
    step = 64 // tables
    rng = np.random.default_rng(11)

    def buckets(fp: int):
        out = set()
        for t in range(tables):
            r = (t * step) % 64
            rot = ((fp << r) | (fp >> (64 - r))) & ((1 << 64) - 1) if r else fp
            out.add((t, rot >> (64 - prefix_bits)))
        return out

    for _ in range(300):
        fp = int(rng.integers(0, 1 << 63)) | (int(rng.integers(0, 2)) << 63)
        d = int(rng.integers(1, 8))  # 1..7
        mask = 0
        for pos in rng.choice(64, size=d, replace=False):
            mask |= 1 << int(pos)
        assert buckets(fp) & buckets(fp ^ mask), (hex(fp), hex(mask))


def test_rotation_candidates_find_planted_pairs(spark):
    """End-to-end candidate generation: planted pairs at d <= 7 among
    random fps are all caught (window generous for the tiny corpus)."""
    import numpy as np

    rng = np.random.default_rng(7)
    fps = [int(x) for x in rng.integers(-(1 << 63), 1 << 63, 400, dtype=np.int64)]
    planted = []
    for i in range(0, 40, 2):
        d = int(rng.integers(1, 8))
        mask = 0
        for pos in rng.choice(64, size=d, replace=False):
            mask |= 1 << int(pos)
        fps[i + 1] = int(np.int64(np.uint64(np.int64(fps[i])) ^ np.uint64(mask)))
        planted.append((i, i + 1, d))

    df = spark.createDataFrame(
        [(f"v{i:04d}", fp) for i, fp in enumerate(fps)], "id string, fp long"
    )
    pairs, audit = sh.simhash_rotation_candidate_pairs(df, window=400)
    got = {(r.id_l, r.id_r) for r in pairs.collect()}
    for i, j, d in planted:
        assert (f"v{i:04d}", f"v{j:04d}") in got, (i, j, d)
    assert audit.count() == 0
    # verify stage: exactly the planted pairs at their distances survive
    v = sh.verify_hamming(pairs, max_dist=7)
    vd = {(r.id_l, r.id_r): r.hamming_dist for r in v.collect()}
    for i, j, d in planted:
        assert vd[(f"v{i:04d}", f"v{j:04d}")] == d


def test_rotation_pairs_end_to_end_near_char(spark, transcripts_df):
    """Fixture near-char variants, DISTINCT texts (the pipeline's rep
    layer — identical texts form chains not cliques under a sorted window,
    so raw counts on duplicated input are incomparable): every pair fixed
    banding verifies at d ≤ 6 must also be found by the rotation path,
    whose bucket-containment guarantee extends to d ≤ 7."""
    from rust_gd_spark.pipeline import with_turn_uid

    df = with_turn_uid(transcripts_df).dropDuplicates(["text"])
    rotation = sh.simhash_rotation_pairs(df, "uid", "text", max_dist=6)
    fps = sh.simhash_fingerprints_from_text(df, "uid", "text", k=8)
    banded = sh.simhash_bands(fps, bands=4)
    cand, _ = sh.simhash_candidate_pairs(banded, 2000)
    banding = sh.verify_hamming(cand, max_dist=6)
    rot_set = {(r.id_l, r.id_r) for r in rotation.collect()}
    band_set = {(r.id_l, r.id_r) for r in banding.collect()}
    assert band_set, "banding must find near-char pairs on the fixture"
    # dense fp clusters chain (not clique) under the sorted window, so
    # demand the CLUSTERING-equivalent property the pipeline relies on:
    # every banding pair is connected through rotation pairs, and direct
    # pair coverage stays high.
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in rot_set:
        parent[find(a)] = find(b)
    missed = [(a, b) for a, b in band_set if find(a) != find(b)]
    assert not missed, missed
    direct = len(band_set & rot_set) / len(band_set)
    assert direct >= 0.9, direct


def test_planted_d5_found_by_rotations_missed_by_banding(spark):
    """The regime the rotation mode EXISTS for (round-3 VERDICT #5): a
    pair at Hamming distance 5 whose differing bits touch ALL four 16-bit
    bands is invisible to fixed 4-band banding (no shared band ⇒ no
    candidate) but guaranteed by the rotation scheme (d=5 < 64/prefix_bits
    ⇒ co-buckets in ≥ 3 of 8 tables)."""
    fp_a = 0x0123456789ABCDEF
    diff = 0x0003_0001_0001_0001  # bits 0, 16, 32, 48, 49 — one+ per band
    fp_b = fp_a ^ diff
    assert bin(diff).count("1") == 5
    df = spark.createDataFrame(
        # filler at distance 64/59 from a/b (bitwise complement of a)
        [("a", fp_a), ("b", fp_b), ("z", ~fp_a)],
        "id string, fp long",
    )
    rot_cand, _ = sh.simhash_rotation_candidate_pairs(df)
    rot = sh.verify_hamming(rot_cand, max_dist=6)
    assert {(r.id_l, r.id_r, r.hamming_dist) for r in rot.collect()} == {
        ("a", "b", 5)
    }
    band_cand, _ = sh.simhash_candidate_pairs(sh.simhash_bands(df, bands=4))
    assert sh.verify_hamming(band_cand, max_dist=6).count() == 0
