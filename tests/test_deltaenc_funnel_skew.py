"""Tests for cluster delta encoding, the tiered dedup funnel, and the
key-skew profile (round-5 session-2 operators)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from rust_gd_spark.operators.deltaenc import (
    _prefix_suffix_arrays,
    cluster_delta_encode,
    delta_decode,
)
from rust_gd_spark.operators.funnel import dedup_funnel
from rust_gd_spark.operators.skew import key_skew_profile, key_skew_profile_sql


# ---------------------------------------------------------------------------
# delta encoding
# ---------------------------------------------------------------------------

def test_prefix_suffix_kernel_lossless():
    cases = [
        ("hello world", "hello there world"),
        ("abc", "abc"),
        ("", ""),
        ("abc", ""),
        ("", "abc"),
        ("xabcx", "abc"),
        ("héllo wörld", "héllo wörld!"),
        ("aaaa", "aa"),
        ("中文前缀 body 中文后缀", "中文前缀 altered 中文后缀"),
        ("ab" * 50000, "ab" * 50000 + "tail"),
    ]
    p, s = _prefix_suffix_arrays([c[0] for c in cases], [c[1] for c in cases])
    for (a, b), pp, ss in zip(cases, p, s):
        dev = a[pp : len(a) - ss]
        rec = b[:pp] + dev + (b[len(b) - ss :] if ss else "")
        assert rec == a, (a, b, pp, ss)
        # maximality: the prefix cannot be extended
        if pp < min(len(a), len(b)):
            assert a[pp] != b[pp]


def test_prefix_suffix_greedy_convention():
    # prefix is taken maximally FIRST, then the suffix over remainders —
    # the convention the SQL twin counts reproduce
    p, s = _prefix_suffix_arrays(["aaaa"], ["aa"])
    assert (p[0], s[0]) == (2, 0)


def _mini_cluster_frames(spark):
    src = spark.createDataFrame(
        [
            ("a", "the quick brown fox jumps over the lazy dog"),
            ("b", "the quick brown cat jumps over the lazy dog"),
            ("c", "the quick brown fox jumps over the lazy dog"),  # exact dup of a
            ("d", None),  # NULL doctrine
            ("e", "singleton text"),
        ],
        ["id", "text"],
    )
    clusters = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "e")],
        ["id", "cluster_id"],
    )
    return clusters, src


def test_cluster_delta_encode_roundtrip(spark):
    clusters, src = _mini_cluster_frames(spark)
    enc = cluster_delta_encode(clusters, src, "id", "text")
    rows = {r["id"]: r for r in enc.collect()}
    assert len(rows) == 5
    # rep of cluster a: all three same byte length -> smallest id wins
    assert rows["a"]["kind"] == "base"
    assert rows["c"]["kind"] == "delta" and rows["c"]["dev_chars"] == 0
    assert rows["b"]["kind"] == "delta"
    # b differs from a by one word: deviation is small
    assert 0 < rows["b"]["dev_chars"] <= len("fox")
    assert rows["d"]["kind"] == "base" and rows["d"]["deviation"] == ""
    # lossless decode from the encoded table alone
    dec = {r["id"]: r["text"] for r in delta_decode(enc).collect()}
    orig = {r["id"]: (r["text"] or "") for r in src.collect()}
    assert dec == orig


def test_cluster_delta_encode_savings(spark):
    clusters, src = _mini_cluster_frames(spark)
    enc = cluster_delta_encode(clusters, src, "id", "text")
    tot = enc.agg(
        F.sum("orig_chars").alias("o"), F.sum("dev_chars").alias("d")
    ).collect()[0]
    assert tot["d"] < tot["o"]  # the cluster actually compressed


def test_cluster_delta_reserved_cols(spark):
    clusters, src = _mini_cluster_frames(spark)
    with pytest.raises(ValueError):
        cluster_delta_encode(clusters, src.withColumnRenamed("text", "kind"),
                             "id", "kind")


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------

def test_dedup_funnel_counts(spark):
    # 6 docs: u1/u2 same canonical URL (different text), t1/t2 exact text
    # dups on distinct URLs, n1/n2 near-dups (high word overlap)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    rows = [
        ("u1", "http://a.com/x?utm_source=z", base + "u-one"),
        ("u2", "https://www.a.com/x/", base + "u-two"),
        ("t1", "https://b.com/1", "identical text body"),
        ("t2", "https://b.com/2", "identical text body"),
        ("n1", "https://c.com/1", base + "near one"),
        ("n2", "https://c.com/2", base + "near two"),
    ]
    df = spark.createDataFrame(rows, ["id", "url", "text"])
    from rust_gd_spark.pipeline import DedupConfig

    out = {
        r["tier"]: r
        for r in dedup_funnel(
            df, "id", "text", url_col="url",
            config=DedupConfig(
                jaccard_threshold=0.5, min_substring_len=120,
                enable_simhash=False, neighbor_window=None,
            ),
        ).collect()
    }
    assert out["url"]["docs_in"] == 6 and out["url"]["docs_out"] == 5
    # u2 removed by URL tier; t1/t2 collapse in exact tier
    assert out["exact"]["docs_in"] == 5 and out["exact"]["docs_out"] == 4
    # u1, n1, n2 share >0.5 jaccard -> one cluster; t1 separate
    assert out["near_dup"]["docs_in"] == 4 and out["near_dup"]["docs_out"] == 2
    # chain invariant
    assert out["exact"]["docs_in"] == out["url"]["docs_out"]
    assert out["near_dup"]["docs_in"] == out["exact"]["docs_out"]
    for r in out.values():
        assert r["docs_removed"] == r["docs_in"] - r["docs_out"]


def test_dedup_funnel_skips_optional_tiers(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "y")], ["id", "text"]
    )
    out = dedup_funnel(df, "id", "text").collect()
    assert len(out) == 1
    assert out[0]["tier"] == "exact"
    assert out[0]["docs_in"] == 3 and out[0]["docs_out"] == 2


# ---------------------------------------------------------------------------
# skew profile
# ---------------------------------------------------------------------------

def test_key_skew_profile_exact(spark):
    rows = [("hot",)] * 70 + [("warm",)] * 20 + [(f"k{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, ["k"])
    prof = key_skew_profile(df, "k", top_n=3).collect()
    assert [r["key"] for r in prof] == ["hot", "warm", "k0"]
    assert prof[0]["cnt"] == 70 and prof[0]["total_rows"] == 100
    assert prof[0]["distinct_keys"] == 12
    assert prof[0]["share_ppm"] == 700000
    assert prof[1]["share_ppm"] == 200000
    assert prof[2]["share_ppm"] == 10000
    assert prof[2]["cum_share_ppm"] == 910000


def test_key_skew_profile_sql_twin(spark, tmp_path):
    import random

    rng = random.Random(7)
    rows = [(f"key{rng.randint(0, 15)}",) for _ in range(400)]
    df = spark.createDataFrame(rows, ["k"])
    pq = str(tmp_path / "keys.parquet")
    df.write.mode("overwrite").parquet(pq)
    got = (
        key_skew_profile(spark.read.parquet(pq), "k", top_n=8)
        .orderBy("rank")
        .collect()
    )
    con = duckdb.connect()
    sql = key_skew_profile_sql(f"select k from '{pq}/*.parquet'", "k", 8)
    want = con.execute(sql).fetchall()
    assert [tuple(r) for r in got] == [
        (r[0], r[1], r[2], r[3], r[4], r[5], r[6]) for r in want
    ]


def test_key_skew_profile_rejects_bad_n(spark):
    df = spark.createDataFrame([("a",)], ["k"])
    with pytest.raises(ValueError):
        key_skew_profile(df, "k", top_n=0)
