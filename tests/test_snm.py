"""Sorted-neighborhood blocking: distributed global ranks vs
row_number, candidate completeness/uniqueness vs brute force, verified
pairs, and the no-global-window plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_gd_spark.operators.snm import (
    global_ranks,
    snm_candidate_pairs,
    snm_candidate_pairs_sql,
    snm_near_dup_pairs,
)


@pytest.fixture(scope="module")
def keyed(spark):
    # shuffled insertion order, adversarial duplicate keys
    rows = [(i, f"key{(i * 7) % 40:03d}") for i in range(100)]
    rows = sorted(rows, key=lambda r: (r[0] * 31) % 100)
    return spark.createDataFrame(rows, "id long, snm_key string")


def test_global_ranks_match_row_number(spark, keyed):
    got = {
        r.id: r.rank
        for r in global_ranks(keyed, ["snm_key", "id"], num_partitions=7).collect()
    }
    want = {
        rid: i
        for i, (rid, _) in enumerate(
            sorted(((r.id, r.snm_key) for r in keyed.collect()), key=lambda t: (t[1], t[0]))
        )
    }
    assert got == want


def test_global_ranks_single_partition_degenerate(spark, keyed):
    got = global_ranks(keyed, ["snm_key", "id"], num_partitions=1).collect()
    assert sorted(r.rank for r in got) == list(range(100))


def test_candidates_match_bruteforce(spark, keyed):
    w = 5
    ranks = {
        r.id: r.rank
        for r in global_ranks(keyed, ["snm_key", "id"], num_partitions=4).collect()
    }
    want = {
        (a, b)
        for a in ranks
        for b in ranks
        if 1 <= ranks[b] - ranks[a] < w
    }
    got = [
        (r.id_l, r.id_r)
        for r in snm_candidate_pairs(
            keyed.withColumnRenamed("snm_key", "text"),
            "id",
            "text",
            window=w,
            key=F.col("text"),
            num_partitions=4,
        ).collect()
    ]
    assert len(got) == len(set(got)), "a pair met more than once"
    assert set(got) == want
    assert len(got) == 100 * (w - 1) - sum(range(1, w))


def test_window_validation(spark, keyed):
    with pytest.raises(ValueError, match="window"):
        snm_candidate_pairs(keyed, "id", "snm_key", window=1)


def test_near_dup_pairs_planted(spark):
    toks = " ".join(f"tok{i:02d}" for i in range(40))
    rows = [
        (30, toks),                       # prefix-identical pair, ids chosen
        (7, toks + " extra tail words"),  # so rank order != id order
        (2, "completely different text about other things entirely"),
    ]
    df = spark.createDataFrame(rows, "uid long, text string")
    out = {(r.id_l, r.id_r): r.jaccard for r in snm_near_dup_pairs(
        df, "uid", "text", window=3, w_shingle=5, threshold=0.3,
        num_partitions=2,
    ).collect()}
    assert (7, 30) in out            # id-normalized despite rank order
    assert all(2 not in p for p in out)


def test_no_global_window_in_plan(spark, keyed):
    """The scale pin: SNM must never plan a partitionBy-less Window
    (single-task global sort)."""
    plan = snm_candidate_pairs(
        keyed, "id", "snm_key", key=F.col("snm_key"), window=4,
        num_partitions=4,
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "MapInPandas" in plan  # rank assignment, P-way parallel
    # the range exchange lives in the (frozen) checkpoint's own plan
    ranked = keyed.repartitionByRange(4, "snm_key", "id")
    pre = ranked._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in pre.lower()


def test_sql_twin_parity(spark):
    import duckdb

    rows = [(i, f"text number {(i * 13) % 10} alpha beta") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_l, r.id_r, r.rank_l, r.rank_r)
        for r in snm_candidate_pairs(
            df, "doc_id", "text", window=4, num_partitions=3
        ).collect()
    }
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    twin = {
        tuple(r)
        for r in con.execute(
            snm_candidate_pairs_sql("documents", "doc_id", "text", window=4)
        ).fetchall()
    }
    assert got == twin
