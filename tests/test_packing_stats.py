"""packing_stats: hand-checked pad/fill arithmetic over a known next-fit
plan, and DuckDB twin parity."""

from __future__ import annotations

import duckdb
import pandas as pd


def _plan(spark):
    from rust_gd_spark.operators.packing import pack_sequences

    # single shard, capacity 10, tokens 4,4,4,12,3 ->
    # seq0 = {4,4} fill 8, seq1 = {4} fill 4, seq2 = {12} oversize,
    # seq3 = {3} fill 3
    df = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4), (4, 12), (5, 3)], "doc_id long, n_tok long"
    )
    return pack_sequences(df, "doc_id", "n_tok", capacity=10, n_shards=1)


def test_packing_stats(spark):
    from rust_gd_spark.operators.packing import packing_stats

    r = packing_stats(_plan(spark), capacity=10).collect()[0]
    assert (r.n_docs, r.n_seqs, r.total_tokens, r.budget_tokens) == (5, 4, 27, 40)
    # pad = (10-8) + (10-4) + 0 (oversize) + (10-3)
    assert r.pad_tokens == 15
    assert r.fill_frac == 0.675
    assert r.n_oversize_seqs == 1
    assert r.max_docs_per_seq == 2


def test_packing_stats_twin_parity(spark):
    from rust_gd_spark.operators.packing import packing_stats, packing_stats_sql

    plan = _plan(spark)
    spark_rows = sorted(tuple(r) for r in packing_stats(plan, capacity=10).collect())
    pdf = plan.toPandas()
    con = duckdb.connect()
    con.register("plan_tbl", pdf)
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(
            packing_stats_sql("select * from plan_tbl", capacity=10)
        ).fetchall()
    )
    assert spark_rows == duck_rows
