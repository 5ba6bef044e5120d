"""threshold_sensitivity (dedup-threshold impact curve) and
dup_burst_windows (temporal duplicate-burst monitoring): hand-checked
expectations, DuckDB twin parity, and the no-BNLJ plan guard."""

from __future__ import annotations

from datetime import datetime

import duckdb
import pandas as pd


def _pairs_df(spark):
    # similarities chosen OFF the grid boundaries; doc 1 appears in two
    # pairs so n_docs < 2 * n_pairs at low thresholds
    return spark.createDataFrame(
        [
            (1, 2, 0.95),
            (1, 3, 0.65),
            (4, 5, 0.45),
        ],
        "id_l long, id_r long, jaccard double",
    )


def test_threshold_sensitivity_counts(spark):
    from rust_gd_spark.operators.sensitivity import threshold_sensitivity

    out = {
        r.threshold: (r.n_pairs, r.n_docs)
        for r in threshold_sensitivity(
            _pairs_df(spark), grid=(0.4, 0.6, 0.9, 0.99)
        ).collect()
    }
    assert out[0.4] == (3, 5)
    assert out[0.6] == (2, 3)   # docs {1, 2, 3}
    assert out[0.9] == (1, 2)
    assert out[0.99] == (0, 0)  # empty threshold still reports a row


def test_threshold_sensitivity_twin_parity(spark):
    from rust_gd_spark.operators.sensitivity import (
        threshold_sensitivity,
        threshold_sensitivity_sql,
    )

    grid = (0.4, 0.6, 0.9, 0.99)
    spark_rows = sorted(
        (r.threshold, r.n_pairs, r.n_docs)
        for r in threshold_sensitivity(_pairs_df(spark), grid=grid).collect()
    )
    pdf = pd.DataFrame(
        {"id_l": [1, 1, 4], "id_r": [2, 3, 5], "jaccard": [0.95, 0.65, 0.45]}
    )
    con = duckdb.connect()
    con.register("p", pdf)
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(
            threshold_sensitivity_sql("select * from p", grid)
        ).fetchall()
    )
    assert spark_rows == duck_rows


def test_threshold_sensitivity_no_bnlj(spark):
    # the grid is a literal-array explode, never an inequality join — a
    # BroadcastNestedLoopJoin here would scale with |pairs| x |grid| rows
    # through the nested loop instead of a narrow projection
    from rust_gd_spark.operators.sensitivity import threshold_sensitivity

    plan = threshold_sensitivity(
        _pairs_df(spark), grid=(0.4, 0.9)
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def _burst_rows():
    h0 = datetime(2026, 1, 1, 0, 30)   # bucket 2026-01-01 00:00
    h1 = datetime(2026, 1, 1, 1, 15)   # bucket 2026-01-01 01:00
    return [
        # hour 0: 3 docs, texts a/a/b -> both "a" rows are corpus dups
        (1, "a", h0),
        (2, "a", h0),
        (3, "b", h0),
        # hour 1: 3 docs, unique texts except "b" (dup ACROSS hours)
        (4, "b", h1),
        (5, "c", h1),
        (6, "d", h1),
    ]


def test_dup_burst_windows(spark):
    from rust_gd_spark.operators.recrawl import dup_burst_windows

    df = spark.createDataFrame(
        _burst_rows(), "doc_id long, text string, ts timestamp"
    )
    out = {
        r.bucket_epoch: (r.n_docs, r.n_dup_docs, r.dup_frac, r.is_burst)
        for r in dup_burst_windows(
            df, factor_num=3, factor_den=2, min_docs=2
        ).collect()
    }
    e0 = int(datetime(2026, 1, 1, 0).timestamp())
    e1 = int(datetime(2026, 1, 1, 1).timestamp())
    # global dup share = 4/6; burst bar = 3/2 * 4/6 = 1.0 exactly
    assert out[e0] == (3, 3, 1.0, 1)    # 3/3 >= 1.0 -> burst
    assert out[e1] == (3, 1, 0.333333, 0)
    # the "b" in hour 1 counts as a dup doc: its key recurs corpus-wide
    assert out[e1][1] == 1


def test_dup_burst_clean_corpus_never_alerts(spark):
    # regression (code-review finding): with zero duplicates anywhere the
    # cross-multiplied test degenerates to 0 >= 0 — the n_dup_docs > 0
    # guard must keep a healthy feed alert-free
    from datetime import datetime

    from rust_gd_spark.operators.recrawl import dup_burst_windows

    df = spark.createDataFrame(
        [
            (1, "a", datetime(2026, 1, 1, 0, 5)),
            (2, "b", datetime(2026, 1, 1, 0, 6)),
            (3, "c", datetime(2026, 1, 1, 1, 5)),
            (4, "d", datetime(2026, 1, 1, 1, 6)),
        ],
        "doc_id long, text string, ts timestamp",
    )
    rows = dup_burst_windows(df, min_docs=2).collect()
    assert all(r.is_burst == 0 for r in rows)
    assert all(r.n_dup_docs == 0 for r in rows)


def test_dup_burst_twin_parity(spark):
    from rust_gd_spark.operators.recrawl import (
        dup_burst_windows,
        dup_burst_windows_sql,
    )

    df = spark.createDataFrame(
        _burst_rows(), "doc_id long, text string, ts timestamp"
    )
    spark_rows = sorted(tuple(r) for r in dup_burst_windows(df).collect())
    pdf = pd.DataFrame(
        _burst_rows(), columns=["doc_id", "text", "ts"]
    )
    con = duckdb.connect()
    con.register("d", pdf)
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(dup_burst_windows_sql("d")).fetchall()
    )
    assert spark_rows == duck_rows
