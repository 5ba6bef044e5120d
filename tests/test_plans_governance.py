"""Physical-plan pins for the governance/audit-tier operators: every
report must stay partial-agg shaped with no nested loop, the sensitivity
grid must stay a narrow explode, and the outlier-fence path must keep
its window bounded to distinct values per source."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sensitivity_plan_is_explode_plus_one_agg(spark):
    from rust_gd_spark.operators.sensitivity import threshold_sensitivity

    pairs = spark.createDataFrame(
        [(1, 2, 0.9)], "id_l long, id_r long, jaccard double"
    )
    plan = _plan(threshold_sensitivity(pairs, grid=(0.5, 0.7, 0.9)))
    # grid = literal-array Generate (explode), never an inequality join
    assert "Generate" in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    # one agg shuffle on threshold + the tiny grid broadcast join-back;
    # count_distinct expands inside the same exchanges
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_burst_windows_no_nested_loop(spark):
    from datetime import datetime

    from rust_gd_spark.operators.recrawl import dup_burst_windows

    df = spark.createDataFrame(
        [(1, "a", datetime(2026, 1, 1))], "doc_id long, text string, ts timestamp"
    )
    plan = _plan(dup_burst_windows(df))
    assert "CartesianProduct" not in plan
    # the 1-row totals attach is the repo-wide broadcast cross join
    # (BroadcastNestedLoopJoin with an IdentityBroadcastMode 1-row build
    # side) — allowed exactly once; a DATA-sized nested loop is not
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "BroadcastExchange" in plan


def test_length_outliers_window_is_per_distinct_value(spark):
    from rust_gd_spark.operators.lengthgate import source_length_outliers

    df = spark.createDataFrame(
        [(1, "A", 10), (2, "A", 20)], "doc_id long, source string, n_chars long"
    )
    plan = _plan(source_length_outliers(df))
    # exactly one Window (the per-source cumulative sum over DISTINCT
    # values — the corpus itself is never windowed); the materialized vc
    # (localCheckpoint) keeps the corpus aggregation to ONE evaluation
    # across the three consuming branches
    assert plan.count("Window [") == 1
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_hygiene_reports_are_single_agg(spark):
    from rust_gd_spark.operators.hygiene import (
        ingest_hygiene_report,
        pii_incidence_report,
    )

    df = spark.createDataFrame(
        [(1, "x", "A", 1)], "doc_id long, text string, source string, n_chars long"
    )
    p1 = _plan(pii_incidence_report(df))
    p2 = _plan(ingest_hygiene_report(df))
    for p in (p1, p2):
        assert "Window" not in p
        assert "CartesianProduct" not in p and "NestedLoop" not in p
    # the unpivot is a literal Generate AFTER aggregation, not a join
    assert "Generate" in p1


def test_embedding_hygiene_no_udf_no_shuffle_joins(spark):
    from rust_gd_spark.operators.embhygiene import embedding_hygiene

    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    plan = _plan(embedding_hygiene(df, "embedding", expected_dim=2))
    # pure codegen array lambdas: no Python evals anywhere in the plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange") <= 1  # single-row final aggregate


def test_histogram_single_agg_plus_broadcast_totals(spark):
    from rust_gd_spark.operators.histogram import value_histogram

    df = spark.createDataFrame([(1, 5)], "id long, v long")
    plan = _plan(value_histogram(df, "v"))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    # same 1-row-broadcast totals attach as dup_burst_windows
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "BroadcastExchange" in plan  # 1-row totals side
