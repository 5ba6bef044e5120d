"""Physical-plan pins for the session-4 operators: the k-lead template
window must plan as ONE Window operator in one exchange; the bag-Jaccard
verify path must evaluate its Arrow kernel once with no nested loop; the
attribution join must never become a cartesian product."""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _tr(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def test_template_spans_single_window_exchange(spark):
    from rust_gd_spark.operators.templates import turn_template_spans

    df = _tr(spark, [("A", i, "user", f"t{i}") for i in range(6)])
    plan = _plan(turn_template_spans(df, k=4, min_convs=2))
    # all k-1 leads share one window spec -> exactly one Window operator
    assert plan.count("Window") == 1
    # one shuffle for the window partitioning + the final-agg exchange of
    # the two-phase groupBy (count_distinct adds its expand INSIDE the
    # same exchanges, not a third)
    assert plan.count("Exchange") <= 3
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_canned_response_is_partial_agg(spark):
    from rust_gd_spark.operators.templates import canned_response_dups

    df = _tr(spark, [("A", i, "assistant", "x") for i in range(4)])
    plan = _plan(canned_response_dups(df))
    # the exactdup shape: partial+final aggregation, never a per-key
    # window (count_distinct's string buffer can plan as SortAggregate —
    # still map-side partial, which is the property that matters)
    assert "Window" not in plan
    assert "Aggregate" in plan


def test_bag_verify_single_arrow_eval_no_explode(spark):
    from rust_gd_spark.operators.bagjaccard import (
        shingle_count_df, verify_bag_jaccard,
    )

    docs = spark.createDataFrame(
        [("a", "one two three"), ("b", "one two three")],
        "uid string, text string",
    )
    sh = shingle_count_df(docs, "uid", "text", w=2)
    pairs = spark.createDataFrame([("a", "b")], "id_l string, id_r string")
    plan = _plan(verify_bag_jaccard(pairs, sh, threshold=0.0))
    # Σmin kernel evaluated ONCE (asNondeterministic stops the
    # filter-pushdown duplication); the un-materialized shingle kernel
    # legitimately appears once per join side (callers at scale
    # localCheckpoint sh, the minhash_near_dup_pairs convention)
    assert plan.count("bagj_udf") == 1
    assert plan.count("ArrowEvalPython") <= 3
    assert "Generate" not in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_attribution_no_cartesian(spark):
    from rust_gd_spark.operators.decontam import ngram_contamination_attribution

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g h i j")], "doc_id long, text string"
    )
    ref = spark.createDataFrame(
        [("bench_a", "a b c d e")], "benchmark string, text string"
    )
    plan = _plan(
        ngram_contamination_attribution(docs, ref, "doc_id", "text", n=3)
    )
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
