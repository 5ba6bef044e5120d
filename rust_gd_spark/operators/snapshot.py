"""Corpus snapshot diff — incremental-ingestion audit.

A 100 TB corpus is rebuilt incrementally: each crawl/export lands a new
snapshot and the pipeline needs to know what actually changed before it
re-runs dedup/cleaning on everything. This operator classifies every id
across two snapshots:

    added      — id only in the new snapshot
    removed    — id only in the old snapshot
    changed    — id in both, content key differs
    unchanged  — id in both, content key identical

Content identity is ``md5(coalesce(text, ''))`` — the repo-wide exact-dup
content key (`operators/exactdup.py`), so "changed" means the same thing
here as in the dedup path. Relation to the reference engine: this is the
dictionary probe (`src/dict.rs:38-63`) run against the PREVIOUS run's
dictionary — hit with equal payload = unchanged, hit with new payload =
changed, miss = added; the reference's LRU eviction is the removed case.

Scale design: one full-outer sort-merge join on id — both sides hash-
partition on the join key, no driver work, no Python; with both
snapshots bucketed by id (Iceberg `bucket(id)`) the exchange disappears
entirely (see `tests/test_plans.py` bucketed-join pin). Downstream
stages filter on ``status``: re-clean `added ∪ changed` only — which is
the delta that makes incremental runs O(delta), not O(corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _content_key(text_col) -> Column:
    return F.md5(F.coalesce(text_col, F.lit("")))


def snapshot_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id, status, old_key, new_key)`` over a full-outer join of the
    two snapshots' ``(id, content_key)`` projections (narrow: the text
    column is hashed map-side and never shuffled)."""
    o = old_df.select(
        F.col(id_col).alias("id"), _content_key(F.col(text_col)).alias("old_key")
    )
    n = new_df.select(
        F.col(id_col).alias("id"), _content_key(F.col(text_col)).alias("new_key")
    )
    j = o.join(n, "id", "full_outer")
    status = (
        F.when(F.col("old_key").isNull(), F.lit("added"))
        .when(F.col("new_key").isNull(), F.lit("removed"))
        .when(F.col("old_key") == F.col("new_key"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("id", status.alias("status"), "old_key", "new_key")


def snapshot_diff_sql(
    old_rel: str,
    new_rel: str,
    id_expr: str = "doc_id",
    text_expr: str = "text",
) -> str:
    """DuckDB twin: same projections, same full-outer join, same CASE."""
    key = f"md5(coalesce({text_expr}, ''))"
    return f"""
        with o as (select {id_expr} as id, {key} as old_key from {old_rel}),
             n as (select {id_expr} as id, {key} as new_key from {new_rel})
        select coalesce(o.id, n.id) as id,
               case when o.id is null then 'added'
                    when n.id is null then 'removed'
                    when o.old_key = n.new_key then 'unchanged'
                    else 'changed' end as status,
               o.old_key, n.new_key
        from o full outer join n on o.id = n.id
    """
