"""Recrawl/re-log dedup: time-aware exact-duplicate canonicalization.

The exact-dup tier (``operators/exactdup.py``) picks a canonical member
by smallest id — correct for content dedup, blind to TIME. Web crawls
and agent-log ingestion see the same content repeatedly ACROSS TIME
(weekly recrawls of a stable page, a conversation re-logged by a
nightly exporter), and the production policy is usually "keep the
EARLIEST capture, account for the re-crawl cadence": the first capture
is the provenance-correct copy, and the re-crawl age span feeds crawl
scheduling (a page unchanged for a year gets demoted) and retention
audits.

This operator groups by exact content key and reports the time
dimension::

    (content_key, canonical_id, n_crawls, n_distinct_ts,
     first_ts, last_ts, age_span_sec)

* ``canonical_id`` — member with the EARLIEST ts (ties → smallest id):
  a ``min(struct(ts, id))`` group minimum, order-independent and
  twin-reproducible (never a per-key window — a page crawled 10⁹ times
  stays AQE-splittable, the `exactdup`/`urldedup` discipline);
* ``n_crawls`` / ``n_distinct_ts`` — total captures vs distinct capture
  times (a re-logged batch export shows many rows at ONE ts);
* ``age_span_sec`` — ``last_ts − first_ts`` in whole seconds (exact
  integer: both engines subtract epoch seconds, no float time math).

Reference analogue: the LRU dictionary keeps the FIRST occurrence of a
base as the dictionary entry and later occurrences become references
(`src/dict.rs:38-63`); here "first" is first-in-time, not
first-in-scan-order.

Scale: one partial+final aggregation on the md5 content key — the only
shuffle; every aggregate is algebraic (min/max/count), so map-side
combine does the heavy lifting under skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def recrawl_groups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    min_crawls: int = 2,
) -> DataFrame:
    """Time-aware exact-dup groups (see module docstring).

    Rows with ``n_crawls < min_crawls`` (never re-crawled) are dropped —
    the survivors are the re-crawl report. NULL text groups under the
    empty-string key (the repo-wide convention); ``ts`` is expected
    non-null (the input_hint schema's capture time — filter or impute
    upstream if a source can emit null timestamps).
    """
    key = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    g = (
        df.select(
            key.alias("content_key"),
            F.col(id_col).alias("id"),
            F.col(ts_col).alias("ts"),
        )
        .groupBy("content_key")
        .agg(
            F.min(F.struct("ts", "id")).alias("_first"),
            F.count("*").alias("n_crawls"),
            F.count_distinct("ts").alias("n_distinct_ts"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .filter(F.col("n_crawls") >= min_crawls)
    )
    return g.select(
        "content_key",
        F.col("_first.id").alias("canonical_id"),
        "n_crawls",
        "n_distinct_ts",
        "first_ts",
        "last_ts",
        (
            F.unix_timestamp("last_ts") - F.unix_timestamp("first_ts")
        ).alias("age_span_sec"),
    )


def recrawl_groups_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    min_crawls: int = 2,
) -> str:
    """ANSI-SQL twin of :func:`recrawl_groups` (DuckDB-ready).

    The canonical pick mirrors Spark's ``min(struct(ts, id))`` with
    DuckDB's own min-over-struct (field order = comparison order);
    ``epoch(...)`` mirrors Spark's ``unix_timestamp`` whole-second
    arithmetic.
    """
    return f"""
        with g as (
          select md5(coalesce({text_col}, '')) as content_key,
                 {id_col} as id, {ts_col} as ts
          from {table}
        )
        select content_key,
               (min(struct_pack(ts := ts, id := id))).id as canonical_id,
               count(*)::bigint as n_crawls,
               count(distinct ts)::bigint as n_distinct_ts,
               min(ts) as first_ts,
               max(ts) as last_ts,
               (epoch(max(ts)) - epoch(min(ts)))::bigint as age_span_sec
        from g
        group by content_key
        having count(*) >= {min_crawls}
    """
