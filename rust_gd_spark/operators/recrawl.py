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


def dup_burst_windows(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    bucket_sec: int = 3600,
    factor_num: int = 3,
    factor_den: int = 2,
    min_docs: int = 2,
) -> DataFrame:
    """Temporal duplicate-burst detection: per time bucket, the share of
    documents whose exact content key occurs more than once in the WHOLE
    corpus, flagged where that share exceeds ``factor`` × the corpus-wide
    share — the ingestion-monitoring tier (a crawler trap, a re-logging
    exporter, or a double-submitting client shows up as a burst in its
    ingestion window long before a full dedup pass runs).

    Output::

        (bucket_epoch, n_docs, n_dup_docs, dup_frac, global_dup_frac,
         is_burst)

    * ``bucket_epoch`` — bucket start in epoch seconds (``e - e %
      bucket_sec``: exact integer arithmetic, identical in both engines
      for the non-negative epochs of real capture times);
    * ``is_burst`` — 1 where ``n_dup_docs > 0`` and ``n_docs >=
      min_docs`` and ``dup_frac >= (factor_num/factor_den) ·
      global_dup_frac``. The ``n_dup_docs > 0`` guard matters: on a
      duplicate-free corpus the cross-multiplied test degenerates to
      ``0 >= 0`` and would flag every bucket of a perfectly healthy
      feed. The factor is an integer RATIONAL and the test is the
      cross-multiplied integer comparison — no float boundary can flip
      a row between engines. Cross-products are computed in
      decimal(38,0)/HUGEINT so planet-scale counts cannot overflow
      int64;
    * ``dup_frac``/``global_dup_frac`` are 6-dp display roundings; the
      flag never reads them.

    Scale: one aggregation on the md5 content key, a co-partitioned
    join-back on the same key (AQE-splittable under viral-content skew),
    one aggregation on the time bucket (cardinality = time range /
    bucket_sec, small), and a broadcast of the 1-row totals. The corpus
    is never windowed per key and never collected.
    """
    if bucket_sec < 1:
        raise ValueError(f"bucket_sec must be >= 1, got {bucket_sec}")
    if factor_num < 1 or factor_den < 1:
        raise ValueError("factor_num/factor_den must be >= 1")
    e = F.unix_timestamp(F.col(ts_col))
    base = df.select(
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("content_key"),
        (e - e % F.lit(bucket_sec)).alias("bucket_epoch"),
    )
    key_counts = base.groupBy("content_key").agg(F.count("*").alias("_n_key"))
    hourly = (
        base.join(key_counts, "content_key")
        .groupBy("bucket_epoch")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("_n_key") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_docs"),
        )
    )
    totals = hourly.agg(
        F.sum("n_docs").alias("_tot_docs"), F.sum("n_dup_docs").alias("_tot_dup")
    )
    dec = "decimal(38,0)"
    return (
        hourly.crossJoin(F.broadcast(totals))
        .select(
            "bucket_epoch",
            "n_docs",
            "n_dup_docs",
            F.round(F.col("n_dup_docs") / F.col("n_docs"), 6).alias("dup_frac"),
            F.round(F.col("_tot_dup") / F.col("_tot_docs"), 6).alias(
                "global_dup_frac"
            ),
            F.when(
                (F.col("n_dup_docs") > 0)
                & (F.col("n_docs") >= min_docs)
                & (
                    F.col("n_dup_docs").cast(dec)
                    * F.col("_tot_docs").cast(dec)
                    * factor_den
                    >= F.col("n_docs").cast(dec)
                    * F.col("_tot_dup").cast(dec)
                    * factor_num
                ),
                1,
            )
            .otherwise(0)
            .alias("is_burst"),
        )
    )


def dup_burst_windows_sql(
    table: str,
    text_col: str = "text",
    ts_col: str = "ts",
    bucket_sec: int = 3600,
    factor_num: int = 3,
    factor_den: int = 2,
    min_docs: int = 2,
) -> str:
    """ANSI-SQL twin of :func:`dup_burst_windows` (DuckDB-ready).

    ``epoch(...)::bigint`` mirrors Spark's ``unix_timestamp`` whole-
    second arithmetic; the burst test is the same cross-multiplied
    integer comparison in HUGEINT.
    """
    return f"""
        with base as (
          select md5(coalesce({text_col}, '')) as content_key,
                 (epoch({ts_col})::bigint
                  - epoch({ts_col})::bigint % {bucket_sec}) as bucket_epoch
          from {table}
        ),
        kc as (
          select content_key, count(*) as n_key from base group by content_key
        ),
        hourly as (
          select b.bucket_epoch,
                 count(*) as n_docs,
                 sum(case when k.n_key > 1 then 1 else 0 end) as n_dup_docs
          from base b join kc k using (content_key)
          group by b.bucket_epoch
        ),
        totals as (
          select sum(n_docs) as tot_docs, sum(n_dup_docs) as tot_dup
          from hourly
        )
        select h.bucket_epoch,
               h.n_docs::bigint as n_docs,
               h.n_dup_docs::bigint as n_dup_docs,
               round(h.n_dup_docs::double / h.n_docs, 6) as dup_frac,
               round(t.tot_dup::double / t.tot_docs, 6) as global_dup_frac,
               case when h.n_dup_docs > 0
                     and h.n_docs >= {min_docs}
                     and h.n_dup_docs::hugeint * t.tot_docs::hugeint
                         * {factor_den}
                         >= h.n_docs::hugeint * t.tot_dup::hugeint
                            * {factor_num}
                    then 1 else 0 end as is_burst
        from hourly h cross join totals t
    """


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
