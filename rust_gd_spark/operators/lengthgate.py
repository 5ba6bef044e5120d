"""Per-source length-outlier gating: exact Tukey fences over each
source's document-length distribution.

The Gopher-style gates (``operators/repetition.py``,
``functions/quality_model.py``) use ABSOLUTE length bounds — right for a
known corpus, blind to per-feed drift. In a multi-source ingestion
pipeline the operational signal is RELATIVE: a source whose documents
suddenly run 10× its own typical length is a broken scraper
(concatenated pages, un-split archives), and a source collapsing to
near-zero lengths is a parser regression — both long before any
absolute bound trips.

Per source this operator computes exact type-1 quartiles of a length
column and Tukey far-out fences, then counts the docs outside them::

    (source, n_docs, q1, q3, low_fence, high_fence, n_low, n_high)

* quartiles are EXACT, by cumulative counts over DISTINCT length
  values — never ``percentile_approx`` (partition-order dependent; the
  ``quality_threshold_plan`` discipline). q1 = smallest value whose
  cumulative count reaches ``ceil(n/4)``; q3 likewise at
  ``ceil(3n/4)`` — pure integer rank arithmetic, twin-identical;
* fences are ``q1 - k·(q3-q1)`` / ``q3 + k·(q3-q1)`` with INTEGER k
  (default 3, Tukey's far-out) — lengths are integers, so the fences
  are exact integers and no float boundary can flip a count.

Scale: one partial+final aggregation on (source, length) — the state is
bounded by distinct lengths per source, not documents; one window
cumulative sum PER SOURCE over those distinct values (bounded by the
length domain, ~10⁶ rows at worst); two small joins back. The corpus is
scanned once and never windowed per document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def source_length_outliers(
    df: DataFrame,
    source_col: str = "source",
    length_col: str = "n_chars",
    k: int = 3,
) -> DataFrame:
    """Exact per-source quartiles, Tukey fences, and outlier counts
    (module docstring). ``k`` is the integer fence multiplier.

    NULL lengths are EXCLUDED before ranking (they are
    ``ingest_hygiene_report``'s domain, and Spark's NULLS FIRST vs
    DuckDB's NULLS LAST window ordering would silently skew the
    cumulative ranks on any feed that ships them); ``n_docs`` counts
    ranked rows only.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark import StorageLevel

    vc = (
        df.select(
            F.col(source_col).alias("source"), F.col(length_col).alias("v")
        )
        .filter(F.col("v").isNotNull())
        .groupBy("source", "v")
        .agg(F.count("*").alias("c"))
        # vc feeds three branches (cum/quartiles, totals, fence counts);
        # without caching Catalyst re-evaluates the CORPUS aggregation
        # once per branch — three full scans at 100 TB. persist (not
        # localCheckpoint) keeps the operator lazy and the lineage
        # replayable after executor loss; the cached table is bounded by
        # distinct (source, length) pairs, not documents.
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    w = Window.partitionBy("source").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = vc.withColumn("cum", F.sum("c").over(w))
    totals = vc.groupBy("source").agg(F.sum("c").alias("n_docs"))
    ranks = totals.select(
        "source",
        "n_docs",
        # ceil(n/4) and ceil(3n/4) in pure integer arithmetic (`div`, not
        # double division + cast: bit-identical to the DuckDB twin's `//`
        # at every magnitude, incl. beyond 2^53)
        F.expr("(n_docs + 3) div 4").alias("r1"),
        F.expr("(n_docs * 3 + 3) div 4").alias("r3"),
    )
    j = cum.join(ranks, "source")
    q = j.groupBy("source").agg(
        F.min(F.when(F.col("cum") >= F.col("r1"), F.col("v"))).alias("q1"),
        F.min(F.when(F.col("cum") >= F.col("r3"), F.col("v"))).alias("q3"),
    )
    fences = q.select(
        "source",
        "q1",
        "q3",
        (F.col("q1") - k * (F.col("q3") - F.col("q1"))).alias("low_fence"),
        (F.col("q3") + k * (F.col("q3") - F.col("q1"))).alias("high_fence"),
    )
    # group by the fence columns (functionally dependent on source) so
    # fences has exactly ONE consumer — a second consumer would make
    # Catalyst re-evaluate the quartile window subtree per branch
    counts = (
        vc.join(fences, "source")
        .groupBy("source", "q1", "q3", "low_fence", "high_fence")
        .agg(
            F.sum(F.when(F.col("v") < F.col("low_fence"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_low"),
            F.sum(F.when(F.col("v") > F.col("high_fence"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_high"),
        )
    )
    return (
        totals.join(counts, "source")
        .select(
            "source", "n_docs", "q1", "q3",
            "low_fence", "high_fence", "n_low", "n_high",
        )
    )


def source_length_outliers_sql(
    table: str,
    source_col: str = "source",
    length_col: str = "n_chars",
    k: int = 3,
) -> str:
    """ANSI-SQL twin of :func:`source_length_outliers` (DuckDB-ready) —
    the same distinct-value cumulative ranks and integer fences."""
    return f"""
        with vc as (
          select {source_col} as source, {length_col} as v, count(*) as c
          from {table} where {length_col} is not null group by 1, 2
        ),
        cum as (
          select *, sum(c) over (partition by source order by v
                   rows between unbounded preceding and current row) as cum
          from vc
        ),
        totals as (select source, sum(c) as n_docs from vc group by source),
        ranks as (
          select source, n_docs,
                 (n_docs + 3) // 4 as r1,
                 (n_docs * 3 + 3) // 4 as r3
          from totals
        ),
        q as (
          select cum.source,
                 min(case when cum.cum >= r.r1 then cum.v end) as q1,
                 min(case when cum.cum >= r.r3 then cum.v end) as q3
          from cum join ranks r using (source)
          group by cum.source
        ),
        fences as (
          select source, q1, q3,
                 q1 - {k} * (q3 - q1) as low_fence,
                 q3 + {k} * (q3 - q1) as high_fence
          from q
        ),
        counts as (
          select vc.source,
                 sum(case when vc.v < f.low_fence then vc.c else 0 end)
                   as n_low,
                 sum(case when vc.v > f.high_fence then vc.c else 0 end)
                   as n_high
          from vc join fences f using (source)
          group by vc.source
        )
        select t.source, t.n_docs::bigint as n_docs,
               f.q1::bigint as q1, f.q3::bigint as q3,
               f.low_fence::bigint as low_fence,
               f.high_fence::bigint as high_fence,
               c.n_low::bigint as n_low, c.n_high::bigint as n_high
        from totals t
        join fences f using (source)
        join counts c using (source)
    """
