"""Corpus hygiene reports: per-source PII incidence and ingestion
schema-integrity checks.

Two governance views that run BEFORE the transformation tiers:

* :func:`pii_incidence_report` — which feed leaks which PII family, at
  what rate. ``functions/pii.py`` counts and redacts per document; this
  aggregates the same pattern constants into the per-(source, family)
  incidence table a privacy review reads (and the prioritization input
  for where redaction budget goes). Long (family-per-row) shape so new
  families never change the schema.
* :func:`ingest_hygiene_report` — per-source schema-integrity counts:
  NULL text, empty/whitespace-only text, ``n_chars`` disagreeing with
  the actual text length (a stale or wrong ingestion-time computed
  column), and duplicated primary ids. These are the
  pipeline-precondition checks: every dedup tier keys on (id, text),
  so a silently duplicated id or a drifted length column corrupts
  downstream joins in ways content-level audits never see.

Scale: both are ONE partial+final aggregation on ``source`` (pure
codegen regex/length expressions in the map phase — no UDFs, no second
shuffle; the PII unpivot is a literal ``stack`` over post-aggregation
rows, cardinality = sources × families).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rust_gd_spark.functions.pii import PII_PATTERNS, pii_count, pii_count_sql


def pii_incidence_report(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-(source, PII family) incidence (module docstring)::

        (source, family, n_docs, n_docs_with, total_spans, doc_frac)
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    fams = [k for k, _, _ in PII_PATTERNS]
    counted = df.select(
        F.col(source_col).alias("source"),
        *[pii_count(t, k).alias(f"_c_{k}") for k in fams],
    )
    agg = counted.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.sum(F.when(F.col(f"_c_{k}") > 0, 1).otherwise(0))
            .cast("long")
            .alias(f"_with_{k}")
            for k in fams
        ],
        *[F.sum(F.col(f"_c_{k}")).cast("long").alias(f"_tot_{k}") for k in fams],
    )
    stack_args = ", ".join(
        f"'{k}', _with_{k}, _tot_{k}" for k in fams
    )
    return agg.select(
        "source",
        "n_docs",
        F.expr(
            f"stack({len(fams)}, {stack_args}) as (family, n_docs_with, total_spans)"
        ),
    ).select(
        "source",
        "family",
        "n_docs",
        "n_docs_with",
        "total_spans",
        F.round(F.col("n_docs_with") / F.col("n_docs"), 6).alias("doc_frac"),
    )


def pii_incidence_report_sql(
    table: str,
    text_col: str = "text",
    source_col: str = "source",
) -> str:
    """ANSI-SQL twin of :func:`pii_incidence_report` (DuckDB-ready) —
    the unpivot is an explicit UNION ALL over the same pattern
    constants, so the twin exercises the real regexes."""
    t = f"coalesce({text_col}, '')"
    fams = [k for k, _, _ in PII_PATTERNS]
    branches = []
    for k in fams:
        c = pii_count_sql(t, k)
        branches.append(
            f"""
            select {source_col} as source, '{k}' as family,
                   count(*) as n_docs,
                   sum(case when {c} > 0 then 1 else 0 end) as n_docs_with,
                   sum({c}) as total_spans
            from {table} group by {source_col}
            """
        )
    un = " union all ".join(branches)
    return f"""
        with cells as ({un})
        select source, family,
               n_docs::bigint as n_docs,
               n_docs_with::bigint as n_docs_with,
               total_spans::bigint as total_spans,
               round(n_docs_with::double / n_docs, 6) as doc_frac
        from cells
    """


def ingest_hygiene_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    chars_col: str | None = "n_chars",
) -> DataFrame:
    """Per-source schema-integrity counts (module docstring)::

        (source, n_docs, n_null_text, n_blank_text, n_chars_mismatch,
         n_dup_ids)

    ``n_blank_text`` counts non-NULL texts that trim to '';
    ``n_chars_mismatch`` counts rows where ``chars_col`` disagrees with
    ``length(text)`` (NULL text compares against length 0); pass
    ``chars_col=None`` to skip it (reported as 0). ``n_dup_ids`` is
    rows minus distinct ids — 0 on a healthy feed.
    """
    t = F.col(text_col)
    mismatch = (
        F.when(
            F.coalesce(F.col(chars_col), F.lit(-1))
            != F.length(F.coalesce(t, F.lit(""))),
            1,
        ).otherwise(0)
        if chars_col is not None
        else F.lit(0)
    )
    return (
        df.select(
            F.col(source_col).alias("source"),
            F.col(id_col).alias("_id"),
            t.isNull().cast("int").alias("_null"),
            (t.isNotNull() & (F.trim(t) == "")).cast("int").alias("_blank"),
            mismatch.alias("_mm"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_null").cast("long").alias("n_null_text"),
            F.sum("_blank").cast("long").alias("n_blank_text"),
            F.sum("_mm").cast("long").alias("n_chars_mismatch"),
            (F.count(F.lit(1)) - F.count_distinct(F.col("_id")))
            .cast("long")
            .alias("n_dup_ids"),
        )
    )


def ingest_hygiene_report_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    chars_col: str | None = "n_chars",
) -> str:
    """ANSI-SQL twin of :func:`ingest_hygiene_report` (DuckDB-ready)."""
    mm = (
        f"case when coalesce({chars_col}, -1)"
        f" <> length(coalesce({text_col}, '')) then 1 else 0 end"
        if chars_col is not None
        else "0"
    )
    return f"""
        select {source_col} as source,
               count(*)::bigint as n_docs,
               sum(case when {text_col} is null then 1 else 0 end)::bigint
                 as n_null_text,
               sum(case when {text_col} is not null
                         and trim({text_col}) = '' then 1 else 0 end)::bigint
                 as n_blank_text,
               sum({mm})::bigint as n_chars_mismatch,
               (count(*) - count(distinct {id_col}))::bigint as n_dup_ids
        from {table}
        group by {source_col}
    """
