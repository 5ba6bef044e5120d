"""Log2 length histogram: the corpus length-distribution report in
power-of-two buckets, with exact integer bucketing.

``corpus_profile`` gives per-source aggregate totals; this gives the
SHAPE — the binned token-length distribution a pipeline engineer reads
to size sequence packing (how much of the corpus exceeds the context
window), spot truncation artifacts (a spike at exactly 2^k tokens means
an upstream truncator), and catch degenerate mass at tiny lengths.

Bucketing is exact: bucket = ``len(binary(n)) - 1`` (= floor(log2 n)
for n ≥ 1, and 0 for n = 0, merging empty docs into the 1-token
bucket) — computed via base-2 string length in BOTH engines (Spark
``conv(n, 10, 2)``, DuckDB ``bin(n)``), never float ``log2``, so no
boundary value can land in different buckets across engines.

Output::

    (bucket, lo_tokens, n_docs, total_tokens, frac_docs, frac_tokens)

``lo_tokens`` = 2^bucket, the bucket's inclusive lower edge.

Scale: one projection (pure codegen token count) + one partial+final
aggregation on ~60 bucket keys + a 1-row broadcast of totals. The
corpus is scanned once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rust_gd_spark.functions.textstats import token_count, token_count_sql


def value_histogram(df: DataFrame, value_col: str) -> DataFrame:
    """Log2 histogram over any non-negative integer column — the same
    exact base-2-string bucketing as :func:`length_histogram`, reusable
    for turns-per-conversation, bytes-per-asset, chunk counts, etc.
    Output schema is identical (``lo_tokens`` reads as the bucket's
    inclusive lower edge in the column's own unit)."""
    n = F.col(value_col).cast("long")
    return _log2_histogram(df, n)


def length_histogram(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Log2 token-length histogram (module docstring)."""
    return _log2_histogram(df, token_count(F.col(text_col)).cast("long"))


def _log2_histogram(df: DataFrame, n) -> DataFrame:
    b = (
        df.select(
            (F.length(F.conv(n.cast("string"), 10, 2)) - 1)
            .cast("int")
            .alias("bucket"),
            n.alias("_n"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").alias("total_tokens"),
        )
    )
    totals = b.agg(
        F.sum("n_docs").alias("_td"), F.sum("total_tokens").alias("_tt")
    )
    return (
        b.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.expr("shiftleft(cast(1 as bigint), bucket)").alias("lo_tokens"),
            "n_docs",
            "total_tokens",
            F.round(F.col("n_docs") / F.col("_td"), 6).alias("frac_docs"),
            F.round(
                F.col("total_tokens") / F.greatest(F.col("_tt"), F.lit(1)), 6
            ).alias("frac_tokens"),
        )
    )


def length_histogram_sql(table: str, text_col: str = "text") -> str:
    """ANSI-SQL twin of :func:`length_histogram` (DuckDB-ready)."""
    return value_histogram_sql(table, token_count_sql(text_col))


def value_histogram_sql(table: str, value_expr: str) -> str:
    """ANSI-SQL twin of :func:`value_histogram` over any non-negative
    integer expression (DuckDB-ready)."""
    n = value_expr
    return f"""
        with d as (
          select (length(bin(({n})::bigint)) - 1)::int as bucket,
                 ({n})::bigint as _n
          from {table}
        ),
        b as (
          select bucket, count(*) as n_docs, sum(_n) as total_tokens
          from d group by bucket
        ),
        t as (
          select sum(n_docs) as td, sum(total_tokens) as tt from b
        )
        select b.bucket,
               (1::bigint << b.bucket) as lo_tokens,
               b.n_docs::bigint as n_docs,
               b.total_tokens::bigint as total_tokens,
               round(b.n_docs::double / t.td, 6) as frac_docs,
               round(b.total_tokens::double / greatest(t.tt, 1), 6)
                 as frac_tokens
        from b cross join t
    """
