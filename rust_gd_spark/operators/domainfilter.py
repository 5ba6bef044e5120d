"""Host-level (domain) aggregate filtering.

Web-pipeline stage between URL dedup and per-document quality gating:
documents are kept or dropped by the quality of their HOST, not just
their own text — a host whose pages mostly fail the quality gate is a
spam/SEO farm, and its remaining "passing" pages are usually junk that
slipped the per-doc model (the CCNet / RefinedWeb domain-filter stage).

Reference analogue: the dictionary's eviction policy judges a BASE by
its aggregate usage across chunks, not one occurrence
(`src/dict.rs:93-112`); here a host is judged by its aggregate keep
ratio across documents.

Determinism note: the per-host metric is a ratio of two exact integer
counts (`keep_docs / docs`), not a mean of floats — IEEE division of
exact integers is bit-identical across engines and partition orders, so
the DuckDB oracle can compare it unrounded. A float mean (avg of model
probabilities) would drift in the last bits with summation order.

Scale notes: one partial+final HashAggregate on host (counts combine
map-side; a mega-host shuffles one row per partition, not its docs) and
one AQE-skew-splittable join back. Host extraction is codegen regexp on
the canonical URL. Nothing Python, nothing quadratic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .urldedup import canonicalize_url, canonicalize_url_sql

_HOST_RE = "^[^/?#]*://([^/?#]+)"


def extract_host(url: Column) -> Column:
    """Host of a URL (after canonicalization: lowercased, no ``www.``,
    no default port). '' when the string has no ``scheme://`` part."""
    return F.regexp_extract(canonicalize_url(url), _HOST_RE, 1)


def extract_host_sql(expr: str) -> str:
    """DuckDB twin of :func:`extract_host`."""
    return f"regexp_extract({canonicalize_url_sql(expr)}, '{_HOST_RE}', 1)"


def host_stats(
    df: DataFrame, url_col: str = "url", keep_col: str = "keep"
) -> DataFrame:
    """``(host, host_docs, host_keep_docs, keep_ratio)`` per host.

    ``keep_col`` is the per-document boolean from any upstream gate
    (e.g. ``functions.quality_model.quality_keep``).
    """
    hosted = df.select(
        extract_host(F.col(url_col)).alias("host"),
        F.col(keep_col).cast("int").alias("_k"),
    )
    return hosted.groupBy("host").agg(
        F.count("*").alias("host_docs"),
        F.sum("_k").alias("host_keep_docs"),
        (F.sum("_k") / F.count("*")).alias("keep_ratio"),
    )


def domain_filter(
    df: DataFrame,
    url_col: str = "url",
    keep_col: str = "keep",
    min_keep_ratio: float = 0.8,
    min_docs: int = 1,
) -> DataFrame:
    """Rows of ``df`` whose host passes the aggregate gate
    (``keep_ratio >= min_keep_ratio`` and ``host_docs >= min_docs``),
    annotated with ``host``, ``host_docs``, ``host_keep_docs``,
    ``keep_ratio``. A doc that passes its own gate on a failing host is
    dropped — that is the point of the stage.
    """
    if not 0.0 <= min_keep_ratio <= 1.0:
        raise ValueError(f"min_keep_ratio must be in [0,1]: {min_keep_ratio}")
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1: {min_docs}")
    # the annotation columns would silently clobber caller data
    # (withColumn overwrite) or make the join-back ambiguous
    reserved = {"host", "host_docs", "host_keep_docs", "keep_ratio"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns collide with domain_filter outputs: {sorted(clash)}"
        )
    hosted = df.withColumn("host", extract_host(F.col(url_col)))
    stats = host_stats(df, url_col, keep_col)
    return hosted.join(stats, "host").filter(
        (F.col("keep_ratio") >= F.lit(min_keep_ratio))
        & (F.col("host_docs") >= F.lit(min_docs))
    )
