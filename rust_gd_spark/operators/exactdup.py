"""Exact duplicate grouping via content hash — the degenerate (deviation=0)
case of the reference's GD dictionary (`src/dict.rs:38-63`): identical
content maps to the same dictionary entry.

Skew note: a window over the content key would put EVERY copy of a hot
boilerplate text into one window partition in one task — and AQE cannot
split window skew. The groupBy formulation shuffles compact
(content_key, min_id, count) rows with map-side partial aggregation, and
the join back is AQE-skew-splittable. At small scale AQE runtime stats
turn the join into a BroadcastHashJoin (pinned by test); at corpus scale
(groups ~ distinct content, too big to broadcast) it becomes a shuffle
join co-partitioned on content_key — never a per-key single-task window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .minhash import normalize_text


def exact_dup_groups(
    df: DataFrame,
    id_col: str = "uid",
    text_col: str = "text",
    normalized: bool = False,
    materialize: bool = True,
) -> DataFrame:
    """``(id, content_key, canonical_id, group_size)`` for every row.

    content_key = md5 of (optionally normalized) text — md5 so the DuckDB
    oracle computes the identical key. canonical_id = min(id) in the group.
    Plan: HashAggregate (partial+final) + one join — no Window operator.

    NULL doctrine: NULL text hashes as '' (consistent with
    ``normalize_text``'s coalesce). md5(NULL) is NULL, and a NULL content
    key silently falls out of the null-unsafe equi-join back — rows with
    NULL text would vanish from the output instead of grouping together.
    """
    key_src = (
        normalize_text(F.col(text_col))
        if normalized
        else F.coalesce(F.col(text_col), F.lit(""))
    )
    keyed = df.select(F.col(id_col).alias("id"), F.md5(key_src).alias("content_key"))
    # keyed feeds BOTH the group agg and the join back; without
    # materialization Spark scans the source (including the text column —
    # the dominant byte volume at corpus scale) and hashes it TWICE.
    # Materialized, the reuse reads compact ~48-byte (id, key) rows.
    if materialize:
        keyed = keyed.localCheckpoint(eager=True)
    groups = keyed.groupBy("content_key").agg(
        F.min("id").alias("canonical_id"), F.count("*").alias("group_size")
    )
    return keyed.join(groups, "content_key").select(
        "id", "content_key", "canonical_id", "group_size"
    )


def exact_dup_pairs(groups: DataFrame) -> DataFrame:
    """``(id_l, id_r)`` edges: every non-canonical member → its canonical.

    Star edges (not all-pairs) — O(n) edges per group instead of O(n²);
    connected components restores the full cluster.
    """
    return (
        groups.filter(F.col("id") != F.col("canonical_id"))
        .select(F.col("canonical_id").alias("id_l"), F.col("id").alias("id_r"))
    )


def dedup_rate_by_source(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source exact-duplication rates — the corpus-governance rollup.

    Which ingestion source ships duplicated content? Per source::

        (source, n_docs, n_distinct, n_dup_docs, dup_ratio)

    ``n_distinct`` counts distinct content keys WITHIN the source,
    ``n_dup_docs = n_docs − n_distinct`` (docs that would be removed by
    within-source exact dedup), ``dup_ratio = n_dup_docs / n_docs``
    (6dp). Cross-source duplication is deliberately out of scope here —
    that is ``overlap.source_overlap_matrix``'s job; this operator is
    the per-source health metric that decides which feed gets
    re-crawled less or deduplicated at ingest.

    Scale: one partial-agg shuffle on (source, content_key) + one tiny
    per-source rollup — both map-side combinable; no joins.
    """
    key = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    per_key = (
        df.select(F.col(source_col).alias("source"), key.alias("k"))
        .groupBy("source", "k")
        .agg(F.count("*").alias("c"))
    )
    return (
        per_key.groupBy("source")
        .agg(
            F.sum("c").alias("n_docs"),
            F.count("*").alias("n_distinct"),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            (F.col("n_docs") - F.col("n_distinct")).cast("long").alias("n_dup_docs"),
            F.round(
                (F.col("n_docs") - F.col("n_distinct"))
                / F.greatest("n_docs", F.lit(1)).cast("double"),
                6,
            ).alias("dup_ratio"),
        )
    )
