"""Cross-source duplicate overlap matrix — which sources copy which.

Corpus curation needs the dup structure BETWEEN sources, not just the
global rate: a mirror site shows up as a dense off-diagonal cell, a
crawler double-fetch as a fat diagonal, and a licensed re-publisher as
an asymmetric containment. The matrix drives source-level decisions
(drop the mirror, keep the original) the per-document operators can't
see — the same aggregate-over-host philosophy as
``domainfilter.domain_filter``, one level up.

Scale shape (the whole point — NEVER explode duplicate groups into
pairs): a boilerplate text shared by 10^6 docs across 20 sources is
ONE ``(key, source, count)`` row per source, and each source pair's
contribution is ``cnt_a · cnt_b`` computed from the compact group
table — the pair EXPLOSION never happens. Two partial-agg shuffles
(key×source counts, then matrix cells); the key self-join carries one
row per (key, source), AQE-splittable.

``pair_overlap_matrix`` is the generic form for PAIR LISTS that are
already bounded (LSH-verified near-dup pairs): two joins to the
membership table + one agg.

Reference analogue: the reference's dedup-rate accounting per stream
block (`src/lib.rs:131-135`) — here the accounting is per source pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .minhash import normalize_text


def source_overlap_matrix(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    normalized: bool = False,
) -> DataFrame:
    """``(source_a, source_b, n_dup_pairs, n_shared_keys)`` for every
    ordered source pair (``source_a <= source_b``) with at least one
    shared exact content key; the diagonal counts within-source
    duplicate pairs (``C(cnt, 2)`` per key)."""
    key_src = (
        normalize_text(F.col(text_col))
        if normalized
        else F.coalesce(F.col(text_col), F.lit(""))
    )
    g = (
        df.select(F.md5(key_src).alias("h"), F.col(source_col).alias("src"))
        .groupBy("h", "src")
        .agg(F.count("*").alias("c"))
    )
    l = g.select("h", F.col("src").alias("source_a"), F.col("c").alias("_ca"))
    r = g.select("h", F.col("src").alias("source_b"), F.col("c").alias("_cb"))
    cross = (
        l.join(r, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            (F.col("_ca") * F.col("_cb")).alias("_pairs"),
        )
    )
    diag = g.filter(F.col("c") >= 2).select(
        F.col("src").alias("source_a"),
        F.col("src").alias("source_b"),
        F.expr("c * (c - 1) div 2").alias("_pairs"),  # exact integral
    )
    return (
        cross.unionByName(diag)
        .groupBy("source_a", "source_b")
        .agg(
            F.sum("_pairs").alias("n_dup_pairs"),
            F.count("*").alias("n_shared_keys"),
        )
    )


def pair_overlap_matrix(
    pairs: DataFrame,
    membership: DataFrame,
    id_col: str = "id",
    source_col: str = "source",
) -> DataFrame:
    """``(source_a, source_b, n_dup_pairs)`` from an explicit
    (bounded, e.g. LSH-verified) pair list ``(id_l, id_r)`` — two hash
    joins to the membership table, sources ordered so each unordered
    source pair lands in one cell."""
    ml = membership.select(
        F.col(id_col).alias("id_l"), F.col(source_col).alias("_sl")
    )
    mr = membership.select(
        F.col(id_col).alias("id_r"), F.col(source_col).alias("_sr")
    )
    return (
        pairs.join(ml, "id_l")
        .join(mr, "id_r")
        .select(
            F.least("_sl", "_sr").alias("source_a"),
            F.greatest("_sl", "_sr").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_dup_pairs"))
    )


def source_overlap_matrix_sql(
    table: str,
    id_expr: str = "doc_id",
    text_expr: str = "text",
    source_expr: str = "source",
) -> str:
    """DuckDB twin of ``source_overlap_matrix`` (exact config)."""
    return f"""
        with g as (
          select md5(coalesce({text_expr}, '')) as h,
                 {source_expr} as src, count(*)::bigint as c
          from {table} group by 1, 2
        ),
        cells as (
          select l.src as source_a, r.src as source_b,
                 l.c * r.c as pairs
          from g l join g r on l.h = r.h and l.src < r.src
          union all
          select src, src, (c * (c - 1) // 2)::bigint
          from g where c >= 2
        )
        select source_a, source_b,
               sum(pairs)::bigint as n_dup_pairs,
               count(*)::bigint as n_shared_keys
        from cells group by 1, 2
    """
