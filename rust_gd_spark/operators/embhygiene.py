"""Embedding-column hygiene: vector schema-integrity counts.

The ANN/SemDeDup/decontam family (``operators/embedding.py``) assumes
every row carries a finite, correctly-dimensioned, non-degenerate
vector — an assumption real embedding pipelines break routinely (a
failed encoder batch emits zeros or NaNs; a model swap changes the
dimension mid-corpus; a join slip leaves NULLs). A NaN reaching a dot
product silently poisons every cosine it touches, and zero vectors make
cosine undefined — so this audit runs BEFORE the embedding tiers, the
way ``ingest_hygiene_report`` runs before the (id, text) tiers::

    (n_vecs, n_null_vec, n_dim_mismatch, n_nonfinite, n_zero_vec)

Counts are integer-exact and cross-engine deterministic: each predicate
is a per-row array scan (size check, NaN/Inf membership, all-zero
membership) — no floating-point AGGREGATION is involved, so there is no
summation-order hazard (the reason this audit reports counts, not norm
statistics).

Scale: one projection with array-lambda predicates (codegen
HigherOrderFunctions, no UDF) + a single-row partial+final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def embedding_hygiene(
    df: DataFrame,
    vec_col: str = "embedding",
    expected_dim: int = 64,
) -> DataFrame:
    """One-row embedding schema-integrity report (module docstring).

    ``n_dim_mismatch``/``n_nonfinite``/``n_zero_vec`` count only
    non-NULL vectors (NULLs are their own counter); a NaN component
    makes a vector non-finite but never zero (NaN == 0 is false in both
    engines).
    """
    if expected_dim < 1:
        raise ValueError(f"expected_dim must be >= 1, got {expected_dim}")
    v = F.col(vec_col)
    nonnull = v.isNotNull()
    inf = float("inf")
    bad = F.exists(
        v, lambda x: F.isnan(x) | (x == F.lit(inf)) | (x == F.lit(-inf))
    )
    # a NULL component disqualifies "zero vector" in both engines
    zero = F.forall(v, lambda x: F.coalesce(x == F.lit(0.0), F.lit(False)))
    return df.select(
        F.lit(1).alias("_one"),
        v.isNull().cast("int").alias("_null"),
        (nonnull & (F.size(v) != expected_dim)).cast("int").alias("_dim"),
        (nonnull & bad).cast("int").alias("_bad"),
        (nonnull & (F.size(v) > 0) & zero).cast("int").alias("_zero"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("_null").cast("long").alias("n_null_vec"),
        F.sum("_dim").cast("long").alias("n_dim_mismatch"),
        F.sum("_bad").cast("long").alias("n_nonfinite"),
        F.sum("_zero").cast("long").alias("n_zero_vec"),
    )


def embedding_hygiene_sql(
    table: str,
    vec_col: str = "embedding",
    expected_dim: int = 64,
) -> str:
    """ANSI-SQL twin of :func:`embedding_hygiene` (DuckDB-ready) — the
    same per-row list-lambda predicates."""
    v = vec_col
    return f"""
        select count(*)::bigint as n_vecs,
               sum(case when {v} is null then 1 else 0 end)::bigint
                 as n_null_vec,
               sum(case when {v} is not null
                         and len({v}) <> {expected_dim}
                    then 1 else 0 end)::bigint as n_dim_mismatch,
               sum(case when {v} is not null
                         and len(list_filter({v},
                               x -> isnan(x) or isinf(x))) > 0
                    then 1 else 0 end)::bigint as n_nonfinite,
               sum(case when {v} is not null and len({v}) > 0
                         and len(list_filter({v},
                               x -> x is null or x <> 0)) = 0
                    then 1 else 0 end)::bigint as n_zero_vec
        from {table}
    """
