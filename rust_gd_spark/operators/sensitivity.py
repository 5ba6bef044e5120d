"""Dedup-threshold sensitivity: the corpus-impact curve of a similarity
threshold, computed over a verified near-dup pair list.

``operators/lshplan.py`` answers "given a target threshold, what LSH
banding?"; this module answers the question that comes BEFORE it: "what
does each candidate threshold DO to this corpus?" — how many verified
pairs, and how many distinct documents, survive at each threshold in a
grid. The curve is what a curator reads to pick the threshold (a knee in
n_docs means a boilerplate stratum glues on below that point), and it is
re-computed per corpus, so it is a query, not a code edit — the same
philosophy as the LSH planner and the compaction planner.

Input is any pair list with an exact similarity column — at calibration
scale the exact inverted-index pairs (``minhash.exact_jaccard_pairs``),
at 100 TB the LSH-verified pairs (``minhash.minhash_near_dup_pairs``),
whose floor threshold must then be ≤ min(grid). The operator itself
never touches the corpus: its cost is O(|pairs| · |grid|), and the pair
table is candidate-bounded by construction.

Scale shape: the grid is a literal array EXPLODE (a narrow operator —
no join, no broadcast-nested-loop), followed by ONE aggregation
shuffle keyed on the threshold; the final left join against the
grid-literal frame (so empty thresholds still report 0) broadcasts a
≤ |grid|-row side.

Reference analogue: the dedup-rate printout per (deg, chunk) parameter
point (`/root/reference/src/lib.rs:131-135`) — the reference sweeps its
compression parameter and reports the realized rate; here the swept
parameter is the Jaccard threshold and the realized quantity is the
pair/document impact.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def _clean_grid(grid: Sequence[float]) -> list[float]:
    ts = sorted({float(t) for t in grid})
    if not ts:
        raise ValueError("grid must contain at least one threshold")
    return ts


def threshold_sensitivity(
    pairs: DataFrame,
    grid: Sequence[float],
    id_l: str = "id_l",
    id_r: str = "id_r",
    sim_col: str = "jaccard",
) -> DataFrame:
    """Per-threshold ``(n_pairs, n_docs)`` over a verified pair list.

    For each ``t`` in ``grid``: ``n_pairs`` = pairs with ``sim >= t``,
    ``n_docs`` = distinct documents appearing in those pairs. The
    comparison uses the UNROUNDED similarity column — pass the raw
    operator output, not a display-rounded projection, so the twin
    comparison is bit-exact on both engines (both compute the same
    IEEE double from the same integer counts).

    Every grid threshold gets a row; thresholds no pair reaches report
    ``(0, 0)``.
    """
    ts = _clean_grid(grid)
    spark = pairs.sparkSession
    grid_df = spark.createDataFrame([(t,) for t in ts], "threshold double")
    gcol = F.explode(F.array(*[F.lit(t) for t in ts])).alias("threshold")
    e = (
        pairs.select(
            F.col(sim_col).alias("_sim"),
            F.col(id_l).alias("_a"),
            F.col(id_r).alias("_b"),
        )
        .select(gcol, "_sim", "_a", "_b")
        .filter(F.col("_sim") >= F.col("threshold"))
        # each surviving pair contributes exactly two doc rows, so the
        # pair count is recovered as count(*)/2 — one aggregation pass
        # covers both metrics without a second shuffle
        .select("threshold", F.explode(F.array("_a", "_b")).alias("_doc"))
    )
    agg = e.groupBy("threshold").agg(
        (F.count("*") / 2).cast("long").alias("n_pairs"),
        F.count_distinct("_doc").alias("n_docs"),
    )
    return (
        # the post-aggregation side is ≤|grid| rows — broadcast it so the
        # join-back never plans as a sort-merge exchange
        grid_df.join(F.broadcast(agg), "threshold", "left")
        .select(
            "threshold",
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
        )
    )


def threshold_sensitivity_sql(
    pairs_sql: str,
    grid: Sequence[float],
    id_l: str = "id_l",
    id_r: str = "id_r",
    sim_col: str = "jaccard",
) -> str:
    """ANSI-SQL twin of :func:`threshold_sensitivity` (DuckDB-ready).

    ``pairs_sql`` is a subquery yielding the same pair list with the
    same UNROUNDED similarity column. Thresholds are emitted as
    ``cast('<repr>' as double)`` — string→double uses strtod, which
    round-trips Python's shortest-repr floats bit-exactly, whereas a
    bare numeric literal goes through DECIMAL first and can land one
    ulp off for >15-significant-digit thresholds (caught by the
    hypothesis twin test).
    """
    ts = _clean_grid(grid)
    lits = ", ".join(f"cast('{t!r}' as double)" for t in ts)
    return f"""
        with pairs as ({pairs_sql}),
        grid as (select unnest([{lits}]) as threshold),
        e as (
          select g.threshold, p.{id_l} as a, p.{id_r} as b
          from grid g join pairs p on p.{sim_col} >= g.threshold
        ),
        np as (
          select threshold, count(*) as n_pairs from e group by threshold
        ),
        nd as (
          select threshold, count(distinct doc) as n_docs
          from (select threshold, unnest([a, b]) as doc from e)
          group by threshold
        )
        select g.threshold,
               coalesce(np.n_pairs, 0)::bigint as n_pairs,
               coalesce(nd.n_docs, 0)::bigint as n_docs
        from grid g
        left join np using (threshold)
        left join nd using (threshold)
    """
