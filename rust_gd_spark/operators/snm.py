"""Sorted-neighborhood candidate generation (Hernández & Stolfo,
SIGMOD 1995) — the third blocking family next to exact keys
(``exactdup``) and LSH bands (``minhash``/``simhash``).

Sort the corpus by a domain key, then pair every row with its ``w − 1``
successors in the global order. Complements LSH: a pair whose texts
share a long NORMALIZED PREFIX is adjacent in sort order and found with
probability 1 (LSH finds it only with the S-curve probability of its
Jaccard), while costing exactly ``n·(w−1)`` candidate pairs —
a hard, skew-free output bound no banding scheme gives.

Scale design — the global sort WITHOUT a global window:

* ``Window.orderBy(key)`` (no partitionBy) plans a SINGLE-TASK window:
  the whole corpus through one executor — the canonical scale-killer
  this engine bans. Instead ``global_ranks`` computes the exact global
  ``row_number`` as ``repartitionByRange(key)`` (Spark's distributed
  range partitioner — ascending key ranges land on ascending partition
  ids) → ``sortWithinPartitions`` → per-partition offsets from a P-row
  count pass (a bounded driver collect: one long per partition, the
  same class as the engine's other audited probes) → one
  ``mapInPandas`` running counter. Every stage is P-way parallel.
* Neighbor pairing is a BANDED equi-join on ``rank // w``: the left
  side posts its bucket, the right side posts its bucket and the
  previous one, so a pair at distance 1 ≤ Δ < w meets exactly once.
  Narrow int keys, one shuffle, AQE-splittable.

Determinism: ranks equal the global ``row_number() over (order by key,
id)`` REGARDLESS of where the (sampled, nondeterministic) range bounds
fall — boundaries only move rows between partitions, never reorder the
total (key, id) order that offsets accumulate over. The DuckDB twin is
therefore exact, not probabilistic.

Reference analogue: the reference's dictionary probes candidate bases
by exact content (`src/dict.rs:38-63`); SNM generalizes "exact content"
to "adjacent under a sort key" with a bounded neighborhood.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from .minhash import normalize_text, shingle_df, verify_jaccard


def global_ranks(
    df: DataFrame,
    key_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Input columns + ``rank`` (0-based, the exact global row_number by
    ``key_cols`` lexicographic ascending). ``key_cols`` must be a total
    order (include a unique id as the last column) or ranks within ties
    are partition-placement-dependent.

    Plan: range exchange + local sort + P-row count collect + one
    mapInPandas pass — no single-task global window at any stage.
    """
    # partition count follows the INPUT's parallelism (itself size-derived
    # at load boundaries — ensure_min_partitions), capped at the core
    # count: a fixed 2×cores range exchange put a sub-MB corpus through
    # 64 near-empty range partitions and every downstream stage paid the
    # task launches (guide §2.2: fewer, larger partitions).
    parts = num_partitions or max(
        1,
        min(
            df.rdd.getNumPartitions(),
            df.sparkSession.sparkContext.defaultParallelism,
        ),
    )
    sdf = (
        df.repartitionByRange(parts, *key_cols)
        .sortWithinPartitions(*key_cols)
        .withColumn("_pid", F.spark_partition_id())
        # freeze: the range sampler is nondeterministic and the frame
        # feeds two passes (counts + rank assignment)
        .localCheckpoint(eager=True)
    )
    counts = {r["_pid"]: r["count"] for r in sdf.groupBy("_pid").count().collect()}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    out_schema = T.StructType(
        [f for f in sdf.schema.fields if f.name != "_pid"]
        + [T.StructField("rank", T.LongType())]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if idx is None:
                idx = offsets[int(pdf["_pid"].iloc[0])]
            out = pdf.drop(columns=["_pid"])
            out["rank"] = range(idx, idx + len(pdf))
            idx += len(pdf)
            yield out

    return sdf.mapInPandas(assign, out_schema)


def snm_candidate_pairs(
    df: DataFrame,
    id_col: str = "uid",
    text_col: str = "text",
    window: int = 10,
    key: Column | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """``(id_l, id_r, rank_l, rank_r)`` for every pair within ``window``
    positions of each other in (key, id) sort order; ``id_l``/``id_r``
    are in RANK order (caller normalizes if it wants id order).

    ``key`` defaults to the first 64 chars of the engine-wide normalized
    text — prefix-similar docs become sort-adjacent.
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    k = key if key is not None else F.substring(normalize_text(F.col(text_col)), 1, 64)
    keyed = df.select(F.col(id_col).alias("id"), k.alias("snm_key"))
    ranked = global_ranks(keyed, ["snm_key", "id"], num_partitions).select(
        "id", "rank"
    )
    w = F.lit(int(window))
    bkt = F.expr(f"rank div {int(window)}")  # exact integral division
    left = ranked.select(
        F.col("id").alias("id_l"),
        F.col("rank").alias("rank_l"),
        bkt.alias("_bkt"),
    )
    right = ranked.select(
        F.col("id").alias("id_r"),
        F.col("rank").alias("rank_r"),
        F.explode(F.array(bkt, bkt - 1)).alias("_bkt"),
    )
    d = F.col("rank_r") - F.col("rank_l")
    return (
        left.join(right, "_bkt")
        .filter((d >= 1) & (d < w))
        .select("id_l", "id_r", "rank_l", "rank_r")
    )


def snm_near_dup_pairs(
    df: DataFrame,
    id_col: str = "uid",
    text_col: str = "text",
    window: int = 10,
    w_shingle: int = 5,
    threshold: float = 0.5,
    key: Column | None = None,
    num_partitions: int | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """SNM candidates verified with exact shingle Jaccard:
    ``(id_l, id_r, jaccard)`` with ``id_l < id_r`` (id order — rank
    order is an implementation detail the output doesn't leak).
    ``shingles``: optional shared shingle table (see
    ``exact_jaccard_pairs``)."""
    cand = snm_candidate_pairs(
        df, id_col, text_col, window=window, key=key, num_partitions=num_partitions
    ).select(
        F.least("id_l", "id_r").alias("id_l"),
        F.greatest("id_l", "id_r").alias("id_r"),
    ).dropDuplicates(["id_l", "id_r"])
    sh = shingles if shingles is not None else shingle_df(
        df, id_col, text_col, w=w_shingle
    )
    return verify_jaccard(cand.localCheckpoint(eager=True), sh, threshold=threshold)


def snm_candidate_pairs_sql(
    table: str,
    id_expr: str,
    text_expr: str,
    window: int = 10,
) -> str:
    """DuckDB twin of ``snm_candidate_pairs`` with the default key
    (first 64 normalized chars): exact global row_number + distance
    predicate. Normalized strings are ASCII, so binary collation orders
    identically in both engines."""
    norm = (
        f"substring(trim(regexp_replace(lower(coalesce({text_expr}, '')),"
        f" '[^a-z0-9]+', ' ', 'g')), 1, 64)"
    )
    return f"""
        with ranked as (
          select {id_expr} as id,
                 (row_number() over (order by {norm}, {id_expr}) - 1)::bigint
                   as rank
          from {table}
        )
        select l.id as id_l, r.id as id_r,
               l.rank as rank_l, r.rank as rank_r
        from ranked l join ranked r
          on r.rank - l.rank between 1 and {window - 1}
    """


def snm_recall_audit(
    df: DataFrame,
    id_col: str = "uid",
    text_col: str = "text",
    window: int = 10,
    w_shingle: int = 5,
    threshold: float = 0.5,
    key: Column | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Blocking-recall audit: SNM's verified pairs against the exact
    inverted-index ground truth at the same threshold, as ONE summary
    row::

        (n_exact, n_snm, n_hit, n_spurious, recall)

    The audit discipline of ``bbit_estimate_audit`` and the pruned-IVF
    recall row applied to the blocking family: every approximate
    candidate generator in this engine ships with an in-engine exact
    measurement of what it misses. ``n_spurious`` (SNM pairs absent
    from the exact set) is an INVARIANT zero — SNM verifies candidates
    with the same exact Jaccard — so a nonzero value is a bug detector,
    not a metric.

    Scale: the exact side is calibration-scale by nature (the audit is
    run on a sample or a small corpus to pick ``window``); both sides
    are pair tables, the full-outer marker join is pair-bounded, and
    the final aggregate is a single partial+final pass.
    """
    from rust_gd_spark.operators.minhash import exact_jaccard_pairs

    # ONE shingle pass feeds both sides (exact postings/sizes + SNM
    # verify) — the kernel is the audit's dominant per-row cost and ran
    # twice before (guide §1.2).
    sh = shingle_df(df, id_col, text_col, w=w_shingle).localCheckpoint(
        eager=True
    )
    exact = exact_jaccard_pairs(
        df, id_col, text_col, w=w_shingle, threshold=threshold, shingles=sh
    ).select("id_l", "id_r", F.lit(1).alias("_e"))
    snm = snm_near_dup_pairs(
        df, id_col, text_col, window=window, w_shingle=w_shingle,
        threshold=threshold, key=key, num_partitions=num_partitions,
        shingles=sh,
    ).select("id_l", "id_r", F.lit(1).alias("_s"))
    j = exact.join(snm, ["id_l", "id_r"], "full_outer")
    return j.agg(
        F.sum(F.coalesce(F.col("_e"), F.lit(0))).cast("long").alias("n_exact"),
        F.sum(F.coalesce(F.col("_s"), F.lit(0))).cast("long").alias("n_snm"),
        F.sum(
            F.when(F.col("_e").isNotNull() & F.col("_s").isNotNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_hit"),
    ).select(
        "n_exact",
        "n_snm",
        "n_hit",
        (F.col("n_snm") - F.col("n_hit")).alias("n_spurious"),
        F.round(
            F.col("n_hit") / F.greatest(F.col("n_exact"), F.lit(1)), 6
        ).alias("recall"),
    )
