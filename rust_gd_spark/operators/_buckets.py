"""One-shuffle candidate-pair generation from bucket keys.

All three candidate paths (LSH bands, SimHash bands, winnow postings)
reduce to: hash rows into buckets, emit every within-bucket pair, cap and
audit oversized buckets. The naive formulation — window-count the bucket
sizes, then self-equi-join on the bucket key — costs THREE shuffles of the
full posting table (window sort, join left, join right) plus a shuffle of
the raw pair blow-up for dedup. This helper does it with ONE shuffle:

    groupBy(bucket key) → collect capped, sorted member list →
    JVM-side pair explosion (flatten/transform, whole-stage codegen)

The member array is bounded by ``max_bucket_size`` BEFORE explosion, so a
hot bucket costs at most cap²/2 generated rows streamed out of a single
task — and every excluded bucket is returned in the audit frame, never
dropped silently. At 10^12 rows the posting table is the big thing; its
shuffle count is the job cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bucket_pairs(
    df: DataFrame,
    key_cols: list[str],
    payload_cols: list[str] | None = None,
    max_bucket_size: int = 2000,
    id_col: str = "id",
) -> tuple[DataFrame, DataFrame]:
    """``(pairs, audit)`` — pairs has ``id_l, id_r`` (+ ``<payload>_l/_r``).

    Pairs are NOT globally deduplicated (the same pair may arise from
    several buckets); callers dedup after their cheap verify filter so the
    dedup shuffle sees survivors, not the raw candidate blow-up.
    ``id_l < id_r`` is guaranteed via a sorted member array.
    """
    payload_cols = payload_cols or []
    member = F.struct(
        F.col(id_col).alias("id"), *[F.col(c).alias(c) for c in payload_cols]
    )
    # Prune singleton buckets BEFORE collecting member arrays. With
    # high-entropy keys (64-bit LSH band hashes) almost every bucket has one
    # member; collect_list over those allocates hundreds of millions of tiny
    # arrays and spills. The count agg shuffles compact (key, n) rows, the
    # surviving multi-member key set is small (O(duplicate pairs)) so AQE
    # picks a broadcast join, and only the pruned rows pay the list agg.
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("bucket_size"))
    audit = counts.filter(F.col("bucket_size") > max_bucket_size).select(
        *key_cols, "bucket_size"
    )
    multi = counts.filter(
        (F.col("bucket_size") >= 2) & (F.col("bucket_size") <= max_bucket_size)
    ).select(*key_cols)
    pruned = df.join(multi, key_cols)
    ok = (
        pruned.groupBy(*key_cols)
        .agg(F.collect_list(member).alias("ms"))
        .select(F.array_sort("ms").alias("ms"))  # by id ⇒ i<j → id_i < id_j
    )

    ms = F.col("ms")
    pair_arr = F.flatten(
        F.transform(
            ms,
            lambda x, i: F.transform(
                F.slice(ms, i + 2, F.greatest(F.size(ms) - i - 1, F.lit(0))),
                lambda y: F.struct(
                    x["id"].alias("id_l"),
                    y["id"].alias("id_r"),
                    *[x[c].alias(f"{c}_l") for c in payload_cols],
                    *[y[c].alias(f"{c}_r") for c in payload_cols],
                ),
            ),
        )
    )
    pairs = ok.select(F.explode(pair_arr).alias("p")).select("p.*")
    return pairs, audit
