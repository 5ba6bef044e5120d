"""Soft deduplication: per-document sampling weights instead of removal.

Modern pretraining pipelines increasingly *reweight* near-duplicate
documents rather than dropping all but one (soft dedup / "data
commonness" reweighting, e.g. SoftDeDup, arXiv:2407.06654): every member
of a near-dup cluster is kept, but its sampling weight is scaled by the
inverse cluster size so the CLUSTER contributes one document's worth of
expected tokens. Downstream samplers consume the weight column directly
(weighted reservoir / Poisson sampling).

Relation to the reference engine: the reference deduplicates by storing
one base chunk and per-duplicate deviations (`src/lib.rs` GD round-trip);
soft dedup is the statistical analogue — one unit of probability mass per
base, spread over its duplicates.

Scale design (10^12-turn corpus):

* Input is the (id, cluster_id) table produced by connected components —
  two narrow columns, NOT the text.
* ``groupBy(cluster_id).count`` and the join back are keyed identically,
  so the exchange introduced by the aggregation is reused for the join
  (one shuffle of the narrow table total); AQE converts the join to
  broadcast when the per-cluster side fits.
* No window function: ``count() over (partition by cluster_id)`` would
  sort every partition; the agg+join form is partial-agg friendly and
  sort-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def soft_dedup_weights(
    clusters: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """``(id, cluster_id, cluster_size, weight)`` — weight = 1/|cluster|.

    Every input row survives (unique documents get weight 1.0); the sum
    of weights equals the number of clusters, i.e. the corpus size a
    hard dedup would have produced.
    """
    sizes = clusters.groupBy(cluster_col).agg(
        F.count("*").alias("cluster_size")
    )
    return clusters.join(sizes, cluster_col).select(
        id_col,
        cluster_col,
        "cluster_size",
        F.round(F.lit(1.0) / F.col("cluster_size").cast("double"), 6).alias(
            "weight"
        ),
    )
