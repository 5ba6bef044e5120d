"""Cluster cohesion audit: per-cluster pairwise-Jaccard statistics.

Connected-components clustering (``operators/components.py``) is
transitive by construction: A~B and B~C glue A and C into one cluster
even when Jaccard(A, C) is near zero (the classic "chain" failure mode
of transitive-closure dedup — one boilerplate-heavy document bridges
two unrelated groups, and survivorship then deletes documents that
were never near-duplicates of the kept representative).

This operator measures exactly that: for every cluster (bounded by
``max_cluster_size`` — all-pairs inside a 10⁶-member cluster is never
acceptable; oversized clusters are counted, not exploded), it computes
the EXACT w-shingle Jaccard of every member pair and reports
order-independent statistics::

    (cluster_id, n_members, n_pairs, min_jaccard, max_jaccard,
     n_weak_pairs, has_weak_link)

``n_weak_pairs`` counts pairs below ``weak_threshold`` (pairs that are
in the cluster only through transitive glue); ``has_weak_link`` flags
clusters a chain built. min/max (not mean) keep the output bit-stable:
a floating-point mean is partition-order-dependent, min/max of per-pair
6-dp-rounded values are not — the same discipline as
``bbit_estimate_audit`` (`operators/bbit.py`).

This is the operational check behind the dup-pair recall ≥ 0.99
criterion (BASELINE.json): recall says every true pair is FOUND;
this audit says nothing false was GLUED.

Scale notes (the 100 TB shape): cluster sizes after dedup follow a
heavy-tailed but bounded distribution (the pipeline's bucket caps
already bound candidate generation); the audit joins members on
``cluster_id`` (one shuffle), self-joins within cluster (bounded by
cap² rows per cluster — AQE splits a hot cluster), and reuses
``verify_jaccard``'s no-explode array_intersect kernel. The shingle
table is computed once and rides both join sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .minhash import shingle_df, verify_jaccard


def cluster_quality_audit(
    clusters: DataFrame,
    texts: DataFrame,
    id_col: str = "uid",
    cluster_col: str = "cluster_id",
    text_col: str = "text",
    w: int = 5,
    weak_threshold: float = 0.5,
    max_cluster_size: int = 1000,
) -> DataFrame:
    """Per-cluster pairwise-Jaccard cohesion stats (see module docstring).

    ``clusters``: (id_col, cluster_col) — one row per member.
    ``texts``: (id_col, text_col). Singleton clusters have no pairs and
    are omitted; clusters larger than ``max_cluster_size`` are omitted
    from the pair audit (count them upstream via a size histogram —
    ``key_skew_profile`` covers that shape) so the audit's cost is
    bounded by cap² per cluster, never corpus².
    """
    sizes = clusters.groupBy(cluster_col).agg(F.count("*").alias("n_members"))
    bounded = sizes.filter(
        (F.col("n_members") >= 2) & (F.col("n_members") <= max_cluster_size)
    )
    members = clusters.join(bounded, cluster_col).select(
        F.col(cluster_col).alias("cl"), F.col(id_col).alias("id"), "n_members"
    )
    l = members.alias("l")
    r = members.alias("r")
    pairs = (
        l.join(r, (F.col("l.cl") == F.col("r.cl")) & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.cl").alias("cl"),
            F.col("l.n_members").alias("n_members"),
            F.col("l.id").alias("id_l"),
            F.col("r.id").alias("id_r"),
        )
    )
    sh = shingle_df(texts, id_col, text_col, w=w)
    jac = verify_jaccard(pairs.select("id_l", "id_r"), sh, threshold=0.0).select(
        "id_l", "id_r", F.round("jaccard", 6).alias("jaccard")
    )
    audited = pairs.join(jac, ["id_l", "id_r"])
    return (
        audited.groupBy(F.col("cl").alias(cluster_col))
        .agg(
            F.max("n_members").alias("n_members"),
            F.count("*").alias("n_pairs"),
            F.min("jaccard").alias("min_jaccard"),
            F.max("jaccard").alias("max_jaccard"),
            F.sum(
                F.when(F.col("jaccard") < weak_threshold, 1).otherwise(0)
            ).alias("n_weak_pairs"),
        )
        .withColumn("has_weak_link", F.col("n_weak_pairs") > 0)
    )
