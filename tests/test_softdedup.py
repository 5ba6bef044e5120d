"""Soft-dedup sampling-weight operator tests."""

import pytest

from rust_gd_spark.operators.softdedup import soft_dedup_weights


def test_weights_inverse_cluster_size(spark):
    clusters = spark.createDataFrame(
        [
            ("a", "c1"),
            ("b", "c1"),
            ("c", "c2"),
            ("d", "c3"),
            ("e", "c3"),
            ("f", "c3"),
            ("g", "c3"),
        ],
        ["id", "cluster_id"],
    )
    rows = {r.id: r for r in soft_dedup_weights(clusters).collect()}
    assert len(rows) == 7  # every member survives
    assert rows["a"].cluster_size == 2 and rows["a"].weight == 0.5
    assert rows["b"].weight == 0.5
    assert rows["c"].cluster_size == 1 and rows["c"].weight == 1.0
    for m in "defg":
        assert rows[m].cluster_size == 4 and rows[m].weight == 0.25
    # total mass = number of clusters (what hard dedup would have kept)
    assert abs(sum(r.weight for r in rows.values()) - 3.0) < 1e-9


def test_weights_on_pipeline_clusters(spark, transcripts_df):
    """End-to-end: the weight table agrees with the pipeline's own
    cluster sizes, and hard-dedup mass is preserved."""
    from rust_gd_spark.pipeline import (
        DedupConfig, canonical_clusters, near_dup_pipeline, with_turn_uid,
    )

    res = near_dup_pipeline(
        with_turn_uid(transcripts_df), "uid", "text",
        DedupConfig(enable_simhash=False, neighbor_window=None),
    )
    clus = canonical_clusters(res.clusters)
    w = soft_dedup_weights(clus, "id", "cluster_id")
    n_members = clus.count()
    n_clusters = clus.select("cluster_id").distinct().count()
    agg = w.agg({"weight": "sum", "*": "count"}).collect()[0]
    assert agg["count(1)"] == n_members
    assert abs(agg["sum(weight)"] - n_clusters) < 1e-3
