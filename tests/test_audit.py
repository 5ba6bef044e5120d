"""Cluster cohesion audit: transitive-glue (weak-link) detection,
singleton/oversized exclusion, and exact per-pair Jaccard statistics."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def chained_cluster(spark):
    """Cluster c1 is a CHAIN: a~b and b~c are near-dups, a and c share
    almost nothing (transitive glue). Cluster c2 is a tight pair. s is a
    singleton; big1..big3 form a cluster we exclude via the size cap."""
    # texts built from w=2 word shingles for easy hand-computation
    texts = spark.createDataFrame(
        [
            ("a", "red green blue yellow purple orange"),
            ("b", "blue yellow purple orange cyan magenta"),
            ("c", "cyan magenta gold silver bronze pewter"),
            ("d", "alpha beta gamma delta"),
            ("e", "alpha beta gamma delta"),
            ("s", "lonely text here"),
            ("big1", "one two three"),
            ("big2", "one two three"),
            ("big3", "one two three"),
        ],
        "uid string, text string",
    )
    clusters = spark.createDataFrame(
        [
            ("a", "c1"), ("b", "c1"), ("c", "c1"),
            ("d", "c2"), ("e", "c2"),
            ("s", "c3"),
            ("big1", "c4"), ("big2", "c4"), ("big3", "c4"),
        ],
        "uid string, cluster_id string",
    )
    return clusters, texts


def test_audit_weak_link_and_bounds(spark, chained_cluster):
    from rust_gd_spark.operators.audit import cluster_quality_audit

    clusters, texts = chained_cluster
    out = {
        r.cluster_id: r
        for r in cluster_quality_audit(
            clusters, texts, id_col="uid", w=2,
            weak_threshold=0.5, max_cluster_size=2,
        ).collect()
    }
    # c1 (size 3) and c4 (size 3) exceed the cap; c3 is a singleton
    assert set(out) == {"c2"}
    r = out["c2"]
    assert r.n_members == 2 and r.n_pairs == 1
    assert r.min_jaccard == 1.0 and r.max_jaccard == 1.0
    assert r.n_weak_pairs == 0 and not r.has_weak_link


def test_audit_detects_transitive_glue(spark, chained_cluster):
    from rust_gd_spark.operators.audit import cluster_quality_audit

    clusters, texts = chained_cluster
    out = {
        r.cluster_id: r
        for r in cluster_quality_audit(
            clusters, texts, id_col="uid", w=2,
            weak_threshold=0.5, max_cluster_size=10,
        ).collect()
    }
    assert set(out) == {"c1", "c2", "c4"}
    c1 = out["c1"]
    assert c1.n_members == 3 and c1.n_pairs == 3
    # w=2 shingles: a has 5, b has 5, a∩b = {"blue yellow","yellow purple",
    # "purple orange"} = 3 → J(a,b)=3/7; J(b,c)=1/9 ("cyan magenta");
    # J(a,c)=0 — the chain's glue shows up as min_jaccard == 0
    assert c1.min_jaccard == 0.0
    assert c1.max_jaccard == pytest.approx(3 / 7, abs=1e-6)
    assert c1.n_weak_pairs == 3 and c1.has_weak_link
    c4 = out["c4"]
    assert c4.n_pairs == 3 and c4.min_jaccard == 1.0 and not c4.has_weak_link
