"""Conversation-level (turn-set) dedup: hand-checked similarity math,
the df_cap prefix filter + audit, containment mode, and cluster
assignment vs expectation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_gd_spark.operators.convdedup import (
    ConvDedupAudit,
    conversation_dup_clusters,
    conversation_dup_pairs,
    conversation_turn_sets,
)


def _tr(spark, rows):
    return spark.createDataFrame(
        [(c, i, t) for c, i, t in rows], "conv_id string, turn_idx int, text string"
    )


@pytest.fixture(scope="module")
def convs(spark):
    # A: 4 turns; B: A re-logged without turn 3 (jac 3/4, cont 1);
    # C: turns 0,2 of A (jac 1/2, cont 1); D: disjoint.
    rows = []
    turns = ["alpha one", "bravo two", "charlie three", "delta four"]
    for i, t in enumerate(turns):
        rows.append(("A", i, t))
    for i, t in enumerate(turns[:3]):
        rows.append(("B", i, t))
    rows += [("C", 0, turns[0]), ("C", 1, turns[2])]
    rows += [("D", 0, "echo five"), ("D", 1, "foxtrot six")]
    return _tr(spark, rows)


def test_turn_sets_normalize_and_dedupe(spark):
    df = _tr(
        spark,
        [("A", 0, "Hello, World!"), ("A", 1, "hello   world"), ("A", 2, "x")],
    )
    got = conversation_turn_sets(df).collect()
    # the two normalized-equal turns collapse to one hash
    assert len(got) == 2


def test_pair_math_jaccard_and_containment(spark, convs):
    rows = {
        (r.conv_l, r.conv_r): r
        for r in conversation_dup_pairs(convs, threshold=0.4).collect()
    }
    assert set(rows) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = rows[("A", "B")]
    assert (ab.n_common, ab.jaccard, ab.containment) == (3, 0.75, 1.0)
    ac = rows[("A", "C")]
    assert (ac.n_common, ac.jaccard, ac.containment) == (2, 0.5, 1.0)
    bc = rows[("B", "C")]
    # |B∩C|=2 ({alpha, charlie}), |B∪C|=3 → jaccard 2/3
    assert (bc.n_common, bc.jaccard, bc.containment) == (2, 0.666667, 1.0)


def test_containment_measure_and_threshold(spark, convs):
    got = conversation_dup_pairs(
        convs, threshold=0.99, measure="containment"
    ).collect()
    # all three overlapping pairs are full containments; D joins nothing
    assert {(r.conv_l, r.conv_r) for r in got} == {
        ("A", "B"),
        ("A", "C"),
        ("B", "C"),
    }
    none = conversation_dup_pairs(convs, threshold=0.8, measure="jaccard").collect()
    assert {(r.conv_l, r.conv_r) for r in none} == set()


def test_df_cap_drops_hot_turns_with_audit(spark, convs):
    # cap=2: the turn shared by A, B, C (turns[0] and turns[2] have df=3)
    # is dropped; A-B still share "bravo two" (df=2) so survive at low
    # threshold; A-C and B-C lose all common turns.
    pairs, audit = conversation_dup_pairs(
        convs, threshold=0.1, df_cap=2, with_audit=True
    )
    got = {(r.conv_l, r.conv_r) for r in pairs.collect()}
    assert got == {("A", "B")}
    assert isinstance(audit, ConvDedupAudit)
    assert audit.n_capped_hashes == 2
    assert audit.n_convs == 4


def test_clusters_and_singletons(spark, convs):
    cl = conversation_dup_clusters(
        convs, threshold=0.4, small_graph_rows=0
    ).collect()
    by_conv = {r.conv: r.cluster_id for r in cl}
    assert len(by_conv) == 4
    assert by_conv["A"] == by_conv["B"] == by_conv["C"]
    assert by_conv["D"] != by_conv["A"]


def test_validation_errors(spark, convs):
    with pytest.raises(ValueError, match="measure"):
        conversation_dup_pairs(convs, measure="dice")
    with pytest.raises(ValueError, match="threshold"):
        conversation_dup_pairs(convs, threshold=0.0)
