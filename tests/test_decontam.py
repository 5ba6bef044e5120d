"""Decontamination (reference-set n-gram containment) operator tests."""

import re

import pytest
from pyspark.sql import functions as F

from rust_gd_spark.operators import decontam


def _py_ngrams(text: str, n: int) -> set:
    toks = re.sub(r"[^a-z0-9]+", " ", (text or "").lower()).strip().split()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


CORPUS = [
    ("train1", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ("train2", "alpha beta gamma delta epsilon completely different tail here now"),
    ("train3", "nothing shared with the reference benchmark at all in this row"),
    ("short", "tiny doc"),
]
REF = [
    ("t1", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ("t2", "some other benchmark question text goes here friends"),
]
N = 5


def test_containment_matches_bruteforce(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    ref = spark.createDataFrame(REF, ["rid", "text"])
    got = {
        r.id: r
        for r in decontam.ngram_containment(
            df, ref, "doc_id", "text", n=N, threshold=0.5
        ).collect()
    }
    ref_grams = set().union(*(_py_ngrams(t, N) for _, t in REF))
    for doc_id, text in CORPUS:
        grams = _py_ngrams(text, N)
        exp_hits = len(grams & ref_grams)
        r = got[doc_id]
        assert r.n_grams == len(grams), doc_id
        assert r.n_contaminated == exp_hits, doc_id
        assert abs(r.contamination_frac - exp_hits / len(grams)) < 1e-6
        assert r.is_contaminated == (exp_hits / len(grams) >= 0.5)
    # the planted exact copy is fully contaminated; the disjoint row clean
    assert got["train1"].contamination_frac == 1.0
    assert got["train3"].n_contaminated == 0


def test_short_rows_decontaminate_exact_copies(spark):
    """Rows shorter than n tokens hash whole-text (shingle_df short-row
    rule) — an exact short copy of a reference row must be flagged."""
    df = spark.createDataFrame(
        [("a", "tiny benchmark row"), ("b", "unrelated small row")],
        ["doc_id", "text"],
    )
    ref = spark.createDataFrame([("t", "tiny benchmark row")], ["rid", "text"])
    got = {
        r.id: r
        for r in decontam.ngram_containment(df, ref, n=13).collect()
    }
    assert got["a"].is_contaminated and got["a"].contamination_frac == 1.0
    assert not got["b"].is_contaminated


def test_reference_join_is_broadcast(spark):
    """The scale claim is enforced, not hoped: with broadcast_ref=True the
    plan must contain a BroadcastHashJoin and no SortMergeJoin for the
    containment join."""
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    ref = spark.createDataFrame(REF, ["rid", "text"])
    out = decontam.ngram_containment(df, ref, n=N, broadcast_ref=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_forced_shuffle_path_same_result(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    ref = spark.createDataFrame(REF, ["rid", "text"])
    a = sorted(
        map(tuple, decontam.ngram_containment(df, ref, n=N, broadcast_ref=True).collect())
    )
    b = sorted(
        map(tuple, decontam.ngram_containment(df, ref, n=N, broadcast_ref=False).collect())
    )
    assert a == b
