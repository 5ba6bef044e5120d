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


# 40 distinct tokens; a single-token edit leaves Jaccard at 31/41 ~ 0.756,
# where a 32x4-band LSH miss has probability (1 - 0.756^4)^32 ~ 3e-6 —
# deterministic-seed safe.
_BASE = " ".join(f"tok{i}" for i in range(40))
_NEAR = _BASE.replace("tok11 ", "edited11 ")  # 1-token edit, high Jaccard
FUZZY_CORPUS = [
    ("exact", _BASE),
    ("near", _NEAR),
    ("clean", "totally disjoint content about completely other things entirely "
              "nothing matches the benchmark set at all in any way"),
    ("short", "tiny doc"),
]
FUZZY_REF = [("r1", _BASE), ("r2", "unrelated benchmark question text")]


def _jaccard(a: set, b: set) -> float:
    return len(a & b) / max(len(a | b), 1)


def test_minhash_decontam_matches_bruteforce(spark):
    df = spark.createDataFrame(FUZZY_CORPUS, ["doc_id", "text"])
    ref = spark.createDataFrame(FUZZY_REF, ["rid", "text"])
    out, audit = decontam.minhash_decontam(
        df, ref, "doc_id", "text", w=5, threshold=0.5
    )
    got = {r.id: r for r in out.collect()}
    assert set(got) == {d for d, _ in FUZZY_CORPUS}  # zero-hit docs survive
    ref_sets = [_py_ngrams(t, 5) for _, t in FUZZY_REF]
    for doc_id, text in FUZZY_CORPUS:
        g = _py_ngrams(text, 5)
        sims = [_jaccard(g, r) for r in ref_sets]
        hits = [s for s in sims if s >= 0.5]
        r = got[doc_id]
        assert r.n_matched_refs == len(hits), doc_id
        assert abs(r.max_ref_jaccard - (max(hits) if hits else 0.0)) < 1e-6
        assert r.is_contaminated == bool(hits)
    assert got["exact"].max_ref_jaccard == 1.0
    assert got["near"].is_contaminated  # the paraphrased leak is caught
    assert not got["clean"].is_contaminated
    assert audit.count() == 0  # no oversized benchmark buckets here


def test_minhash_decontam_skew_audit(spark):
    """A degenerate benchmark (many identical rows) trips the bucket cap:
    candidates from those buckets are excluded AND reported."""
    df = spark.createDataFrame([("d", _BASE)], ["doc_id", "text"])
    ref = spark.createDataFrame([(str(i), _BASE) for i in range(8)],
                                ["rid", "text"])
    out, audit = decontam.minhash_decontam(
        df, ref, "doc_id", "text", w=5, threshold=0.5, max_ref_bucket=4
    )
    assert audit.count() > 0
    r = out.collect()[0]
    assert r.n_matched_refs == 0 and not r.is_contaminated


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
