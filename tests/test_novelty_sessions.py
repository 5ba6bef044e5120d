"""ngram_novelty (inverse contamination) and split_sessions (inactivity-gap
re-keying): hand-checked expectations including the strict gap boundary."""

from __future__ import annotations

from datetime import datetime, timedelta


def test_ngram_novelty(spark):
    from rust_gd_spark.operators.decontam import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd"),        # shares "aa bb"/"bb cc" path w/ doc 2
            (2, "aa bb cc zz"),
            (3, "qq ww ee rr"),        # fully novel
        ],
        "doc_id long, text string",
    )
    out = {
        r.id: (r.n_grams, r.n_novel, r.novelty_frac)
        for r in ngram_novelty(docs, "doc_id", "text", n=2).collect()
    }
    # doc1 bigrams: aa bb / bb cc / cc dd — first two shared with doc2
    assert out[1] == (3, 1, 0.333333)
    assert out[2] == (3, 1, 0.333333)
    assert out[3] == (3, 3, 1.0)


def test_split_sessions_gap_semantics(spark):
    from rust_gd_spark.operators.turns import split_sessions

    t0 = datetime(2026, 1, 1)
    rows = [
        # conv A: turns at +0s, +60s, then a 1800s gap (NOT > gap -> same
        # session), then a 1801s gap (new session), then +10s
        ("A", 0, "user", "a", t0),
        ("A", 1, "assistant", "b", t0 + timedelta(seconds=60)),
        ("A", 2, "user", "c", t0 + timedelta(seconds=60 + 1800)),
        ("A", 3, "assistant", "d", t0 + timedelta(seconds=60 + 1800 + 1801)),
        ("A", 4, "user", "e", t0 + timedelta(seconds=60 + 1800 + 1811)),
        # conv B: single turn
        ("B", 0, "user", "solo", t0),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    )
    out = {
        (r.conv_id, r.turn_idx): (r.session_id, r.session_turn)
        for r in split_sessions(df, gap_sec=1800).collect()
    }
    assert out[("A", 0)] == ("A#0", 0)
    assert out[("A", 1)] == ("A#0", 1)
    assert out[("A", 2)] == ("A#0", 2)   # exactly gap_sec stays in-session
    assert out[("A", 3)] == ("A#1", 0)   # strictly greater -> new session
    assert out[("A", 4)] == ("A#1", 1)
    assert out[("B", 0)] == ("B#0", 0)


def test_split_sessions_single_exchange_plan(spark):
    from rust_gd_spark.operators.turns import split_sessions

    df = spark.createDataFrame(
        [("A", i, "user", "x", datetime(2026, 1, 1, 0, i)) for i in range(4)],
        "conv_id string, turn_idx int, role string, text string, ts timestamp",
    )
    plan = (
        split_sessions(df)._jdf.queryExecution().executedPlan().toString()
    )
    # both windows share the conv partitioning: one exchange total
    assert plan.count("Exchange") == 1


def test_dedup_rate_by_source(spark):
    from rust_gd_spark.operators.exactdup import dedup_rate_by_source

    docs = spark.createDataFrame(
        [
            (1, "x", "s1"), (2, "x", "s1"), (3, "x", "s1"), (4, "y", "s1"),
            (5, "a", "s2"), (6, "b", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r.source: (r.n_docs, r.n_distinct, r.n_dup_docs, r.dup_ratio)
        for r in dedup_rate_by_source(docs).collect()
    }
    assert out["s1"] == (4, 2, 2, 0.5)
    assert out["s2"] == (2, 2, 0, 0.0)


def test_jaccard_topk_neighbors(spark):
    from rust_gd_spark.operators.minhash import jaccard_topk_neighbors

    docs = spark.createDataFrame(
        [
            ("a", "one two three four five"),
            ("b", "one two three four five"),      # J(a,b)=1
            ("c", "one two three four nine"),      # closer to a/b than d
            ("d", "totally different words here"),
        ],
        "uid string, text string",
    )
    out = {
        (r.id, r.rank): (r.neighbor_id, r.jaccard)
        for r in jaccard_topk_neighbors(
            docs, "uid", "text", w=2, k=2, threshold=0.05
        ).collect()
    }
    # a's nearest is b (J=1), then c; symmetric rows exist for b and c
    assert out[("a", 1)] == ("b", 1.0)
    assert out[("a", 2)][0] == "c"
    assert out[("b", 1)] == ("a", 1.0)
    assert out[("c", 1)][0] == "a"   # tie J(c,a)=J(c,b) -> min id first
    assert out[("c", 2)][0] == "b"
    assert ("d", 1) not in out       # below threshold everywhere


def test_quality_threshold_plan_exact_selection(spark):
    from rust_gd_spark.operators.sampling import quality_threshold_plan

    # 10 docs whose scores are distinct: target 0.3 must keep exactly
    # the top 3 (keep_frac 0.3), threshold = 3rd-best score
    texts = [("w " * (5 * (i + 1))).strip() for i in range(10)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    r = quality_threshold_plan(docs, "text", target_keep_frac=0.3).collect()
    assert len(r) == 1
    row = r[0]
    assert row.n_docs == 10 and row.n_kept >= 3
    assert row.keep_frac >= 0.3
    # threshold keeps exactly n_kept docs: count scores >= threshold
    from rust_gd_spark.functions import textstats as ts
    from pyspark.sql import functions as F

    scored = docs.select(F.round(ts.quality_score(F.col("text")), 6).alias("q"))
    n_ge = scored.filter(F.col("q") >= row.threshold).count()
    assert n_ge == row.n_kept
    # the next-higher distinct score undershoots the target
    higher = sorted(
        {x.q for x in scored.collect() if x.q > row.threshold}, reverse=True
    )
    if higher:
        n_above = scored.filter(F.col("q") >= higher[-1]).count()
        assert n_above < 3
