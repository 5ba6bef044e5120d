"""Multiset (bag) Jaccard: counted-shingle kernel correctness, the
repetition-inflation separation set-Jaccard cannot make, scale-path
(candidate-verify) parity with the exact operator, and the DuckDB twin."""

from __future__ import annotations

from collections import Counter

import pytest

from rust_gd_spark.operators.bagjaccard import (
    bag_jaccard_pairs,
    bag_jaccard_pairs_sql,
    shingle_count_df,
    verify_bag_jaccard,
)
from rust_gd_spark.operators.minhash import _shingle_hash_batch


def _grams(text: str, w: int) -> Counter:
    toks = text.split()
    if len(toks) < w:
        return Counter([" ".join(toks)])
    return Counter(
        " ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)
    )


def test_counted_kernel_matches_string_counts():
    texts = [
        "a b a b a b",          # repeated bigrams
        "x y z",
        "solo",                  # short-row rule: whole text once
        "",                      # empty row: constant hash, count 1
        "q q q q",               # 'q q' appears 3 times
    ]
    w = 2
    out = _shingle_hash_batch(texts, w, counted=True)
    plain = _shingle_hash_batch(texts, w)
    for text, (vals, cnts), setvals in zip(texts, out, plain):
        expect = sorted(_grams(text, w).values())
        assert sorted(cnts.tolist()) == expect, text
        # distinct values agree with the set kernel
        assert sorted(vals.tolist()) == sorted(setvals.tolist())
        assert len(vals) == len(cnts)


def test_bag_jaccard_separates_repetition(spark):
    df = spark.createDataFrame(
        [
            ("a", "one two three four five six"),
            ("b", "one two three four five six one two three four five six"),
            ("c", "one two three four five six"),
            ("d", "totally different words here"),
        ],
        "uid string, text string",
    )
    out = {
        (r.id_l, r.id_r): r.bag_jaccard
        for r in bag_jaccard_pairs(df, "uid", "text", w=2, threshold=0.1).collect()
    }
    # identical docs: bag-J = 1
    assert out[("a", "c")] == 1.0
    # doubled doc vs original: 5 shared bigrams once each + b's junction
    # "six one" + repeats -> sum_min 5, totals 5 and 11 -> 5/11
    assert out[("a", "b")] == pytest.approx(5 / 11, abs=1e-6)
    assert ("a", "d") not in out


def test_verify_path_matches_exact(spark):
    df = spark.createDataFrame(
        [
            ("a", "one two three four five six"),
            ("b", "one two three four five six one two three four five six"),
            ("c", "one two three four five six"),
            ("d", "one two seven eight nine ten"),
        ],
        "uid string, text string",
    )
    exact = {
        (r.id_l, r.id_r): r.bag_jaccard
        for r in bag_jaccard_pairs(df, "uid", "text", w=2, threshold=0.0).collect()
    }
    sh = shingle_count_df(df, "uid", "text", w=2)
    pairs = spark.createDataFrame(
        sorted(exact), "id_l string, id_r string"
    )
    verified = {
        (r.id_l, r.id_r): r.bag_jaccard
        for r in verify_bag_jaccard(pairs, sh, threshold=0.0).collect()
    }
    assert verified == exact


def test_bag_jaccard_duckdb_twin(spark):
    import duckdb

    df = spark.createDataFrame(
        [
            ("1", "alpha beta gamma delta"),
            ("2", "alpha beta gamma delta alpha beta gamma delta"),
            ("3", "alpha beta other words"),
            ("4", "no overlap at all"),
        ],
        "doc_id string, text string",
    )
    toks = "string_split(text, ' ')"
    grams = (
        f"case when len({toks}) >= 2 then "
        f"list_transform(range(0, len({toks}) - 1), "
        f"i -> array_to_string(list_slice({toks}, i + 1, i + 2), ' ')) "
        f"else [coalesce(array_to_string({toks}, ' '), '')] end"
    )
    con = duckdb.connect()
    con.register("t", df.toPandas())
    sql = bag_jaccard_pairs_sql("t", "doc_id", grams, threshold=0.1)
    twin = {(r[0], r[1]): r[2] for r in con.execute(sql).fetchall()}
    got = {
        (r.id_l, r.id_r): r.bag_jaccard
        for r in bag_jaccard_pairs(df, "doc_id", "text", w=2, threshold=0.1).collect()
    }
    assert got == twin and len(got) >= 2


def test_attribution_labels_and_counts(spark):
    from rust_gd_spark.operators.decontam import ngram_contamination_attribution

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "pack my box with five dozen jugs"),
            (3, "jackdaws love my big sphinx of quartz"),
        ],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [
            ("bench_a", "the quick brown fox jumps"),
            ("bench_b", "pack my box with five dozen jugs"),
            ("bench_b", "love my big sphinx"),
        ],
        "benchmark string, text string",
    )
    out = {
        (r.id, r.benchmark): (r.n_grams, r.n_hits, r.is_contaminated)
        for r in ngram_contamination_attribution(
            docs, ref, "doc_id", "text", bench_col="benchmark",
            n=3, threshold=0.5,
        ).collect()
    }
    # doc 1: 3 trigrams, all in bench_a only (label must not swap —
    # regression pin for the nondeterministic-row-id join bug)
    assert out[(1, "bench_a")] == (3, 3, True)
    assert (1, "bench_b") not in out
    # doc 2: 5 trigrams all in bench_b
    assert out[(2, "bench_b")] == (5, 5, True)
    # doc 3: 5 trigrams, 2 shared with bench_b's "love my big sphinx"
    assert out[(3, "bench_b")] == (5, 2, False)
    assert (3, "bench_a") not in out
