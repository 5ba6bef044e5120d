"""Corpus n-gram audit operator tests."""

import re
from collections import Counter

from pyspark.sql import types as T

from rust_gd_spark.operators.ngrams import top_ngrams


def _py_grams(text, w):
    toks = re.sub(r"[^a-z0-9]+", " ", (text or "").lower()).strip().split()
    if len(toks) < w:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)}


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown cat sits under the lazy dog"),
    (3, "the quick brown fox strikes again and again"),
    (4, "completely unrelated words live here peacefully"),
    (5, "tiny"),
    (6, None),
    (7, "the quick brown fox jumps over the lazy dog"),  # dup of 1
]


def _expected(w, k):
    freq = Counter()
    for _, text in CORPUS:
        for g in _py_grams(text, w):
            freq[g] += 1
    ordered = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    return ordered[:k]


def _df(spark):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    return spark.createDataFrame(CORPUS, schema)


def test_top_bigrams_match_bruteforce(spark):
    got = [
        (r.gram, r.doc_freq)
        for r in top_ngrams(_df(spark), "doc_id", "text", w=2, k=10).collect()
    ]
    assert got == _expected(2, 10)
    # the planted 3x bigram is on top
    assert got[0] == ("the quick", 4) or got[0][1] == 4


def test_short_and_null_rows_fall_back_to_whole_text(spark):
    got = dict(
        (r.gram, r.doc_freq)
        for r in top_ngrams(_df(spark), "doc_id", "text", w=2, k=100).collect()
    )
    assert got.get("tiny") == 1  # 1-token row -> whole-text gram
    assert got.get("") == 1  # NULL text -> '' gram, still counted


def test_doc_frequency_is_distinct_per_doc(spark):
    # "again and" appears twice inside doc 3 ("again and again" has
    # grams {"again and", "and again"}) but must count doc_freq=1
    got = dict(
        (r.gram, r.doc_freq)
        for r in top_ngrams(_df(spark), "doc_id", "text", w=1, k=200).collect()
    )
    assert got["again"] == 1
    assert got["the"] == 4  # docs 1, 2, 3, 7
