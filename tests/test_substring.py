"""Winnowing substring-dedup tests: rolling hash, winnow guarantee, exact
LCS verification, end-to-end recall on the fixture corpus."""

import numpy as np
import pytest
from difflib import SequenceMatcher

from pyspark.sql import functions as F

from rust_gd_spark.operators import substring as ss


def _py_rolling(data: bytes, k: int):
    B = 1_000_003
    out = []
    for i in range(max(1, len(data) - k + 1)):
        h = 0
        for c in data[i : i + k]:
            h = (h * B + c) % (1 << 64)
        out.append(h)
    return out


def test_rolling_hash_matches_python():
    data = b"abcdefghijklmnop" * 3
    got = ss._rolling_hashes(data, 7).tolist()
    assert got == _py_rolling(data, 7)


def test_rolling_hash_short_input():
    assert len(ss._rolling_hashes(b"ab", 7)) == 1


def test_winnow_guarantee_property():
    """Any common substring of length >= k+w-1 yields a shared fingerprint."""
    rng = np.random.default_rng(3)
    k, w = 16, 25  # guarantee at 40 chars
    span = bytes(rng.integers(97, 123, 60).astype(np.uint8))
    for trial in range(20):
        a = bytes(rng.integers(97, 123, 150).astype(np.uint8)) + span
        b = span + bytes(rng.integers(97, 123, 170).astype(np.uint8))
        fa = set(ss._winnow(ss._rolling_hashes(a, k), w).tolist())
        fb = set(ss._winnow(ss._rolling_hashes(b, k), w).tolist())
        assert fa & fb, trial


def test_lcs_length_matches_difflib():
    rng = np.random.default_rng(7)
    for trial in range(10):
        common = bytes(rng.integers(65, 91, int(rng.integers(30, 80))).astype(np.uint8))
        a = bytes(rng.integers(97, 123, 100).astype(np.uint8)) + common + b"x"
        b = b"y" + common + bytes(rng.integers(97, 123, 80).astype(np.uint8))
        exp = SequenceMatcher(None, a, b, autojunk=False).find_longest_match(
            0, len(a), 0, len(b)
        ).size
        got = ss._lcs_length_ge(a, b, 20)
        assert got == (exp if exp >= 20 else 0), (got, exp)


def test_lcs_below_threshold_is_zero():
    assert ss._lcs_length_ge(b"abcdef" * 10, b"zzzzzz" * 10, 10) == 0


@pytest.fixture(scope="module")
def turns_df(transcripts_df):
    return transcripts_df.withColumn(
        "uid", F.concat_ws(":", "conv_id", F.col("turn_idx").cast("string"))
    )


def test_end_to_end_recall_and_exactness(spark, turns_df, small_corpus):
    got_rows = ss.substring_near_dup_pairs(turns_df, min_len=200).collect()
    got = {tuple(sorted((r.id_l, r.id_r))): r.common_len for r in got_rows}

    tr = small_corpus.transcripts
    texts = dict(zip(tr.conv_id + ":" + tr.turn_idx.astype(str), tr.text))
    gt = small_corpus.expected_pairs
    sb = gt[gt.kind == "substring"]
    valid = {
        tuple(sorted(p))
        for p in zip(sb.uid_l, sb.uid_r)
        if min(len(texts[p[0]]), len(texts[p[1]])) >= 200
    }
    assert valid, "fixture must contain long-substring pairs"
    recall = len(valid & set(got)) / len(valid)
    assert recall >= 0.99, recall

    # reported lengths are exact: cross-check a sample against difflib
    for (a, b), L in list(got.items())[:10]:
        exp = SequenceMatcher(
            None, texts[a].encode(), texts[b].encode(), autojunk=False
        ).find_longest_match(0, len(texts[a].encode()), 0, len(texts[b].encode())).size
        assert L == exp, ((a, b), L, exp)
