"""Suffix-array operator tests: SA/LCP kernels vs brute force, the
repetition profile invariants, and the per-conversation Spark operator."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rust_gd_spark.operators import suffixarray as sx


def _brute_sa(data: bytes):
    n = len(data)
    return sorted(range(n), key=lambda i: data[i:])


def _brute_lcp_adjacent(data: bytes, sa):
    out = []
    for i, j in zip(sa[:-1], sa[1:]):
        a, b = data[i:], data[j:]
        m = 0
        while m < min(len(a), len(b)) and a[m] == b[m]:
            m += 1
        out.append(m)
    return out


def _brute_profile(data: bytes, k: int):
    from collections import Counter

    grams = Counter(data[i : i + k] for i in range(len(data) - k + 1))
    n_rep = sum(1 for c in grams.values() if c >= 2)
    lrs = 0
    n = len(data)
    for i in range(n):
        for j in range(i + 1, n):
            m = 0
            while j + m < n and data[i + m] == data[j + m]:
                m += 1
            lrs = max(lrs, m)
    return n_rep, lrs


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_suffix_array_matches_brute(seed):
    rng = np.random.default_rng(seed)
    # small alphabet forces deep ties (the doubling path that matters)
    data = bytes(rng.integers(97, 101, 120).astype(np.uint8))
    sa, levels = sx.suffix_array_with_levels(np.frombuffer(data, dtype=np.uint8))
    assert sa.tolist() == _brute_sa(data)
    lcp = sx.adjacent_lcp(sa, levels, len(data))
    assert lcp.tolist() == _brute_lcp_adjacent(data, sa.tolist())


@pytest.mark.parametrize("seed,k", [(5, 4), (6, 8), (7, 3)])
def test_repetition_profile_matches_brute(seed, k):
    rng = np.random.default_rng(seed)
    data = bytes(rng.integers(97, 100, 150).astype(np.uint8))
    assert sx.repetition_profile(data, k) == _brute_profile(data, k)


def test_repetition_profile_edges():
    assert sx.repetition_profile(b"", 4) == (0, 0)
    assert sx.repetition_profile(b"a", 4) == (0, 0)
    assert sx.repetition_profile(b"ab", 4) == (0, 0)
    # "abab": repeated 2-gram "ab", lrs = "ab" (len 2)
    assert sx.repetition_profile(b"abab", 2) == (1, 2)
    # all-equal bytes: k-grams all identical -> one repeated gram; lrs = n-1
    assert sx.repetition_profile(b"aaaaaa", 3) == (1, 5)


def test_conversation_repetition_spark(spark):
    rows = [
        # conv-a: turn texts join to "xyzq\nxyzq" -> repeated span "xyzq"
        ("conv-a", 0, "xyzq"),
        ("conv-a", 1, "xyzq"),
        # conv-b: no repetition at k=3
        ("conv-b", 0, "abcdefg"),
        ("conv-b", 1, "hijklmn"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = {
        r.conv_id: r
        for r in sx.conversation_repetition(df, k=3).collect()
    }
    joined_a = "xyzq\nxyzq"
    exp_rep, exp_lrs = _brute_profile(joined_a.encode(), 3)
    assert out["conv-a"].n_rep_grams == exp_rep
    assert out["conv-a"].lrs_len == exp_lrs
    assert out["conv-a"].conv_bytes == len(joined_a)
    assert not out["conv-a"].truncated
    assert out["conv-b"].n_rep_grams == 0
    assert out["conv-b"].lrs_len == 0


def test_conversation_repetition_turn_order_stable(spark):
    """Profile must reflect turn_idx order, not input row order."""
    shuffled = [("c", 2, "ccc"), ("c", 0, "aaa"), ("c", 1, "bbb")]
    df = spark.createDataFrame(shuffled, "conv_id string, turn_idx int, text string")
    row = sx.conversation_repetition(df, k=3).collect()[0]
    exp = _brute_profile(b"aaa\nbbb\nccc", 3)
    assert (row.n_rep_grams, row.lrs_len) == exp


def test_conversation_repetition_truncation(spark):
    df = spark.createDataFrame(
        [("c", 0, "ab" * 100)], "conv_id string, turn_idx int, text string"
    )
    row = sx.conversation_repetition(df, k=2, max_bytes=50).collect()[0]
    assert row.truncated
    assert row.conv_bytes == 200  # reported length is pre-truncation
    exp = _brute_profile(("ab" * 100).encode()[:50], 2)
    assert (row.n_rep_grams, row.lrs_len) == exp


def test_conversation_repetition_fixture(spark, transcripts_df):
    """On the fixture corpus: boilerplate conversations (repeated Jugemu
    phrase) must show long repeated substrings; the profile is
    deterministic across runs."""
    out = sx.conversation_repetition(transcripts_df, k=32).cache()
    n = out.count()
    assert n == transcripts_df.select("conv_id").distinct().count()
    # boilerplate turns repeat a >60-byte phrase several times
    assert out.filter(F.col("lrs_len") >= 60).count() > 0
    again = sx.conversation_repetition(transcripts_df, k=32)
    assert out.exceptAll(again).count() == 0
