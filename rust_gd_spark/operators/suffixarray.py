"""Per-conversation suffix-array analysis of verbatim repetition.

SURVEY.md §7 S3 promised a suffix-array pass for long verbatim substring
dedup (`applyInPandas` per conversation, pure-numpy doubling). The
CROSS-document substring path shipped as winnowing (operators/substring.py —
a recorded substitution that scales better), but the WITHIN-conversation
repetition statistics the suffix array gives exactly — longest repeated
substring, number of distinct repeated spans — have no winnowing equivalent.
This module lands that operator.

Reference analogue: the GD dictionary's job is to exploit repeated chunks
inside one ordered stream (`src/dict.rs:38-63` probe/insert over the chunk
sequence); the suffix array measures the repetition that dictionary would
harvest, at byte (not chunk-grid) granularity.

Algorithm, all vectorized numpy (no per-byte Python):

* suffix array by prefix doubling — O(n log² n): each round sorts
  (rank[i], rank[i+k]) pairs with ``np.lexsort`` and re-ranks with a
  cumsum over change flags.
* adjacent-suffix LCP from the saved rank levels — O(n log n): walk the
  doubling levels high→low, advancing every adjacent SA pair whose level-p
  ranks match by 2^p, all pairs at once (masked adds).
* ``n_rep_grams`` = distinct k-byte substrings occurring ≥ 2 times
  = number of maximal runs of consecutive SA entries with adjacent
  LCP ≥ k (suffixes sharing a k-prefix are contiguous in SA order).
* ``lrs_len`` = max adjacent LCP = longest repeated substring length.

Scale: one shuffle (groupBy conv_id); each conversation is one bounded
task — transcripts are human/agent dialogs, so per-group bytes are 10³–10⁶,
never corpus-sized. ``max_bytes`` truncates pathological groups (audited via
the ``truncated`` column) so a single adversarial conversation cannot OOM a
task at 10^12-turn scale. Ranks are int32 (n < 2³¹ enforced by max_bytes),
so peak memory per task is ~8·n·log₂(n) bytes.

All lengths are UTF-8 BYTE counts (same convention as operators/substring.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def suffix_array_with_levels(b: np.ndarray) -> tuple[np.ndarray, list[np.ndarray]]:
    """Suffix array of uint8 array ``b`` by prefix doubling.

    Returns ``(sa, levels)`` where ``levels[p]`` is an int32 rank array such
    that ``levels[p][i] == levels[p][j]`` iff suffixes i and j agree on their
    first 2^p bytes (out-of-range bytes compare as a unique terminator, so
    equal ranks at any level imply both suffixes extend ≥ 2^p bytes or are
    the identical suffix).
    """
    n = len(b)
    if n == 0:
        return np.empty(0, dtype=np.int64), []
    rank = b.astype(np.int32)
    # level 0: prefix length 1 = the byte itself (dense-ranking is not
    # needed for equality semantics, byte values are already comparable)
    levels = [rank]
    sa = np.argsort(rank, kind="stable").astype(np.int64)
    k = 1
    while k < n:
        second = np.full(n, -1, dtype=np.int32)
        second[: n - k] = rank[k:]
        sa = np.lexsort((second, rank))
        r_sa = rank[sa]
        s_sa = second[sa]
        diff = np.empty(n, dtype=bool)
        diff[0] = True
        diff[1:] = (r_sa[1:] != r_sa[:-1]) | (s_sa[1:] != s_sa[:-1])
        new = np.empty(n, dtype=np.int32)
        new[sa] = np.cumsum(diff, dtype=np.int32) - 1
        rank = new
        levels.append(rank)
        if int(rank[sa[-1]]) == n - 1:
            break
        k <<= 1
    return sa, levels


def adjacent_lcp(sa: np.ndarray, levels: list[np.ndarray], n: int) -> np.ndarray:
    """LCP of each adjacent suffix pair in SA order (len = n-1), vectorized
    across all pairs: walk rank levels high→low, advance matching pairs."""
    if n < 2:
        return np.empty(0, dtype=np.int64)
    i = sa[:-1].copy()
    j = sa[1:].copy()
    lcp = np.zeros(n - 1, dtype=np.int64)
    for p in range(len(levels) - 1, -1, -1):
        step = np.int64(1) << p
        lvl = levels[p]
        ok = (i < n) & (j < n)
        idx = np.where(ok)[0]
        if len(idx) == 0:
            continue
        match = lvl[i[idx]] == lvl[j[idx]]
        adv = idx[match]
        lcp[adv] += step
        i[adv] += step
        j[adv] += step
    return lcp


def repetition_profile(data: bytes, k: int) -> tuple[int, int]:
    """``(n_rep_grams, lrs_len)`` of one byte string.

    n_rep_grams = distinct k-byte substrings occurring ≥ 2 times;
    lrs_len = longest repeated substring length (0 if none).
    """
    b = np.frombuffer(data, dtype=np.uint8)
    n = len(b)
    if n < 2:
        return 0, 0
    sa, levels = suffix_array_with_levels(b)
    lcp = adjacent_lcp(sa, levels, n)
    if len(lcp) == 0:
        return 0, 0
    ge = lcp >= k
    # number of maximal runs of consecutive adjacent-LCP ≥ k entries
    starts = ge & ~np.concatenate([[False], ge[:-1]])
    return int(starts.sum()), int(lcp.max())


def conversation_repetition(
    transcripts: DataFrame,
    k: int = 64,
    text_col: str = "text",
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    sep: str = "\n",
    max_bytes: int = 1 << 22,
) -> DataFrame:
    """Per-conversation verbatim-repetition profile via suffix arrays.

    Output: ``(conv_id, conv_bytes, n_rep_grams, lrs_len, truncated)`` —
    conv_bytes = UTF-8 length of the turn-ordered, ``sep``-joined text,
    n_rep_grams = distinct repeated k-byte windows, lrs_len = longest
    repeated substring (bytes). Repeats may cross turn boundaries (the
    profile is over the joined stream, matching the reference's view of a
    conversation as one ordered byte stream, `src/gd_byte_unit.rs:42-65`).

    One shuffle (groupBy conv). Groups whose joined text exceeds
    ``max_bytes`` are truncated and flagged, bounding task memory.
    """
    out_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("conv_bytes", T.LongType()),
            T.StructField("n_rep_grams", T.LongType()),
            T.StructField("lrs_len", T.LongType()),
            T.StructField("truncated", T.BooleanType()),
        ]
    )

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="stable")
        joined = sep.join(t if t is not None else "" for t in pdf[text_col])
        data = joined.encode("utf-8")
        trunc = len(data) > max_bytes
        n_rep, lrs = repetition_profile(data[:max_bytes] if trunc else data, k)
        return pd.DataFrame(
            {
                "conv_id": [pdf[conv_col].iloc[0]],
                "conv_bytes": [len(data)],
                "n_rep_grams": [n_rep],
                "lrs_len": [lrs],
                "truncated": [trunc],
            }
        )

    # Explicit conv-hash width at the core count: the suffix-array kernel
    # is per-row CPU-dense, and AQE's byte-based coalescing sizes the conv
    # shuffle for ~64 MB of *bytes* per task (8 tasks here — a 1.7 s
    # straggler job on 32 idle cores). The explicit repartition satisfies
    # the groupBy clustering (no second exchange, plan-checked) and is
    # scale-free: on a cluster defaultParallelism is the total core count,
    # which is exactly what a compute-bound stage wants.
    n_parts = transcripts.sparkSession.sparkContext.defaultParallelism
    return (
        transcripts.select(conv_col, order_col, text_col)
        .repartition(n_parts, conv_col)
        .groupBy(conv_col)
        .applyInPandas(profile, schema=out_schema)
    )
