"""Property-based tests (hypothesis) for the governance-tier operators,
driven through their DuckDB twins against brute-force Python oracles —
no Spark session per example (the Spark↔twin parity is pinned separately
in test_sensitivity_burst / test_gate_audits / test_embhygiene), so
hypothesis can explore corners the planted fixtures never hit."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(0, 30),
            st.integers(31, 60),
            st.floats(0.0, 1.0, allow_nan=False),
        ),
        min_size=0,
        max_size=40,
    ),
    grid=st.lists(
        st.floats(0.01, 0.99, allow_nan=False), min_size=1, max_size=6
    ),
)
def test_threshold_sensitivity_twin_exact(pairs, grid):
    from rust_gd_spark.operators.sensitivity import threshold_sensitivity_sql

    con = duckdb.connect()
    pdf = pd.DataFrame(pairs, columns=["id_l", "id_r", "jaccard"])
    con.register("pp", pdf)
    rows = con.execute(
        threshold_sensitivity_sql(
            "select id_l, id_r, jaccard from pp", grid
        )
    ).fetchall()
    ts = sorted({float(t) for t in grid})
    assert len(rows) == len(ts)
    got = {r[0]: (r[1], r[2]) for r in rows}
    prev_pairs, prev_docs = None, None
    for t in ts:
        surv = [(a, b) for a, b, j in pairs if j >= t]
        docs = {x for ab in surv for x in ab}
        assert got[t] == (len(surv), len(docs))
        if prev_pairs is not None:  # monotone non-increasing in t
            assert got[t][0] <= prev_pairs and got[t][1] <= prev_docs
        prev_pairs, prev_docs = got[t]
        assert got[t][1] <= 2 * got[t][0]


@settings(max_examples=25, deadline=None)
@given(
    vals=st.lists(st.integers(0, 10**6), min_size=1, max_size=60),
)
def test_value_histogram_twin_exact(vals):
    from rust_gd_spark.operators.histogram import value_histogram_sql

    con = duckdb.connect()
    con.register("vv", pd.DataFrame({"v": vals}))
    rows = con.execute(value_histogram_sql("vv", "v")).fetchall()
    expect: dict[int, list[int]] = {}
    for n in vals:
        b = max(n.bit_length() - 1, 0)
        e = expect.setdefault(b, [0, 0])
        e[0] += 1
        e[1] += n
    got = {r[0]: (r[2], r[3]) for r in rows}
    assert got == {b: tuple(e) for b, e in expect.items()}
    assert sum(r[2] for r in rows) == len(vals)
    for r in rows:
        assert r[1] == 1 << r[0]  # lo edge


@settings(max_examples=25, deadline=None)
@given(
    data=st.lists(
        st.tuples(st.sampled_from(["A", "B"]), st.integers(0, 500)),
        min_size=1,
        max_size=50,
    ),
    k=st.integers(1, 4),
)
def test_length_outliers_twin_exact(data, k):
    from rust_gd_spark.operators.lengthgate import source_length_outliers_sql

    con = duckdb.connect()
    pdf = pd.DataFrame(
        [(i, s, v) for i, (s, v) in enumerate(data)],
        columns=["doc_id", "source", "n_chars"],
    )
    con.register("dd", pdf)
    rows = con.execute(
        source_length_outliers_sql("dd", "source", "n_chars", k=k)
    ).fetchall()
    by_src: dict[str, list[int]] = {}
    for s, v in data:
        by_src.setdefault(s, []).append(v)
    assert len(rows) == len(by_src)
    for src, n_docs, q1, q3, lo, hi, n_low, n_high in rows:
        vals = sorted(by_src[src])
        n = len(vals)
        assert n_docs == n
        r1, r3 = math.ceil(n / 4), math.ceil(3 * n / 4)
        assert q1 == vals[r1 - 1] and q3 == vals[r3 - 1]
        assert lo == q1 - k * (q3 - q1) and hi == q3 + k * (q3 - q1)
        assert n_low == sum(1 for v in vals if v < lo)
        assert n_high == sum(1 for v in vals if v > hi)
        assert q1 <= q3


@settings(max_examples=25, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["x", "y", "z", "w"]), st.integers(0, 3)),
        min_size=1,
        max_size=40,
    ),
)
def test_dup_burst_twin_exact(docs):
    from rust_gd_spark.operators.recrawl import dup_burst_windows_sql

    base = pd.Timestamp("2026-01-01")
    pdf = pd.DataFrame(
        [
            (i, text, base + pd.Timedelta(hours=h, minutes=7))
            for i, (text, h) in enumerate(docs)
        ],
        columns=["doc_id", "text", "ts"],
    )
    con = duckdb.connect()
    con.register("bb", pdf)
    rows = con.execute(
        dup_burst_windows_sql("bb", factor_num=3, factor_den=2, min_docs=1)
    ).fetchall()
    from collections import Counter

    key_counts = Counter(t for t, _ in docs)
    buckets: dict[int, list[str]] = {}
    epoch0 = int(base.timestamp())
    for t, h in docs:
        buckets.setdefault(epoch0 + 3600 * h, []).append(t)
    tot = len(docs)
    tot_dup = sum(1 for t, _ in docs if key_counts[t] > 1)
    assert len(rows) == len(buckets)
    for be, n_docs, n_dup, _frac, _gfrac, burst in rows:
        texts = buckets[be]
        assert n_docs == len(texts)
        assert n_dup == sum(1 for t in texts if key_counts[t] > 1)
        # the n_dup > 0 guard: a duplicate-free corpus must never alert
        expect_burst = int(n_dup > 0 and n_dup * tot * 2 >= n_docs * tot_dup * 3)
        assert burst == expect_burst
    assert sum(r[1] for r in rows) == tot


@settings(max_examples=25, deadline=None)
@given(
    toks=st.lists(st.integers(1, 30), min_size=1, max_size=40),
    capacity=st.integers(5, 20),
)
def test_packing_stats_twin_exact(toks, capacity):
    from rust_gd_spark.operators.packing import packing_stats_sql

    # brute-force next-fit plan (single shard, id order)
    plan, seq, fill = [], 0, 0
    first = True
    for i, t in enumerate(toks):
        if not first and fill + t > capacity:
            seq, fill = seq + 1, 0
        plan.append((i, 0, t, seq))
        fill += t
        first = False
    pdf = pd.DataFrame(plan, columns=["id", "shard", "n_tokens", "seq_id"])
    con = duckdb.connect()
    con.register("plan_p", pdf)
    r = con.execute(
        packing_stats_sql("select * from plan_p", capacity)
    ).fetchall()[0]
    fills: dict[int, int] = {}
    for _, _, t, s in plan:
        fills[s] = fills.get(s, 0) + t
    n_seqs = len(fills)
    assert r[0] == len(toks) and r[1] == n_seqs
    assert r[2] == sum(toks) and r[3] == n_seqs * capacity
    assert r[4] == sum(max(capacity - f, 0) for f in fills.values())
    assert r[6] == sum(1 for f in fills.values() if f > capacity)
