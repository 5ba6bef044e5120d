"""Turn-level transcript dedup: retry collapse, loop stats, and
cross-conversation prefix-duplicate detection — hand-checked expectations
plus a plan pin (the prefix join must stay an equi-join)."""

from __future__ import annotations

import pytest

from rust_gd_spark.operators.turns import (
    collapse_retry_turns,
    prefix_dup_conversations,
    turn_loop_stats,
)


def _tr(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


@pytest.fixture(scope="module")
def retry_convs(spark):
    # A: clean 3 turns. B: turn 1 retried once (run of 2). C: one turn
    # re-emitted 4x (a loop) then a different turn. D: same text, role
    # flips — NOT a retry. E: single turn.
    rows = [
        ("A", 0, "user", "hi"),
        ("A", 1, "assistant", "hello"),
        ("A", 2, "user", "bye"),
        ("B", 0, "user", "q"),
        ("B", 1, "assistant", "ans"),
        ("B", 2, "assistant", "ans"),
        ("B", 3, "user", "ok"),
        ("C", 0, "tool", "run"),
        ("C", 1, "tool", "run"),
        ("C", 2, "tool", "run"),
        ("C", 3, "tool", "run"),
        ("C", 4, "assistant", "done"),
        ("D", 0, "user", "same"),
        ("D", 1, "assistant", "same"),
        ("E", 0, "user", "solo"),
    ]
    return _tr(spark, rows)


def test_collapse_retry_turns(spark, retry_convs):
    out = collapse_retry_turns(retry_convs)
    got = {
        (r.conv_id, r.turn_idx, r.new_turn_idx, r.role, r.text)
        for r in out.collect()
    }
    assert got == {
        ("A", 0, 0, "user", "hi"),
        ("A", 1, 1, "assistant", "hello"),
        ("A", 2, 2, "user", "bye"),
        ("B", 0, 0, "user", "q"),
        ("B", 1, 1, "assistant", "ans"),
        ("B", 3, 2, "user", "ok"),
        ("C", 0, 0, "tool", "run"),
        ("C", 4, 1, "assistant", "done"),
        ("D", 0, 0, "user", "same"),
        ("D", 1, 1, "assistant", "same"),
        ("E", 0, 0, "user", "solo"),
    }


def test_collapse_role_insensitive_when_role_none(spark, retry_convs):
    # With role_col=None, D's role-flip repeat IS a retry.
    out = collapse_retry_turns(retry_convs, role_col=None)
    d = [r for r in out.collect() if r.conv_id == "D"]
    assert len(d) == 1 and d[0].turn_idx == 0


def test_turn_loop_stats(spark, retry_convs):
    got = {
        r.conv_id: (
            r.n_turns,
            r.max_run,
            r.n_loop_runs,
            r.n_loop_turns,
            r.loop_turn_frac,
            r.is_looping,
        )
        for r in turn_loop_stats(retry_convs, min_run=2).collect()
    }
    assert got == {
        "A": (3, 1, 0, 0, 0.0, False),
        "B": (4, 2, 1, 2, 0.5, True),
        "C": (5, 4, 1, 4, 0.8, True),
        "D": (2, 1, 0, 0, 0.0, False),
        "E": (1, 1, 0, 0, 0.0, False),
    }


def test_turn_loop_stats_min_run(spark, retry_convs):
    got = {
        r.conv_id: (r.n_loop_runs, r.is_looping)
        for r in turn_loop_stats(retry_convs, min_run=3).collect()
    }
    assert got["B"] == (0, False)  # run of 2 no longer a loop
    assert got["C"] == (1, True)
    with pytest.raises(ValueError):
        turn_loop_stats(retry_convs, min_run=1)


@pytest.fixture(scope="module")
def prefix_convs(spark):
    # X: 4 turns. Xcopy: identical (equal-sequence dup — tie rule emits
    # Xcopy->X only). P: X's first 2 turns (strict prefix of X AND
    # Xcopy). Q: X's turns 0,2 — NOT a prefix (gap). R: same first turn
    # as X but different role — NOT a prefix. S: unrelated.
    x = [("u", "a"), ("a", "b"), ("u", "c"), ("a", "d")]
    rows = []
    for i, (ro, tx) in enumerate(x):
        rows.append(("X", i, ro, tx))
        rows.append(("Xcopy", i, ro, tx))
    rows += [("P", 0, "u", "a"), ("P", 1, "a", "b")]
    rows += [("Q", 0, "u", "a"), ("Q", 1, "u", "c")]
    rows += [("R", 0, "a", "a")]
    rows += [("S", 0, "u", "zzz")]
    return _tr(spark, rows)


def test_prefix_dup_conversations(spark, prefix_convs):
    out = prefix_dup_conversations(prefix_convs)
    got = {
        (r.dup_conv, r.host_conv): (r.shared_turns, r.host_turns, r.full_equal)
        for r in out.collect()
    }
    assert got == {
        ("P", "X"): (2, 4, False),
        ("P", "Xcopy"): (2, 4, False),
        ("Xcopy", "X"): (4, 4, True),
    }


def test_prefix_join_is_equi(spark, prefix_convs):
    plan = prefix_dup_conversations(prefix_convs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_prefix_order_by_turn_idx_not_insertion(spark):
    # Rows arrive out of order; the prefix is defined by turn_idx order.
    df = _tr(
        spark,
        [
            ("long", 1, "a", "two"),
            ("long", 0, "u", "one"),
            ("long", 2, "u", "three"),
            ("short", 1, "a", "two"),
            ("short", 0, "u", "one"),
        ],
    )
    out = prefix_dup_conversations(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.dup_conv, r.host_conv, r.shared_turns) == ("short", "long", 2)
