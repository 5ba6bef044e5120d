"""Multi-turn template detection + canned-response detection: hand-checked
expectations on planted fixtures, sliding-window semantics, normalization
merge rules, and DuckDB twin parity."""

from __future__ import annotations

import pytest

from rust_gd_spark.operators.templates import (
    canned_response_dups,
    canned_response_dups_sql,
    turn_template_spans,
    turn_template_spans_sql,
)


def _tr(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


@pytest.fixture(scope="module")
def template_convs(spark):
    # A/B/C open with the same 3 turns (greet/ack/ask); C repeats the
    # opening later (occurrence 4); D shares only 2 of the 3 opening
    # turns (no k=3 match); E is unrelated; F is 2 turns long (< k).
    opening = [("user", "hi"), ("assistant", "hello!"), ("user", "help me")]
    rows = []
    for conv in ("A", "B", "C"):
        for i, (role, text) in enumerate(opening):
            rows.append((conv, i, role, text))
        rows.append((conv, 3, "assistant", f"unique tail {conv}"))
    for i, (role, text) in enumerate(opening):
        rows.append(("C", 10 + i, role, text))
    rows += [
        ("D", 0, "user", "hi"),
        ("D", 1, "assistant", "hello!"),
        ("D", 2, "user", "something else"),
        ("E", 0, "user", "zzz"),
        ("E", 1, "assistant", "yyy"),
        ("E", 2, "user", "xxx"),
        ("F", 0, "user", "hi"),
        ("F", 1, "assistant", "hello!"),
    ]
    return _tr(spark, rows)


def test_template_spans_basic(spark, template_convs):
    out = turn_template_spans(template_convs, k=3, min_convs=2).collect()
    # exactly one template crosses min_convs: the shared opening
    assert len(out) == 1
    t = out[0]
    assert t.n_convs == 3          # A, B, C (D broke turn 2, F too short)
    assert t.n_occurrences == 4    # + C's re-log at turn 10
    assert t.exemplar_conv == "A"
    assert t.first_turn_idx == 0


def test_template_spans_sliding_overlap(spark):
    # a 4-turn shared opening yields TWO k=3 templates (windows 0..2 and
    # 1..3); the window crossing into per-conv unique turns does not group
    rows = []
    opening = [("user", "a"), ("assistant", "b"), ("user", "c"),
               ("assistant", "d")]
    for conv in ("X", "Y"):
        for i, (role, text) in enumerate(opening):
            rows.append((conv, i, role, text))
        rows.append((conv, 4, "user", f"tail {conv}"))
    out = turn_template_spans(_tr(spark, rows), k=3, min_convs=2).collect()
    assert len(out) == 2
    assert {r.first_turn_idx for r in out} == {0, 1}
    assert all(r.n_convs == 2 and r.n_occurrences == 2 for r in out)


def test_template_spans_k1_and_minconvs(spark, template_convs):
    # k=1 degenerates to cross-conversation repeated single turns
    out = turn_template_spans(template_convs, k=1, min_convs=4).collect()
    # "hi" appears in A,B,C(x2),D,F -> 5 convs; "hello!" likewise;
    # "help me" in A,B,C(x2) -> 3 convs, filtered at min_convs=4
    assert {(r.n_convs, r.n_occurrences) for r in out} == {(5, 6)}
    assert len(out) == 2
    with pytest.raises(ValueError):
        turn_template_spans(template_convs, k=0)


def test_template_spans_duckdb_twin(spark, template_convs):
    import duckdb

    con = duckdb.connect()
    con.register("t", template_convs.toPandas())
    sql = turn_template_spans_sql("t", k=3, min_convs=2)
    twin = {
        r[0]: (r[1], r[2], r[3], r[4]) for r in con.execute(sql).fetchall()
    }
    got = {
        r.template_hash: (r.n_convs, r.n_occurrences, r.exemplar_conv,
                          r.first_turn_idx)
        for r in turn_template_spans(template_convs, k=3, min_convs=2).collect()
    }
    assert got == twin


@pytest.fixture(scope="module")
def canned_convs(spark):
    canned = "I'm sorry, I can't help with that."
    rows = [
        # 3 verbatim uses across 2 convs + 1 messy-case/whitespace variant
        ("A", 0, "assistant", canned),
        ("A", 1, "user", "why not?"),
        ("A", 2, "assistant", canned),
        ("B", 0, "assistant", "I'M SORRY,  I can't HELP with that."),
        # user turns with identical text must NOT count (role filter)
        ("B", 1, "user", canned),
        ("C", 0, "user", canned),
        # a different assistant reply used once — below min_count
        ("C", 1, "assistant", "here is your answer"),
    ]
    return _tr(spark, rows)


def test_canned_response_dups(spark, canned_convs):
    out = canned_response_dups(canned_convs, min_count=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_uses == 3          # A turn 0, A turn 2, B's messy variant
    assert r.n_convs == 2         # A and B; C's copies are user-role
    assert r.exemplar_conv == "A"
    assert r.response_len == len("i'm sorry, i can't help with that.")


def test_canned_response_duckdb_twin(spark, canned_convs):
    import duckdb

    con = duckdb.connect()
    con.register("t", canned_convs.toPandas())
    sql = canned_response_dups_sql("t", min_count=2)
    twin = {
        r[0]: (r[1], r[2], r[3], r[4]) for r in con.execute(sql).fetchall()
    }
    got = {
        r.response_key: (r.n_uses, r.n_convs, r.exemplar_conv, r.response_len)
        for r in canned_response_dups(canned_convs, min_count=2).collect()
    }
    assert got == twin


def test_remove_template_turns(spark, template_convs):
    from rust_gd_spark.operators.templates import remove_template_turns

    out = remove_template_turns(template_convs, k=3, min_convs=2)
    got = {
        (r.conv_id, r.turn_idx): r.new_turn_idx for r in out.collect()
    }
    # exemplar A keeps its opening; B and C lose ALL copies of it
    # (C's tail re-log too); D kept (only 2 of 3 turns matched -> no
    # qualifying window); unique tails survive and re-index densely
    assert ("A", 0) in got and ("A", 1) in got and ("A", 2) in got
    assert got[("A", 3)] == 3
    for i in (0, 1, 2, 10, 11, 12):
        assert ("C", i) not in got
    assert got[("B", 3)] == 0          # B's unique tail re-indexed to 0
    assert got[("C", 3)] == 0
    assert got[("D", 0)] == 0 and got[("D", 2)] == 2
    # every F/E turn intact (no qualifying window touches them)
    assert got[("F", 0)] == 0 and got[("E", 2)] == 2
