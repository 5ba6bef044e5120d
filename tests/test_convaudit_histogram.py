"""role_alternation_audit (conversation well-formedness) and
length_histogram (log2 token-length distribution): hand-checked counts
and DuckDB twin parity."""

from __future__ import annotations

import duckdb
import pandas as pd


def _turn_rows():
    return [
        # conv A: user,user,assistant,assistant,assistant -> 3 violations
        ("A", 0, "user"),
        ("A", 1, "user"),
        ("A", 2, "assistant"),
        ("A", 3, "assistant"),
        ("A", 4, "assistant"),
        # conv B: clean alternation -> 0
        ("B", 0, "user"),
        ("B", 1, "assistant"),
    ]


def test_role_alternation_audit(spark):
    from rust_gd_spark.operators.convaudit import role_alternation_audit

    df = spark.createDataFrame(
        _turn_rows(), "conv_id string, turn_idx int, role string"
    )
    r = role_alternation_audit(df).collect()[0]
    assert (r.n_convs, r.n_turns, r.n_adjacent_same_role, r.n_convs_affected) == (
        2, 7, 3, 1,
    )
    assert r.turn_violation_frac == 0.428571
    assert r.conv_violation_frac == 0.5


def test_role_alternation_twin_parity(spark):
    from rust_gd_spark.operators.convaudit import (
        role_alternation_audit,
        role_alternation_audit_sql,
    )

    df = spark.createDataFrame(
        _turn_rows(), "conv_id string, turn_idx int, role string"
    )
    spark_rows = sorted(tuple(r) for r in role_alternation_audit(df).collect())
    pdf = pd.DataFrame(_turn_rows(), columns=["conv_id", "turn_idx", "role"])
    con = duckdb.connect()
    con.register("turns_tbl", pdf)
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(role_alternation_audit_sql("turns_tbl")).fetchall()
    )
    assert spark_rows == duck_rows


def _doc_rows():
    return [
        (1, ""),                      # 0 tokens -> bucket 0 (merged edge)
        (2, "a"),                     # 1 token  -> bucket 0
        (3, "a b"),                   # 2 tokens -> bucket 1
        (4, "a b c"),                 # 3 tokens -> bucket 1
        (5, "a b c d e f g h"),       # 8 tokens -> bucket 3
    ]


def test_length_histogram(spark):
    from rust_gd_spark.operators.histogram import length_histogram

    df = spark.createDataFrame(_doc_rows(), "doc_id long, text string")
    out = {
        r.bucket: (r.lo_tokens, r.n_docs, r.total_tokens, r.frac_docs)
        for r in length_histogram(df, "text").collect()
    }
    assert out[0] == (1, 2, 1, 0.4)
    assert out[1] == (2, 2, 5, 0.4)
    assert out[3] == (8, 1, 8, 0.2)
    assert 2 not in out


def test_length_histogram_twin_parity(spark):
    from rust_gd_spark.operators.histogram import (
        length_histogram,
        length_histogram_sql,
    )

    df = spark.createDataFrame(_doc_rows(), "doc_id long, text string")
    spark_rows = sorted(tuple(r) for r in length_histogram(df, "text").collect())
    pdf = pd.DataFrame(_doc_rows(), columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("docs_tbl", pdf)
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(length_histogram_sql("docs_tbl", "text")).fetchall()
    )
    assert spark_rows == duck_rows
