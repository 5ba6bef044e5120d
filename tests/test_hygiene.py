"""pii_incidence_report (per-source PII family incidence) and
ingest_hygiene_report (schema-integrity counts): hand-checked counts and
DuckDB twin parity."""

from __future__ import annotations

import duckdb
import pandas as pd


def _pii_rows():
    return [
        (1, "reach me at bob@example.com or alice@example.org", "A"),
        (2, "ssn is 123-45-6789 thanks", "A"),
        (3, "nothing sensitive here", "A"),
        (4, "server at 10.0.0.1 and 192.168.1.10", "B"),
    ]


def test_pii_incidence_report(spark):
    from rust_gd_spark.operators.hygiene import pii_incidence_report

    df = spark.createDataFrame(_pii_rows(), "doc_id long, text string, source string")
    out = {
        (r.source, r.family): (r.n_docs, r.n_docs_with, r.total_spans)
        for r in pii_incidence_report(df).collect()
    }
    assert out[("A", "email")] == (3, 1, 2)
    assert out[("A", "ssn")] == (3, 1, 1)
    # an SSN is also a phone-shaped digit run — raw-text counts overlap
    # by design (the documented pii.py convention)
    assert out[("A", "phone")] == (3, 1, 1)
    assert out[("B", "ipv4")] == (1, 1, 2)
    assert out[("B", "email")] == (1, 0, 0)
    assert len(out) == 8  # 2 sources x 4 families, zero rows included


def test_pii_incidence_twin_parity(spark):
    from rust_gd_spark.operators.hygiene import (
        pii_incidence_report,
        pii_incidence_report_sql,
    )

    df = spark.createDataFrame(_pii_rows(), "doc_id long, text string, source string")
    spark_rows = sorted(tuple(r) for r in pii_incidence_report(df).collect())
    pdf = pd.DataFrame(_pii_rows(), columns=["doc_id", "text", "source"])
    con = duckdb.connect()
    con.register("pii_tbl", pdf)
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(pii_incidence_report_sql("pii_tbl")).fetchall()
    )
    assert spark_rows == duck_rows


def _hygiene_rows():
    return [
        (1, "hello world", "A", 11),   # clean
        (2, None, "A", 0),             # null text (n_chars 0 vs len 0: ok)
        (3, "   ", "A", 3),            # blank, consistent n_chars
        (4, "drifted", "A", 99),       # n_chars mismatch
        (5, "dup id", "B", 6),
        (5, "dup id", "B", 6),         # duplicated primary id
    ]


def test_ingest_hygiene_report(spark):
    from rust_gd_spark.operators.hygiene import ingest_hygiene_report

    df = spark.createDataFrame(
        _hygiene_rows(), "doc_id long, text string, source string, n_chars long"
    )
    out = {
        r.source: (
            r.n_docs, r.n_null_text, r.n_blank_text,
            r.n_chars_mismatch, r.n_dup_ids,
        )
        for r in ingest_hygiene_report(df).collect()
    }
    assert out["A"] == (4, 1, 1, 1, 0)
    assert out["B"] == (2, 0, 0, 0, 1)


def test_ingest_hygiene_twin_parity(spark):
    from rust_gd_spark.operators.hygiene import (
        ingest_hygiene_report,
        ingest_hygiene_report_sql,
    )

    df = spark.createDataFrame(
        _hygiene_rows(), "doc_id long, text string, source string, n_chars long"
    )
    spark_rows = sorted(tuple(r) for r in ingest_hygiene_report(df).collect())
    pdf = pd.DataFrame(
        _hygiene_rows(), columns=["doc_id", "text", "source", "n_chars"]
    )
    con = duckdb.connect()
    con.register("hyg_tbl", pdf)
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(ingest_hygiene_report_sql("hyg_tbl")).fetchall()
    )
    assert spark_rows == duck_rows
