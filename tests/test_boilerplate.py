"""Corpus-level boilerplate line removal: semantics + Spark-vs-DuckDB
bit-parity of the shipped oracle template (the driver-oracle contract)."""

import duckdb
import pandas as pd
import pytest

from rust_gd_spark.operators import boilerplate

FOOTER = "Subscribe to our newsletter today!"
BP_DOCS = [
    (0, f"alpha unique\n{FOOTER}\nbravo unique"),
    (1, f"charlie text\n\n{FOOTER}"),
    (2, f"{FOOTER}\n{FOOTER}\ndelta body"),  # within-doc repeat counts once
    (3, "echo only original lines\nno footer here"),
    (4, "  \n\n"),  # blank-only document
    (5, None),  # null text
    (6, f"trailing newline then footer\n{FOOTER}\n"),
]


def _run(spark, min_docs=2):
    df = spark.createDataFrame(BP_DOCS, "doc_id long, text string")
    return {
        r.id: r
        for r in boilerplate.boilerplate_lines(
            df, "doc_id", "text", min_docs=min_docs
        ).collect()
    }


def test_removes_cross_doc_lines_preserving_order(spark):
    out = _run(spark)
    # the footer occurs in docs 0,1,2,6 (>= 2 distinct docs) -> removed
    assert out[0].cleaned_text == "alpha unique\nbravo unique"
    assert out[0].n_lines == 3 and out[0].n_removed == 1
    # blank lines survive in place
    assert out[1].cleaned_text == "charlie text\n"
    # every occurrence removed, including within-doc repeats
    assert out[2].cleaned_text == "delta body"
    assert out[2].n_removed == 2
    # untouched document round-trips byte-exactly
    assert out[3].cleaned_text == BP_DOCS[3][1]
    assert out[3].n_removed == 0 and out[3].removed_char_frac == 0.0
    # blank-only and null documents survive with zero content lines
    assert out[4].n_lines == 0 and out[4].cleaned_text == "  \n\n"
    assert out[5].n_lines == 0 and out[5].cleaned_text == ""
    # trailing newline preserved as an empty final line
    assert out[6].cleaned_text == "trailing newline then footer\n"


def test_char_frac(spark):
    out = _run(spark)
    removed = len(FOOTER)
    content = len("alpha unique") + len(FOOTER) + len("bravo unique")
    assert out[0].removed_char_frac == pytest.approx(
        round(removed / content, 6)
    )


def test_min_docs_threshold(spark):
    # min_docs above the footer's doc-count -> nothing removed anywhere
    out = _run(spark, min_docs=5)
    assert all(r.n_removed == 0 for r in out.values())
    assert out[2].cleaned_text == BP_DOCS[2][1]
    with pytest.raises(ValueError):
        _run(spark, min_docs=0)


def test_duckdb_parity(spark):
    df = spark.createDataFrame(BP_DOCS, "doc_id long, text string")
    got = (
        boilerplate.boilerplate_lines(df, "doc_id", "text", min_docs=2)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(BP_DOCS, columns=["doc_id", "text"]))
    want = (
        con.sql(boilerplate.boilerplate_lines_sql("docs", "doc_id", "text", 2))
        .df()
        .sort_values("id")
        .reset_index(drop=True)
    )
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)].astype(
        {c: got[c].dtype for c in got.columns}
    )
    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_boilerplate_all_lines_removed_twin_parity(spark):
    """Regression (sf0.1 cross-scale sweep): when EVERY line of a
    document is boilerplate, Spark's concat_ws yields '' but DuckDB's
    array_to_string over an empty list yields NULL — the twin must
    coalesce. Two single-line exact-dup docs lose their only line."""
    rows = [(1, "same line"), (2, "same line"), (3, "unique line here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        boilerplate.boilerplate_lines(df, "doc_id", "text", min_docs=2)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert got.loc[got["id"] == 1, "cleaned_text"].iloc[0] == ""
    con = duckdb.connect()
    con.register("docs2", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = (
        con.sql(boilerplate.boilerplate_lines_sql("docs2", "doc_id", "text", 2))
        .df()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert want.loc[want["id"] == 1, "cleaned_text"].iloc[0] == ""
    assert list(got["cleaned_text"]) == list(want["cleaned_text"])
