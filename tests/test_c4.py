"""C4 heuristic line filtering: rule semantics + Spark-vs-DuckDB
bit-parity of the shipped SQL twin (the driver-oracle contract)."""

import duckdb
import pandas as pd

from rust_gd_spark.functions import c4

C4_DOCS = [
    (0, "This line has more than five words total.\nshort line.\n"
        "no terminal punctuation here at all\n"
        'He said "this one ends in a quote."\n'
        "Another perfectly fine sentence ends right here!"),
    (1, "Только одна строка but it ends with a question mark, yes?"),
    (2, "function f() { return 1; }\n"
        "A real sentence that would otherwise be kept here."),
    (3, "We use Lorem Ipsum placeholder text in this page sometimes."),
    (4, "Please enable JavaScript to view this site properly."),
    (5, "   \n\n"),
    (6, None),
    (7, "one two three four five.\none two three four.\n"
        "one two three four five six?"),
]


def _run(spark, **kw):
    df = spark.createDataFrame(C4_DOCS, "doc_id long, text string")
    return {
        r.id: r
        for r in c4.c4_line_filter(df, "doc_id", "text", **kw).collect()
    }


def test_line_rules(spark):
    out = _run(spark)
    # doc 0: kept = long sentence, quote-terminated line, exclamation line
    assert out[0].n_lines == 5 and out[0].n_kept == 3
    assert out[0].cleaned_text.split("\n") == [
        "This line has more than five words total.",
        'He said "this one ends in a quote."',
        "Another perfectly fine sentence ends right here!",
    ]
    # "short line." fails the 5-word minimum; unpunctuated line fails too
    assert "short line." not in out[0].cleaned_text
    # doc 7: 5-word period line and 6-word question line kept, 4-word dropped
    assert out[7].n_kept == 2


def test_bad_markers_and_keep(spark):
    out = _run(spark, min_kept_lines=1)
    assert out[2].has_bad_marker  # curly brace
    assert out[3].has_bad_marker  # lorem ipsum, case-insensitive
    assert out[4].has_bad_marker  # javascript
    assert not out[0].has_bad_marker
    assert out[0].keep_doc and out[1].keep_doc
    # marker vetoes even when lines survive
    assert out[2].n_kept == 1 and not out[2].keep_doc
    # blank-only and null docs: nothing kept, no marker
    for i in (5, 6):
        assert out[i].n_lines == 0 and out[i].n_kept == 0
        assert not out[i].has_bad_marker and not out[i].keep_doc
        assert out[i].cleaned_text == ""


def test_min_kept_lines_threshold(spark):
    out = _run(spark, min_kept_lines=3)
    assert out[0].keep_doc  # 3 kept lines
    assert not out[1].keep_doc  # only 1


def test_duckdb_parity(spark):
    df = spark.createDataFrame(C4_DOCS, "doc_id long, text string")
    got = (
        c4.c4_line_filter(df, "doc_id", "text")
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(C4_DOCS, columns=["doc_id", "text"]))
    want = (
        con.sql(c4.c4_line_filter_sql("docs", "doc_id", "text"))
        .df()
        .sort_values("id")
        .reset_index(drop=True)
    )
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)].astype(
        {c: got[c].dtype for c in got.columns}
    )
    pd.testing.assert_frame_equal(got, want, check_like=True)
