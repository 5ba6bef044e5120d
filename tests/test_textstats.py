"""Text-analysis function tests: Python oracle on edge cases + DuckDB
dialect parity (the exact check the driver's oracle harness performs)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rust_gd_spark.functions import textstats as ts

EDGE_TEXTS = [
    ("t0", "the quick brown fox, it is fast!"),
    ("t1", ""),
    ("t2", "   "),
    ("t3", "!!! ??? ..."),
    ("t4", "der die das und ist ein eine zu den von"),
    ("t5", "le la les de des et est un une du"),
    ("t6", "xyzzy plugh qwop"),
    ("t7", "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
    ("t8", "word " * 100),
    ("t9", "don't stop123! mixed-case TEXT with   spaces"),
]


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(EDGE_TEXTS, ["id", "text"])


def test_token_count(spark, edge_df):
    got = {r.id: r.tc for r in edge_df.select("id", ts.token_count(F.col("text")).alias("tc")).collect()}
    exp = {i: len(t.split()) for i, t in EDGE_TEXTS}
    assert got == exp


def test_lang_id_heuristic(spark, edge_df):
    got = {r.id: r.lang for r in edge_df.select("id", ts.lang_id(F.col("text")).alias("lang")).collect()}
    assert got["t0"] == "en"
    assert got["t4"] == "de"
    assert got["t5"] == "fr"
    assert got["t6"] == "und"
    assert got["t1"] == "und"


def test_quality_score_bounds_and_ordering(spark, edge_df):
    got = {r.id: r.q for r in edge_df.select("id", ts.quality_score(F.col("text")).alias("q")).collect()}
    assert all(0.0 <= v <= 1.0 for v in got.values())
    assert got["t0"] > got["t3"]  # real sentence beats pure punctuation
    assert got["t1"] == pytest.approx(0.25)  # empty: only punct term neutral


def test_fingerprint_detects_shared_block(spark):
    block = "alpha bravo charlie delta echo foxtrot golf hotel"
    df = spark.createDataFrame(
        [("a", block + " unique tail one two three"),
         ("b", "different head words here " + block),
         ("c", "entirely unrelated content with many words present")],
        ["id", "text"],
    )
    got = {r.id: r.fp for r in df.select("id", ts.doc_fingerprint(F.col("text")).alias("fp")).collect()}
    # min-md5 over 8-token windows: a shared 8-token block can (and here
    # does) dominate both docs containing it
    assert got["a"] != got["c"] and got["b"] != got["c"]


def test_duckdb_dialect_parity(spark, edge_df):
    """Every *_sql builder must reproduce the Spark value bit-for-bit."""
    sdf = edge_df.select(
        "id",
        ts.token_count(F.col("text")).alias("tc"),
        ts.bpe_ish_token_count(F.col("text")).alias("bc"),
        F.round(ts.punct_ratio(F.col("text")), 6).alias("pr"),
        F.round(ts.stopword_ratio(F.col("text")), 6).alias("sr"),
        F.round(ts.mean_word_len(F.col("text")), 6).alias("mwl"),
        F.round(ts.quality_score(F.col("text")), 6).alias("q"),
        ts.lang_id(F.col("text")).alias("lang"),
        ts.doc_fingerprint(F.col("text")).alias("fp"),
    ).toPandas().set_index("id").sort_index()

    con = duckdb.connect()
    con.register("docs", pd.DataFrame(EDGE_TEXTS, columns=["id", "text"]))
    ddf = con.execute(
        f"""select id,
          {ts.token_count_sql('text')} as tc,
          {ts.bpe_ish_token_count_sql('text')} as bc,
          round({ts.punct_ratio_sql('text')}, 6) as pr,
          round({ts.stopword_ratio_sql('text')}, 6) as sr,
          round({ts.mean_word_len_sql('text')}, 6) as mwl,
          round({ts.quality_score_sql('text')}, 6) as q,
          {ts.lang_id_sql('text')} as lang,
          {ts.doc_fingerprint_sql('text')} as fp
        from docs"""
    ).fetchdf().set_index("id").sort_index()

    for col in sdf.columns:
        a, b = sdf[col], ddf[col]
        if a.dtype == object:
            assert (a == b).all(), (col, a[a != b].head())
        else:
            assert (abs(a.astype(float) - b.astype(float)) < 1e-9).all(), col
