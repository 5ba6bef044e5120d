"""URL canonicalization + URL-level dedup (`operators/urldedup.py`)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rust_gd_spark.operators import urldedup

# (raw, expected canonical) — the spec, case by case
CASES = [
    # scheme+host case folding; path case preserved
    ("HTTPS://Example.COM/Path/X", "https://example.com/Path/X"),
    # http -> https, www., default ports
    ("http://www.example.com/a", "https://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "https://example.com/a"),
    # non-default port preserved
    ("https://example.com:8080/a", "https://example.com:8080/a"),
    # fragment dropped
    ("https://example.com/a#sec-2", "https://example.com/a"),
    # tracking params dropped, real params kept, separators tidied
    (
        "https://example.com/a?utm_source=rss&q=1&gclid=x&r=2",
        "https://example.com/a?q=1&r=2",
    ),
    ("https://example.com/a?utm_a=1&utm_b=2", "https://example.com/a"),
    ("https://example.com/a?fbclid=3", "https://example.com/a"),
    # trailing slash / query debris
    ("https://example.com/a/", "https://example.com/a"),
    ("https://example.com/", "https://example.com"),
    ("https://example.com/a?", "https://example.com/a"),
    # whitespace trim
    ("  https://example.com/a ", "https://example.com/a"),
    # scheme-less passthrough (only hygiene passes apply)
    ("example.com/a/#x", "example.com/a"),
    # NULL -> ''
    (None, ""),
]


@pytest.fixture(scope="module")
def canon(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i int, url string"
    )
    rows = df.select(
        "i", urldedup.canonicalize_url(F.col("url")).alias("c")
    ).collect()
    return {r.i: r.c for r in rows}


def test_canonicalize_cases(canon):
    for i, (raw, want) in enumerate(CASES):
        assert canon[i] == want, f"{raw!r}: {canon[i]!r} != {want!r}"


def test_canonicalize_idempotent(spark):
    df = spark.createDataFrame(
        [(i, want) for i, (_, want) in enumerate(CASES)], "i int, url string"
    )
    rows = df.select(
        "i", urldedup.canonicalize_url(F.col("url")).alias("c")
    ).collect()
    for r in rows:
        assert r.c == CASES[r.i][1], "canonicalize is not idempotent"


def test_sql_twin_parity(canon):
    con = duckdb.connect()
    con.register(
        "u",
        pd.DataFrame(
            [(i, raw) for i, (raw, _) in enumerate(CASES)],
            columns=["i", "url"],
        ),
    )
    twin = con.execute(
        f"select i, {urldedup.canonicalize_url_sql('url')} as c from u"
    ).fetchall()
    for i, c in twin:
        assert c == canon[i], f"dialect drift on case {i}: {c!r} != {canon[i]!r}"


def test_url_dup_groups(spark):
    # three surface forms of one page + one unrelated page
    rows = [
        (10, "https://ex.com/p?utm_x=1"),
        (11, "HTTP://WWW.EX.COM/p"),
        (12, "https://ex.com:443/p#f"),
        (20, "https://ex.com/q"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = {r.id: r for r in urldedup.url_dup_groups(df).collect()}
    assert len(out) == 4
    for i in (10, 11, 12):
        assert out[i].canonical_url == "https://ex.com/p"
        assert out[i].canonical_id == 10
        assert out[i].group_size == 3
    assert out[20].canonical_id == 20 and out[20].group_size == 1
