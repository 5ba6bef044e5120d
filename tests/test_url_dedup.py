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


def test_extract_host(spark):
    from rust_gd_spark.operators.domainfilter import extract_host

    rows = [
        (0, "HTTP://WWW.Ex.COM:80/p?q=1", "ex.com"),
        (1, "https://a.b.example.org/x", "a.b.example.org"),
        (2, "no-scheme/path", ""),
        (3, None, ""),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in rows], "i int, url string"
    )
    got = {r.i: r.h for r in df.select("i", extract_host(F.col("url")).alias("h")).collect()}
    for i, _, want in rows:
        assert got[i] == want


def test_domain_filter_gate(spark):
    from rust_gd_spark.operators import domainfilter

    # host a: 4 docs, 1 fails -> ratio 0.75 (dropped at 0.8)
    # host b: 4 docs, all keep -> ratio 1.0 (kept)
    # host c: 1 doc, keeps    -> dropped by min_docs=2
    rows = (
        [(i, "https://a.com/p%d" % i, i != 0) for i in range(4)]
        + [(i + 10, "https://b.com/p%d" % i, True) for i in range(4)]
        + [(20, "https://c.com/only", True)]
    )
    df = spark.createDataFrame(rows, "doc_id long, url string, keep boolean")
    out = domainfilter.domain_filter(
        df, min_keep_ratio=0.8, min_docs=2
    ).collect()
    assert {r.doc_id for r in out} == {10, 11, 12, 13}
    assert all(r.host == "b.com" and r.keep_ratio == 1.0 for r in out)
    # stats are exact-integer derived
    st = {r.host: r for r in domainfilter.host_stats(df).collect()}
    assert st["a.com"].host_docs == 4 and st["a.com"].host_keep_docs == 3
    assert st["a.com"].keep_ratio == 0.75
    # individually-passing docs on the failing host are dropped
    assert 1 not in {r.doc_id for r in out}


def test_domain_filter_validation(spark):
    from rust_gd_spark.operators import domainfilter

    df = spark.createDataFrame(
        [(1, "https://a.com/x", True)], "doc_id long, url string, keep boolean"
    )
    with pytest.raises(ValueError):
        domainfilter.domain_filter(df, min_keep_ratio=1.5)
    with pytest.raises(ValueError):
        domainfilter.domain_filter(df, min_docs=0)


def test_domain_filter_rejects_reserved_columns(spark):
    from rust_gd_spark.operators import domainfilter

    df = spark.createDataFrame(
        [(1, "https://a.com/x", True, "h")],
        "doc_id long, url string, keep boolean, host string",
    )
    with pytest.raises(ValueError, match="collide"):
        domainfilter.domain_filter(df)


def test_canonicalize_fuzz_dialect_parity(spark):
    """Batched deterministic fuzz over URL-ish ASCII strings: the
    Java-regex (Spark) and RE2 (DuckDB) canonicalization chains must
    agree byte-for-byte on the full printable-ASCII URL space — hosts,
    ports, params, fragments, regex metacharacters, debris. One
    DataFrame + one DuckDB query, not per-example sessions."""
    import random

    rng = random.Random(1337)
    schemes = ["https://", "http://", "HTTP://", "HtTpS://", "", "ftp://"]
    hosts = ["Ex.COM", "www.ex.com", "WWW.EX.COM", "a.b.c.org", "ex.com:443",
             "ex.com:80", "ex.com:8080", "ex.com:", "127.0.0.1", ""]
    paths = ["", "/", "/P/x", "/a//b/", "/a.b(c)", "/%7Euser", "/..", "///"]
    params = ["", "?", "?q=1", "?utm_source=a", "?UTM_SOURCE=a", "?q=1&utm_x=2",
              "?utm_a=1&utm_b=2&r=3", "?gclid=x&fbclid=y", "?a=b&&c=d",
              "?q=a+b%26c", "?&", "?utm_", "?utm_1=2"]
    frags = ["", "#", "#f", "#a#b", "#?q=1", "#frag/"]
    urls = []
    for i in range(400):
        u = (rng.choice(schemes) + rng.choice(hosts) + rng.choice(paths)
             + rng.choice(params) + rng.choice(frags))
        if i % 17 == 0:
            u = " " + u + " "
        urls.append((i, u))
    df = spark.createDataFrame(urls, "i int, url string")
    got = {
        r.i: r.c
        for r in df.select(
            "i", urldedup.canonicalize_url(F.col("url")).alias("c")
        ).collect()
    }
    con = duckdb.connect()
    con.register("u", pd.DataFrame(urls, columns=["i", "url"]))
    twin = con.execute(
        f"select i, {urldedup.canonicalize_url_sql('url')} as c from u"
    ).fetchall()
    mismatches = [
        (i, urls[i][1], got[i], c) for i, c in twin if c != got[i]
    ]
    assert not mismatches, f"{len(mismatches)} dialect drifts: {mismatches[:5]}"
