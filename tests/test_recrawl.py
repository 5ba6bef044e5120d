"""Time-aware exact-dup canonicalization: earliest-capture pick, tie
rule, batch re-log accounting, and DuckDB twin parity."""

from __future__ import annotations

from datetime import datetime

from rust_gd_spark.operators.recrawl import recrawl_groups, recrawl_groups_sql


def _df(spark):
    t = datetime
    rows = [
        # page A crawled 3x across 3 days -> canonical = earliest (id 11)
        (11, "page a", t(2026, 1, 3)),
        (12, "page a", t(2026, 1, 1)),
        (13, "page a", t(2026, 1, 5)),
        # page B re-logged twice at the SAME ts -> tie broken by min id,
        # n_distinct_ts = 1, age span 0
        (21, "page b", t(2026, 2, 1)),
        (22, "page b", t(2026, 2, 1)),
        # page C crawled once -> dropped at min_crawls=2
        (31, "page c", t(2026, 3, 1)),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")


def test_recrawl_groups(spark):
    out = {r.canonical_id: r for r in recrawl_groups(_df(spark)).collect()}
    assert set(out) == {12, 21}
    a = out[12]
    assert a.n_crawls == 3 and a.n_distinct_ts == 3
    assert a.first_ts == datetime(2026, 1, 1) and a.last_ts == datetime(2026, 1, 5)
    assert a.age_span_sec == 4 * 86400
    b = out[21]
    assert b.n_crawls == 2 and b.n_distinct_ts == 1 and b.age_span_sec == 0


def test_recrawl_duckdb_twin(spark):
    import duckdb

    df = _df(spark)
    con = duckdb.connect()
    con.register("t", df.toPandas())
    sql = recrawl_groups_sql("t", "doc_id", "text", "ts", min_crawls=2)
    twin = {
        r[0]: (r[1], r[2], r[3], str(r[4]), str(r[5]), r[6])
        for r in con.execute(sql).fetchall()
    }
    got = {
        r.content_key: (
            r.canonical_id, r.n_crawls, r.n_distinct_ts,
            str(r.first_ts), str(r.last_ts), r.age_span_sec,
        )
        for r in recrawl_groups(df).collect()
    }
    assert got == twin
