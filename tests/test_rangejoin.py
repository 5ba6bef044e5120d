"""Bounded time-range join: bucketization correctness vs the direct
inequality join, band edges, and plan shape."""

import datetime as dt

import duckdb
import pytest
from pyspark.sql import Row, functions as F

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
US = 1_000_000
DELTA = 60 * US  # ±60 s band


def _ts(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def band_tables(spark):
    left = spark.createDataFrame(
        [
            Row(lid=0, k=1, ts=_ts(100)),
            Row(lid=1, k=1, ts=_ts(500)),
            Row(lid=2, k=2, ts=_ts(100)),   # same time, other key
            Row(lid=3, k=1, ts=None),       # NULL ts never matches
        ]
    )
    right = spark.createDataFrame(
        [
            Row(rid=10, k=1, ts=_ts(40)),     # 60 s before lid=0: ON the edge
            Row(rid=11, k=1, ts=_ts(160)),    # 60 s after lid=0: ON the edge
            Row(rid=12, k=1, ts=_ts(161)),    # 61 s after: out of band
            Row(rid=13, k=1, ts=_ts(100)),    # exact tie
            Row(rid=14, k=2, ts=_ts(100)),    # matches lid=2 only (key)
            Row(rid=15, k=1, ts=_ts(441)),    # bucket below lid=1, in band
            Row(rid=16, k=1, ts=_ts(559)),    # bucket above lid=1, in band
        ]
    )
    return left, right


def test_range_join_band_and_key_semantics(spark, band_tables):
    from rust_gd_spark.operators.rangejoin import range_join

    left, right = band_tables
    out = range_join(
        left, right, key="k", ts="ts", delta_us=DELTA, right_cols=["rid"]
    )
    pairs = {(r.lid, r.rid_r) for r in out.collect()}
    assert pairs == {
        (0, 10), (0, 11), (0, 13),   # inclusive edges + tie
        (1, 15), (1, 16),            # cross-bucket neighbors both sides
        (2, 14),                     # key isolation
    }
    # each qualifying pair appears EXACTLY once despite the 3-bucket
    # explode (the right bucket equals exactly one candidate)
    assert out.count() == len(pairs)


def test_range_join_matches_duckdb_twin(spark, band_tables):
    from rust_gd_spark.operators.rangejoin import range_join, range_join_sql

    left, right = band_tables
    got = {
        (r.lid, r.rid_r)
        for r in range_join(
            left, right, key="k", ts="ts", delta_us=DELTA, right_cols=["rid"]
        ).collect()
    }
    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("r", right.toPandas())
    sql = range_join_sql(
        "select * from l", "select * from r",
        key="k", ts="ts", delta_us=DELTA,
        left_cols="l.lid", right_cols="r.rid as rid_r",
    )
    assert {tuple(x) for x in con.execute(sql).fetchall()} == got


def test_range_join_plan_has_no_nested_loop(spark, band_tables):
    from rust_gd_spark.operators.rangejoin import range_join

    left, right = band_tables
    out = range_join(
        left, right, key="k", ts="ts", delta_us=DELTA, right_cols=["rid"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the whole point: an equi-join (hash or sort-merge or broadcast-hash),
    # never the O(|L|*|R|) nested loop Spark plans for raw inequality joins
    assert "NestedLoop" not in plan
    assert any(
        j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )


def test_range_join_validates_delta(spark, band_tables):
    from rust_gd_spark.operators.rangejoin import range_join

    left, right = band_tables
    with pytest.raises(ValueError):
        range_join(left, right, key="k", ts="ts", delta_us=0, right_cols=["rid"])


def test_range_join_rejects_colliding_columns(spark):
    import pytest as _pytest

    from rust_gd_spark.operators.rangejoin import range_join

    base = spark.sql(
        "select 1 as k, timestamp '2026-01-01 00:00:00' as ts, 7 as _bucket"
    )
    clean = spark.sql(
        "select 1 as k, timestamp '2026-01-01 00:00:01' as ts, 'x' as v"
    )
    with _pytest.raises(ValueError, match="_bucket"):
        range_join(base, clean, "k", "ts", 2_000_000, ["v"])
    with _pytest.raises(ValueError, match="_bucket"):
        range_join(clean, base, "k", "ts", 2_000_000, ["ts"])
    # suffixed right column colliding with a left column
    left2 = spark.sql(
        "select 1 as k, timestamp '2026-01-01 00:00:00' as ts, 9 as v_r"
    )
    with _pytest.raises(ValueError, match="v_r"):
        range_join(left2, clean, "k", "ts", 2_000_000, ["v"])
