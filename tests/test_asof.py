"""asof_join: backward-inclusive match, equality ties, NULL on no-match,
tolerance horizon, key independence — plus the one-shuffle plan shape."""

import datetime as dt

from pyspark.sql import types as T

from rust_gd_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)

L_SCHEMA = T.StructType(
    [
        T.StructField("lid", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
    ]
)
R_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("rid", T.LongType()),
    ]
)


def _m(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _join(spark, lrows, rrows, **kw):
    left = spark.createDataFrame(lrows, L_SCHEMA)
    right = spark.createDataFrame(rrows, R_SCHEMA)
    out = asof_join(left, right, key="user_id", ts="ts",
                    right_cols=["ts", "rid"], **kw)
    return {r["lid"]: (r["rid_r"], r["ts_r"]) for r in out.collect()}


def test_backward_inclusive_and_null(spark):
    got = _join(
        spark,
        [
            (1, _m(10), 7),   # after rid=100 -> match
            (2, _m(5), 7),    # exactly AT rid=100 -> equality matches
            (3, _m(4), 7),    # before any right row -> NULL
            (4, _m(40), 7),   # after both -> latest (rid=101)
            (5, _m(10), 8),   # other key, no right rows -> NULL
        ],
        [(7, _m(5), 100), (7, _m(30), 101)],
    )
    assert got[1] == (100, _m(5))
    assert got[2] == (100, _m(5))
    assert got[3] == (None, None)
    assert got[4] == (101, _m(30))
    assert got[5] == (None, None)


def test_tolerance_horizon(spark):
    got = _join(
        spark,
        [(1, _m(10), 7), (2, _m(90), 7)],
        [(7, _m(5), 100)],
        tolerance_sec=3600.0,
    )
    assert got[1] == (100, _m(5))      # 5 min old, within 1 h
    assert got[2] == (None, None)      # 85 min old, beyond tolerance


def test_keys_do_not_leak(spark):
    got = _join(
        spark,
        [(1, _m(10), 7), (2, _m(10), 8)],
        [(7, _m(5), 100), (8, _m(7), 200)],
    )
    assert got[1] == (100, _m(5))
    assert got[2] == (200, _m(7))


def test_single_shuffle_plan(spark):
    left = spark.createDataFrame([(1, _m(1), 7)], L_SCHEMA)
    right = spark.createDataFrame([(7, _m(0), 9)], R_SCHEMA)
    df = asof_join(left, right, right_cols=["ts", "rid"])
    physical = df._jdf.queryExecution().executedPlan().toString()
    # one hash-partitioning exchange for the window; unions are local
    assert physical.count("Exchange hashpartitioning") == 1
