"""Unit tests for the shared one-shuffle bucket-pair generator
(operators/_buckets.py): pair completeness, id ordering, payloads, the
skew cap + audit contract, and the neighbor_window band-graph bound."""

import itertools

import pytest
from pyspark.sql import functions as F

from rust_gd_spark.operators._buckets import bucket_pairs


@pytest.fixture(scope="module")
def posting(spark):
    # bucket "a": 4 members; "b": 2; "c": 1 (singleton); "d": 5 (hot)
    rows = (
        [(i, "a") for i in range(4)]
        + [(10, "b"), (11, "b")]
        + [(20, "c")]
        + [(30 + i, "d") for i in range(5)]
    )
    return spark.createDataFrame(rows, "id long, k string")


def _pairs_set(df):
    return {(r.id_l, r.id_r) for r in df.collect()}


def test_all_pairs_and_ordering(spark, posting):
    pairs, audit = bucket_pairs(posting, ["k"], max_bucket_size=10)
    got = _pairs_set(pairs)
    expect = set(itertools.combinations(range(4), 2)) | {(10, 11)}
    expect |= set(itertools.combinations(range(30, 35), 2))
    assert got == expect
    assert all(l < r for l, r in got)
    assert audit.count() == 0


def test_cap_excludes_and_audits(spark, posting):
    pairs, audit = bucket_pairs(posting, ["k"], max_bucket_size=4)
    got = _pairs_set(pairs)
    # bucket d (5 members) excluded entirely, audited with its true size
    assert got == set(itertools.combinations(range(4), 2)) | {(10, 11)}
    rows = audit.collect()
    assert len(rows) == 1 and rows[0].k == "d" and rows[0].bucket_size == 5


def test_neighbor_window_chain_connectivity(spark, posting):
    pairs, _ = bucket_pairs(
        posting, ["k"], max_bucket_size=10, neighbor_window=1
    )
    got = _pairs_set(pairs)
    # window=1 => consecutive chain per sorted bucket
    assert got == {(0, 1), (1, 2), (2, 3), (10, 11),
                   (30, 31), (31, 32), (32, 33), (33, 34)}


def test_payload_columns(spark):
    df = spark.createDataFrame(
        [(1, "x", 100), (2, "x", 200)], "id long, k string, fp long"
    )
    pairs, _ = bucket_pairs(df, ["k"], payload_cols=["fp"], max_bucket_size=10)
    r = pairs.collect()[0]
    assert (r.id_l, r.id_r, r.fp_l, r.fp_r) == (1, 2, 100, 200)


def test_multiple_buckets_same_pair_not_deduped(spark):
    # same pair via two keys -> two rows (callers dedup after verify)
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (1, "y"), (2, "y")], "id long, k string"
    )
    pairs, _ = bucket_pairs(df, ["k"], max_bucket_size=10)
    assert pairs.count() == 2
    assert pairs.dropDuplicates(["id_l", "id_r"]).count() == 1
