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


def _connectivity(pairs_set, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs_set:
        if a not in parent or b not in parent:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {find(n) for n in nodes}


def test_salt_oversized_preserves_connectivity(spark):
    # one hot bucket of 12 members, cap 4 -> 3 hash sub-buckets + rep chain
    rows = [(i, "hot") for i in range(12)] + [(100, "b"), (101, "b")]
    df = spark.createDataFrame(rows, "id long, k string")
    pairs, audit = bucket_pairs(df, ["k"], max_bucket_size=4, salt_oversized=True)
    got = _pairs_set(pairs)
    # the hot bucket's 12 members must form ONE connected component
    comps = _connectivity(got, set(range(12)))
    assert len(comps) == 1, comps
    # no single explosion exceeded ~cap members: pair count is O(size), not C(12,2)
    hot_pairs = {p for p in got if p[0] < 100}
    assert len(hot_pairs) < 66  # C(12,2) = 66 would mean the cap was ignored
    a = audit.collect()
    assert len(a) == 1 and a[0].k == "hot" and a[0].bucket_size == 12
    assert a[0].action == "salted"
    # untouched small bucket still emits its pair
    assert (100, 101) in got


def test_salt_oversized_with_neighbor_window(spark):
    rows = [(i, "hot") for i in range(20)]
    df = spark.createDataFrame(rows, "id long, k string")
    pairs, audit = bucket_pairs(
        df, ["k"], max_bucket_size=5, neighbor_window=2, salt_oversized=True
    )
    got = _pairs_set(pairs)
    comps = _connectivity(got, set(range(20)))
    assert len(comps) == 1
    # band-graph bound holds inside sub-buckets: edges are O(size * window)
    assert len(got) <= 20 * 2 + 20
    assert audit.collect()[0].action == "salted"


def test_dropped_action_in_audit(spark, posting):
    _, audit = bucket_pairs(posting, ["k"], max_bucket_size=4)
    assert audit.collect()[0].action == "dropped"
