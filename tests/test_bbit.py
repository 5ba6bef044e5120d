"""b-bit minwise hashing: pack/unpack round-trip, slot-match kernel vs
a numpy reference, estimator correction behavior, end-to-end planted
near-dups, and md5-oracle-sibling dialect parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rust_gd_spark.operators.bbit import (
    _pack_bbit,
    _unpack_bbit,
    bbit_estimate_md5,
    bbit_estimate_md5_sql,
    bbit_near_dup_pairs,
    bbit_sketch_bands,
    verify_bbit,
)
from rust_gd_spark.operators.minhash import minhash_signatures, shingle_df


@pytest.mark.parametrize("b", [1, 2, 4, 8, 16])
def test_pack_unpack_roundtrip(b):
    rng = np.random.default_rng(7)
    sig = rng.integers(0, 1 << 61, size=(5, 32), dtype=np.uint64)
    packed = _pack_bbit(sig, b)
    assert all(len(p) == 32 * b // 8 for p in packed)
    mask = np.uint64((1 << b) - 1)
    for i, buf in enumerate(packed):
        got = _unpack_bbit(buf, 32, b)
        assert (got == (sig[i] & mask).astype(np.uint16)).all(), b


def _docs_df(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(f"tok{i}" for i in range(58)) + " zz yy"  # high overlap
    other = " ".join(f"alt{i}" for i in range(60))
    return spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, other)], "uid long, text string"
    )


def test_sketch_matches_signature_lowbits(spark):
    """The fused kernel's packed sketch must equal the standalone
    signature path's lowest b bits (same seed, same permutations)."""
    sh = shingle_df(_docs_df(spark), "uid", "text", w=5)
    sig = {
        r.id: np.array(r.sig, dtype=np.int64).view(np.uint64)
        for r in minhash_signatures(sh, num_perm=64, seed=3).collect()
    }
    sk = {
        r.id: r.bsig
        for r in bbit_sketch_bands(
            sh, num_perm=64, bands=16, rows=4, b=8, seed=3
        ).collect()
    }
    for uid, s in sig.items():
        got = _unpack_bbit(bytes(sk[uid]), 64, 8)
        assert (got == (s & np.uint64(0xFF)).astype(np.uint16)).all()


@pytest.mark.parametrize("b", [4, 8, 16])
def test_verify_match_counts_vs_numpy(spark, b):
    sh = shingle_df(_docs_df(spark), "uid", "text", w=5)
    sk = bbit_sketch_bands(sh, num_perm=64, bands=16, rows=4, b=b, seed=1)
    raw = {r.id: _unpack_bbit(bytes(r.bsig), 64, b) for r in sk.collect()}
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (3, 4)], "id_l long, id_r long"
    )
    out = {
        (r.id_l, r.id_r): r.n_match
        for r in verify_bbit(
            pairs, sk.select("id", "bsig"), num_perm=64, b=b, threshold=-1.0
        ).collect()
    }
    for (l, r), m in out.items():
        assert m == int((raw[l] == raw[r]).sum()), (l, r, b)
    # identical docs agree on every slot; disjoint docs only by chance
    assert out[(1, 2)] == 64
    assert out[(1, 4)] <= 64 * (2 ** -b) * 8 + 4  # generous chance bound


def test_estimator_correction(spark):
    """j_est == 1 for identical docs; ≈ 0 (not 2^-b) for disjoint docs —
    the Li–König correction removes the chance-collision floor."""
    sh = shingle_df(_docs_df(spark), "uid", "text", w=5)
    sk = bbit_sketch_bands(sh, num_perm=128, bands=32, rows=4, b=8, seed=1)
    pairs = spark.createDataFrame([(1, 2), (1, 4)], "id_l long, id_r long")
    got = {
        (r.id_l, r.id_r): r.j_est
        for r in verify_bbit(
            pairs, sk.select("id", "bsig"), num_perm=128, b=8, threshold=-1.0
        ).collect()
    }
    assert got[(1, 2)] == 1.0
    assert abs(got[(1, 4)]) < 0.05


def test_end_to_end_planted(spark):
    out = bbit_near_dup_pairs(
        _docs_df(spark), "uid", "text", w=5, num_perm=128, bands=32, rows=4,
        b=8, threshold=0.5,
    )
    got = {(r.id_l, r.id_r): r.j_est for r in out.collect()}
    assert (1, 2) in got and got[(1, 2)] == 1.0
    assert (1, 3) in got and got[(1, 3)] > 0.6  # true J ≈ 0.87
    assert (2, 3) in got
    assert all(4 not in p for p in got)


def test_validation_errors(spark):
    sh = shingle_df(_docs_df(spark), "uid", "text", w=5)
    with pytest.raises(ValueError, match="b must be"):
        bbit_sketch_bands(sh, num_perm=64, bands=16, rows=4, b=3)
    with pytest.raises(ValueError, match="bands"):
        bbit_sketch_bands(sh, num_perm=64, bands=16, rows=5)
    with pytest.raises(ValueError, match="md5 oracle"):
        bbit_estimate_md5(_docs_df(spark), "uid", "text", b=3)


def test_md5_sibling_sql_twin(spark):
    df = _docs_df(spark)
    got = (
        bbit_estimate_md5(df, "uid", "text", w=5, num_perm=16, b=8)
        .toPandas()
        .sort_values(["id_l", "id_r"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df.toPandas())
    norm = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
    toks = f"string_split_regex({norm}, '\\s+')"
    sh = (
        f"case when len({toks}) >= 5 then "
        f"list_transform(range(0, len({toks}) - 4), "
        f"i -> array_to_string(list_slice({toks}, i + 1, i + 5), ' ')) "
        f"else [coalesce(array_to_string({toks}, ' '), '')] end"
    )
    twin = (
        con.execute(bbit_estimate_md5_sql("t", "uid", sh, num_perm=16, b=8))
        .fetchdf()
        .sort_values(["id_l", "id_r"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"n_match": "int64"}), twin.astype({"n_match": "int64"})
    )
    # identical docs: every md5 slot agrees and jaccard is exactly 1
    row = got[(got.id_l == 1) & (got.id_r == 2)].iloc[0]
    assert row.n_match == 16 and row.j_est == 1.0 and row.jaccard == 1.0


def test_estimator_accuracy_distribution(spark):
    """With k=128/b=8, mean |j_est − J| over planted mixed-overlap pairs
    stays within ~2 estimator stds (sanity pin on the correction math)."""
    rows = []
    toks = [f"w{i}" for i in range(100)]
    for d in range(10):
        keep = 50 + 5 * d  # overlap fraction with doc 0 varies
        rows.append((d, " ".join(toks[:keep] + [f"x{d}{i}" for i in range(100 - keep)])))
    df = spark.createDataFrame(rows, "uid long, text string")
    sh = shingle_df(df, "uid", "text", w=5)
    sk = bbit_sketch_bands(sh, num_perm=128, bands=32, rows=4, b=8, seed=1)
    pairs = spark.createDataFrame(
        [(0, d) for d in range(1, 10)], "id_l long, id_r long"
    )
    est = {
        r.id_r: r.j_est
        for r in verify_bbit(
            pairs, sk.select("id", "bsig"), num_perm=128, b=8, threshold=-1.0
        ).collect()
    }
    from rust_gd_spark.operators.minhash import exact_jaccard_pairs

    exact = {
        r.id_r: r.jaccard
        for r in exact_jaccard_pairs(df, "uid", "text", w=5, threshold=0.0)
        .filter(F.col("id_l") == 0)
        .collect()
    }
    errs = [abs(est[d] - exact[d]) for d in range(1, 10)]
    assert sum(errs) / len(errs) < 0.09, errs
