"""Unigram-LM cross-entropy (operators/lm.py) and DSIR importance
weights (operators/dsir.py).

Both operators are checked three ways: hand-computed numpy oracles on a
tiny fixture, structural invariants (identity target ⇒ zero weights;
empty docs survive with defined scores), and partition invariance (the
scores are pure functions of the text, never of the physical layout).
The driver queries add the DuckDB engine-parity check at sf0.01.
"""

import math

import pytest
from pyspark.sql import Row, functions as F


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


# ---------------------------------------------------------------- lm --


def test_unigram_xent_matches_hand_computation(spark):
    from rust_gd_spark.operators.lm import unigram_xent

    # corpus: 'a a b' and 'b c' -> counts a:2 b:2 c:1, T=5
    df = _docs(spark, [(1, "a a b"), (2, "b c")])
    out = {r["id"]: r for r in unigram_xent(df, "doc_id", "text").collect()}
    pa, pb, pc = 2 / 5, 2 / 5, 1 / 5
    want1 = -(2 * math.log(pa) + 1 * math.log(pb)) / 3
    want2 = -(math.log(pb) + math.log(pc)) / 2
    assert out[1]["n_tokens"] == 3
    assert out[1]["xent"] == pytest.approx(round(want1, 6), abs=1e-6)
    assert out[2]["n_tokens"] == 2
    assert out[2]["xent"] == pytest.approx(round(want2, 6), abs=1e-6)


def test_unigram_xent_empty_and_null_docs_survive(spark):
    from rust_gd_spark.operators.lm import unigram_xent

    # '' and NULL normalize to the single empty token (the repo-wide
    # split-of-empty convention), so they score instead of vanishing.
    df = _docs(spark, [(1, "x y"), (2, ""), (3, None)])
    out = {r["id"]: r for r in unigram_xent(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["n_tokens"] == 1 and out[3]["n_tokens"] == 1
    # p('') = 2/4; both empty docs score identically
    assert out[2]["xent"] == out[3]["xent"]
    assert out[2]["xent"] == pytest.approx(round(-math.log(0.5), 6), abs=1e-6)


def test_score_against_smooths_unseen_terms(spark):
    from rust_gd_spark.operators.lm import score_against

    ref = _docs(spark, [(10, "a a b")])  # vocab {a, b}, T=3, V=3
    df = _docs(spark, [(1, "a z")])  # z unseen in ref
    row = score_against(df, ref, "doc_id", "text").collect()[0]
    pa = (2 + 0.5) / (3 + 0.5 * 3)
    pz = (0 + 0.5) / (3 + 0.5 * 3)
    want = -(math.log(pa) + math.log(pz)) / 2
    assert row["xent"] == pytest.approx(round(want, 6), abs=1e-6)


def test_unigram_xent_partition_invariant(spark):
    from rust_gd_spark.operators.lm import unigram_xent

    rows = [(i, f"tok{i % 7} tok{i % 3} shared word") for i in range(40)]
    a = unigram_xent(_docs(spark, rows), "doc_id", "text")
    b = unigram_xent(_docs(spark, rows).repartition(13), "doc_id", "text")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# -------------------------------------------------------------- dsir --


def test_dsir_identity_target_gives_zero_weights(spark):
    from rust_gd_spark.operators.dsir import dsir_logweights

    rows = [(i, f"alpha beta gamma{i % 5} delta") for i in range(30)]
    df = _docs(spark, rows)
    out = dsir_logweights(df, df, "doc_id", "text", n_buckets=256).collect()
    assert len(out) == 30
    assert all(r["logw"] == 0.0 for r in out)
    assert all(r["n_ngrams"] == 3 for r in out)


def test_dsir_matches_numpy_oracle(spark):
    import hashlib

    import numpy as np

    from rust_gd_spark.operators.dsir import dsir_logweights
    from rust_gd_spark.operators.minhash import normalize_text  # noqa: F401

    B, alpha, seed = 64, 0.5, 0
    raw_rows = [(1, "the cat sat"), (2, "dogs bark loud"), (3, "the cat ran")]
    tgt_rows = [(10, "the cat sat still")]

    def buckets(text):
        toks = text.lower().split()
        out = []
        for a, b in zip(toks, toks[1:]):
            h = hashlib.md5(f"{a} {b}:{seed}".encode()).hexdigest()
            out.append(int(h[:13], 16) % B)
        return out

    raw_hist = np.full(B, 0.0)
    for _, t in raw_rows:
        for b in buckets(t):
            raw_hist[b] += 1
    tgt_hist = np.full(B, 0.0)
    for _, t in tgt_rows:
        for b in buckets(t):
            tgt_hist[b] += 1
    lr = np.log((tgt_hist + alpha) / (tgt_hist.sum() + alpha * B)) - np.log(
        (raw_hist + alpha) / (raw_hist.sum() + alpha * B)
    )
    want = {
        i: round(float(sum(lr[b] for b in buckets(t))), 6) for i, t in raw_rows
    }

    out = dsir_logweights(
        _docs(spark, raw_rows),
        _docs(spark, tgt_rows),
        "doc_id",
        "text",
        n_buckets=B,
        seed=seed,
        alpha=alpha,
    ).collect()
    got = {r["id"]: r["logw"] for r in out}
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=2e-6)
    # docs sharing target bigrams outrank the disjoint one
    assert got[1] > got[2] and got[3] > got[2]


def test_dsir_short_docs_get_zero(spark):
    from rust_gd_spark.operators.dsir import dsir_logweights

    df = _docs(spark, [(1, "one two three"), (2, "solo"), (3, ""), (4, None)])
    tgt = _docs(spark, [(9, "one two")])
    out = {
        r["id"]: r
        for r in dsir_logweights(df, tgt, "doc_id", "text", n_buckets=64).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    for i in (2, 3, 4):
        assert out[i]["n_ngrams"] == 0 and out[i]["logw"] == 0.0
    assert out[1]["n_ngrams"] == 2


def test_dsir_partition_invariant(spark):
    from rust_gd_spark.operators.dsir import dsir_logweights

    rows = [(i, f"w{i % 4} w{i % 6} w{i % 4} tail") for i in range(50)]
    tgt_rows = [(100 + i, f"w{i % 4} w{i % 6} target") for i in range(5)]
    a = dsir_logweights(
        _docs(spark, rows), _docs(spark, tgt_rows), "doc_id", "text", n_buckets=128
    )
    b = dsir_logweights(
        _docs(spark, rows).repartition(17),
        _docs(spark, tgt_rows).repartition(3),
        "doc_id",
        "text",
        n_buckets=128,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_lm_and_dsir_duckdb_twins_on_fixture(spark, tmp_path):
    """Engine parity on a small synthetic corpus — the same check the
    driver runs at sf0.01, pinned here so it runs in every pytest."""
    duckdb = pytest.importorskip("duckdb")

    from rust_gd_spark.operators.dsir import dsir_logweights, dsir_logweights_sql
    from rust_gd_spark.operators.lm import unigram_xent, unigram_xent_sql

    rows = [
        (i, None if i % 11 == 7 else f"word{i % 9} word{i % 5} the end {i % 3}")
        for i in range(60)
    ]
    df = _docs(spark, rows)
    p = str(tmp_path / "docs.parquet")
    df.write.parquet(p)

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from parquet_scan('{p}/*.parquet')"
    )

    got = sorted(
        map(tuple, unigram_xent(df, "doc_id", "text").collect())
    )
    want = sorted(
        map(tuple, con.execute(unigram_xent_sql("documents", "doc_id", "text")).fetchall())
    )
    assert got == want

    tgt = df.filter(F.col("doc_id") % 7 == 0)
    got = sorted(
        map(
            tuple,
            dsir_logweights(df, tgt, "doc_id", "text", n_buckets=128).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                dsir_logweights_sql(
                    "documents",
                    "(select * from documents where doc_id % 7 = 0)",
                    "doc_id",
                    "text",
                    n_buckets=128,
                )
            ).fetchall(),
        )
    )
    assert got == want
