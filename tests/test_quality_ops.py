"""Training-data-pipeline quality operators: PII redaction, deterministic
sampling/mixing, Gopher repetition filters, sequence packing — each
checked for semantics AND for bit-parity between the Spark expression and
its shipped DuckDB SQL template (the driver-oracle contract)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rust_gd_spark.functions import pii
from rust_gd_spark.operators import packing, repetition, sampling

PII_DOCS = [
    (0, "contact me at jane.doe+spam@example.co.uk or (415) 555-0132 now"),
    (1, "server 10.0.254.3 rejected ssn 123-45-6789 twice"),
    (2, "no pii here, just text with-dashes and 7 little digits 1234"),
    (3, "a@b.io x@y.zw 192.168.0.1 +49 (0)30 1234567"),
    (4, ""),
]

REP_DOCS = [
    (0, "unique one\nunique two\nboiler\nboiler\nboiler"),
    (1, "all different\nlines here\nno repeats"),
    (2, "the cat sat the cat sat the cat"),
    (3, "solo"),
    (4, "  \n\n  "),  # blank-only: drops out of both engines
]


def _duck(sql, tables):
    con = duckdb.connect()
    for name, pdf in tables.items():
        con.register(name, pdf)
    return con.sql(sql).df()


def _parity(spark_df, sql, tables, key):
    got = spark_df.toPandas().sort_values(key).reset_index(drop=True)
    want = _duck(sql, tables).sort_values(key).reset_index(drop=True)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)].astype(
        {c: got[c].dtype for c in got.columns}
    )
    pd.testing.assert_frame_equal(got, want, check_like=True)


# ---------------------------------------------------------------- PII


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(PII_DOCS, "doc_id long, text string")
    out = {r.id: r for r in pii.pii_columns(df, "doc_id", "text").collect()}
    assert out[0].n_email == 1 and out[0].n_phone == 1
    assert out[1].n_ipv4 == 1 and out[1].n_ssn == 1
    assert out[2].n_pii == 0 and out[2].redacted_text == PII_DOCS[2][1]
    assert out[3].n_email == 2 and out[3].n_ipv4 == 1
    assert "<EMAIL>" in out[0].redacted_text
    assert "jane" not in out[0].redacted_text
    assert "<SSN>" in out[1].redacted_text and "6789" not in out[1].redacted_text
    assert "<IP>" in out[3].redacted_text


def test_pii_sql_parity(spark):
    df = spark.createDataFrame(PII_DOCS, "doc_id long, text string")
    cnts = ", ".join(
        f"{pii.pii_count_sql('text', k)} as n_{k}" for k, _, _ in pii.PII_PATTERNS
    )
    tot = " + ".join(f"n_{k}" for k, _, _ in pii.PII_PATTERNS)
    sql = f"""
        select * , {tot} as n_pii from (
          select doc_id as id, {cnts},
                 {pii.redact_pii_sql('text')} as redacted_text
          from docs
        )
    """
    _parity(
        pii.pii_columns(df, "doc_id", "text"),
        sql,
        {"docs": pd.DataFrame(PII_DOCS, columns=["doc_id", "text"])},
        "id",
    )


# ----------------------------------------------------------- sampling


def test_hash_threshold_bounds():
    assert sampling.hash_threshold(0.0) == "0" * 32
    assert sampling.hash_threshold(1.0) == "g" * 32
    with pytest.raises(ValueError):
        sampling.hash_threshold(1.5)


def test_hash_sample_deterministic_monotone_unbiased(spark):
    n = 4000
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    keep30 = {r.doc_id for r in sampling.hash_sample(df, "doc_id", 0.3).collect()}
    keep30b = {r.doc_id for r in sampling.hash_sample(
        df.repartition(13), "doc_id", 0.3).collect()}
    assert keep30 == keep30b  # partition-invariant (df.sample is not)
    keep60 = {r.doc_id for r in sampling.hash_sample(df, "doc_id", 0.6).collect()}
    assert keep30 <= keep60  # monotone in fraction
    assert abs(len(keep30) / n - 0.3) < 0.03
    other_seed = {r.doc_id for r in sampling.hash_sample(
        df, "doc_id", 0.3, seed=9).collect()}
    assert other_seed != keep30


def test_weighted_sample_semantics_and_parity(spark):
    # three weight strata: w=1 always kept, w=0 always dropped, w=0.25
    # kept at ~rate; decision partition-invariant and engine-identical
    pdf = pd.DataFrame({
        "doc_id": range(3000),
        "weight": [(1.0, 0.0, 0.25)[i % 3] for i in range(3000)],
    })
    df = spark.createDataFrame(pdf)
    out = sampling.weighted_sample(df, "doc_id", "weight", seed=7)
    kept = {r.doc_id for r in out.collect()}
    kept_re = {r.doc_id for r in sampling.weighted_sample(
        df.repartition(13), "doc_id", "weight", seed=7).collect()}
    assert kept == kept_re  # partition-invariant
    assert all(i in kept for i in range(0, 3000, 3))       # w=1.0
    assert all(i not in kept for i in range(1, 3000, 3))   # w=0.0
    frac = sum(1 for i in range(2, 3000, 3) if i in kept) / 1000
    assert abs(frac - 0.25) < 0.05
    pred = sampling.weighted_sample_sql("doc_id", "weight", 7)
    _parity(out, f"select doc_id, weight from docs where {pred}",
            {"docs": pdf}, "doc_id")


def test_weighted_sample_null_key_engine_parity(spark):
    # NULL keys: Spark and DuckDB must make the SAME decision (all NULL
    # keys share one digest; the twin must not silently drop them)
    pdf = pd.DataFrame({"doc_id": [None, None, "a", "b"],
                        "weight": [1.0, 0.0, 1.0, 1.0]})
    df = spark.createDataFrame(pdf)
    out = sampling.weighted_sample(df, "doc_id", "weight", seed=7)
    pred = sampling.weighted_sample_sql("doc_id", "weight", 7)
    got = {(r.doc_id, r.weight) for r in out.collect()}
    want = {
        (k, w) for k, w in _duck(
            f"select doc_id, weight from docs where {pred}", {"docs": pdf}
        ).itertuples(index=False)
    }
    assert got == want
    assert out.filter("doc_id is null and weight = 1.0").count() == 1


def test_weighted_sample_precision_none_mega_cluster(spark):
    # precision=6 zeroes weights below 5e-7 (clusters > 2M members —
    # would drop EVERY member); precision=None must keep the raw double,
    # bit-identically in both engines
    n = 2000
    pdf = pd.DataFrame({"doc_id": [f"d{i}" for i in range(n)],
                        "weight": [1.0 / 3_000_000] * n})
    df = spark.createDataFrame(pdf)
    assert sampling.weighted_sample(df, "doc_id", "weight").count() == 0
    out = sampling.weighted_sample(df, "doc_id", "weight", precision=None)
    pred = sampling.weighted_sample_sql("doc_id", "weight", 0, precision=None)
    _parity(out, f"select doc_id, weight from docs where {pred}",
            {"docs": pdf}, "doc_id")
    # thr is now nonzero: P(keep) = 3.3e-7 per row — sampling 2000 rows
    # almost surely keeps none, but the threshold itself must be > 0
    thr = __import__("math").floor((1.0 / 3_000_000) * 2.0 ** 52)
    assert thr > 0


def test_weighted_sample_expected_mass_per_cluster(spark):
    # soft-dedup contract: sum of weights == #clusters, and the kept-set
    # size concentrates around it
    pdf = pd.DataFrame({
        "id": [f"d{i}" for i in range(1200)],
        "cluster_id": [f"c{i % 400}" for i in range(1200)],  # 400 x size-3
        "weight": [round(1 / 3, 6)] * 1200,
    })
    df = spark.createDataFrame(pdf)
    kept = sampling.weighted_sample(df, "id", "weight", seed=3).count()
    assert abs(kept - 400) < 60  # ±3 sigma-ish for Binomial(1200, 1/3)


def test_stratified_sample_parity(spark):
    pdf = pd.DataFrame(
        {"doc_id": range(2000), "src": [f"s{i % 3}" for i in range(2000)]}
    )
    df = spark.createDataFrame(pdf)
    fr = {"s0": 0.9, "s1": 0.25}
    out = sampling.stratified_sample(df, "doc_id", "src", fr, default_fraction=0.0)
    # s2 rows all dropped via default
    assert out.filter("src = 's2'").count() == 0
    by = {r.src: r.c for r in out.groupBy("src").agg(
        F.count("*").alias("c")).collect()}
    assert abs(by["s0"] / (2000 / 3) - 0.9) < 0.1
    assert abs(by["s1"] / (2000 / 3) - 0.25) < 0.1
    pred = sampling.stratified_sample_sql("doc_id", "src", fr, 0.0)
    _parity(out, f"select doc_id, src from docs where {pred}", {"docs": pdf},
            "doc_id")


def test_mixture_plan_values_and_parity(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(300),
            "src": [f"s{i % 3}" for i in range(300)],
            "n_tok": [10 + (i % 7) for i in range(300)],
        }
    )
    df = spark.createDataFrame(pdf)
    weights = {"s0": 0.6, "s1": 0.4}  # s2 unlisted -> fraction 0
    out = sampling.mixture_plan(df, "src", weights, 2000, "n_tok")
    rows = {r.stratum: r for r in out.collect()}
    actual = pdf.groupby("src").n_tok.sum().to_dict()
    assert rows["s0"].actual_size == actual["s0"]
    assert rows["s0"].target_size == 1200
    assert rows["s0"].fraction == round(
        min(1.0, 1200 / actual["s0"]), 6
    )
    assert rows["s2"].target_size == 0 and rows["s2"].fraction == 0.0
    # over-budget stratum caps at 1 (down-sampling only)
    cap = sampling.mixture_plan(df, "src", {"s0": 1.0}, 10**6, "n_tok")
    assert {r.stratum: r.fraction for r in cap.collect()}["s0"] == 1.0
    # plan feeds the sampling primitive: kept sizes land near target
    fr = {s: r.fraction for s, r in rows.items()}
    kept = sampling.stratified_sample(df, "doc_id", "src", fr)
    kept_tok = (
        kept.groupBy("src").agg(F.sum("n_tok").alias("t")).collect()
    )
    for r in kept_tok:
        assert abs(r.t - rows[r.src].target_size) < 0.25 * actual[r.src]
    _parity(
        out,
        sampling.mixture_plan_sql("docs", "src", weights, 2000, "n_tok"),
        {"docs": pdf},
        "stratum",
    )


# --------------------------------------------------------- repetition


def test_dup_line_stats_values(spark):
    df = spark.createDataFrame(REP_DOCS, "doc_id long, text string")
    out = {r.id: r for r in repetition.dup_line_stats(df, "doc_id", "text").collect()}
    assert 4 not in out  # blank-only drops
    assert out[0].n_lines == 5 and out[0].dup_line_frac == 0.6
    assert out[1].dup_line_frac == 0.0
    # chars: 3 dup lines of 6 chars over (10+10+6*3) = 18/38
    assert out[0].dup_line_char_frac == round(18 / 38, 6)


def test_dup_line_stats_parity(spark):
    df = spark.createDataFrame(REP_DOCS, "doc_id long, text string")
    _parity(
        repetition.dup_line_stats(df, "doc_id", "text"),
        repetition.dup_line_stats_sql("docs", "doc_id", "text"),
        {"docs": pd.DataFrame(REP_DOCS, columns=["doc_id", "text"])},
        "id",
    )


def test_top_bigram_stats_values_and_parity(spark):
    df = spark.createDataFrame(REP_DOCS, "doc_id long, text string")
    out = {r.id: r for r in repetition.top_bigram_stats(
        df, "doc_id", "text").collect()}
    assert 4 not in out
    # doc 2: "the cat" x3 of 7 bigrams; token chars = 3*7+2*3 = 21... compute:
    # tokens: the cat sat the cat sat the cat -> 8 tokens, chars 8*3=24
    assert out[2].n_tokens == 8 and out[2].top_bigram_count == 3
    assert out[2].top_bigram_char_frac == round(3 * 6 / 24, 6)
    assert out[3].n_tokens == 1 and out[3].top_bigram_count == 0
    assert out[3].top_bigram_char_frac == 0.0
    _parity(
        repetition.top_bigram_stats(df, "doc_id", "text"),
        repetition.top_bigram_stats_sql("docs", "doc_id", "text"),
        {"docs": pd.DataFrame(REP_DOCS, columns=["doc_id", "text"])},
        "id",
    )


# ------------------------------------------------------------ packing


def _brute_next_fit(ids, toks, cap):
    want = {}
    fill, seq = cap + 1, -1  # force open on first doc
    for i, t in sorted(zip(ids, toks)):
        if fill + t <= cap:
            want[i] = (seq, fill)
            fill += t
        else:
            seq += 1
            want[i] = (seq, 0)
            fill = t
    return want


def test_pack_sequences_semantics(spark):
    rng = np.random.default_rng(7)
    toks = rng.integers(1, 900, size=300).tolist()
    toks[17] = 5000  # oversized doc -> singleton sequence
    pdf = pd.DataFrame({"doc_id": range(300), "n_tok": toks})
    out = packing.pack_sequences(
        spark.createDataFrame(pdf), "doc_id", "n_tok", capacity=2048, n_shards=1
    ).toPandas()
    want = _brute_next_fit(pdf.doc_id, pdf.n_tok, 2048)
    got = {r.id: (r.seq_id, r.seq_offset) for r in out.itertuples()}
    assert got == want
    # every non-oversized sequence respects capacity
    fills = out.groupby("seq_id")["n_tokens"].sum()
    over = out[out.n_tokens > 2048].seq_id
    assert (fills.drop(over).le(2048)).all()
    singleton = out[out.id == 17]
    assert singleton.seq_offset.item() == 0
    assert (out.seq_id == singleton.seq_id.item()).sum() == 1


def test_pack_sequences_sharded_parity(spark):
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {"doc_id": range(500), "n_tok": rng.integers(0, 700, size=500)}
    )
    out = packing.pack_sequences(
        spark.createDataFrame(pdf), "doc_id", "n_tok", capacity=1024, n_shards=4
    )
    # shard-invariance of shard-local plans: same shard contents => same plan
    sql = packing.pack_sequences_sql("docs", "doc_id", "n_tok", 1024, 4)
    _parity(out, sql, {"docs": pdf}, "id")


def test_pack_sequences_validation(spark):
    df = spark.createDataFrame([(1, 2)], "doc_id long, n_tok long")
    with pytest.raises(ValueError):
        packing.pack_sequences(df, "doc_id", "n_tok", capacity=0)
    with pytest.raises(ValueError):
        packing.pack_sequences(df, "doc_id", "n_tok", capacity=8, n_shards=0)


def test_leakage_safe_split_never_straddles(spark):
    """The defining invariant: every member of a cluster gets the same
    split, so no within-cluster (near-dup) pair straddles train/val; the
    per-cluster decision matches the SQL twin; fractions are sane."""
    rows = [(f"d{i}", f"c{i % 37}") for i in range(500)]
    cl = spark.createDataFrame(rows, "id string, cluster_id string")
    out = sampling.leakage_safe_split(cl, frac_train=0.8, seed=11).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values()), "cluster straddles split"
    train_clusters = sum(1 for s in by_cluster.values() if s == {"train"})
    assert 0.6 <= train_clusters / len(by_cluster) <= 0.95  # 37 coins at f=0.8
    # engine parity with the SQL twin
    con = duckdb.connect()
    con.register("cl", pd.DataFrame(rows, columns=["id", "cluster_id"]))
    twin = con.execute(
        "select id, "
        + sampling.leakage_safe_split_sql("cluster_id", 0.8, seed=11)
        + " as split from cl"
    ).fetchdf()
    want = dict(zip(twin["id"], twin["split"]))
    assert all(want[r.id] == r.split for r in out)
    # determinism + monotonicity in frac_train: train set only grows
    lo = {r.id: r.split for r in sampling.leakage_safe_split(cl, frac_train=0.4, seed=11).collect()}
    assert {i for i, s in lo.items() if s == "train"} <= {
        r.id for r in out if r.split == "train"
    }
