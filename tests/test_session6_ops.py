"""Round-4 session-6 operators: sliding-window chunking, snapshot diff,
TF-IDF top-k, exact-k stratified sampling."""

import math

import pytest
from pyspark.sql import Row, functions as F


# ---------------------------------------------------------------------------
# chunk_by_tokens
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def chunk_docs(spark):
    rows = [
        Row(doc_id=0, text=" ".join(f"t{i}" for i in range(10))),   # 10 toks
        Row(doc_id=1, text=" ".join(f"t{i}" for i in range(4))),    # = size
        Row(doc_id=2, text="one two"),                              # < size
        Row(doc_id=3, text=""),                                     # empty
        Row(doc_id=4, text=None),                                   # NULL
        Row(doc_id=5, text=" ".join(f"t{i}" for i in range(5))),    # size+1
    ]
    return spark.createDataFrame(rows)


def test_chunk_windows_cover_and_overlap(spark, chunk_docs):
    from rust_gd_spark.operators.chunking import chunk_by_tokens

    out = chunk_by_tokens(chunk_docs, "doc_id", "text", size=4, stride=2)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.id, []).append(r)
    # doc 0: 10 tokens, size 4, stride 2 -> ceil(6/2)+1 = 4 chunks
    c0 = sorted(by_doc[0], key=lambda r: r.chunk_idx)
    assert [r.chunk_text for r in c0] == [
        "t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7", "t6 t7 t8 t9",
    ]
    assert [r.chunk_tokens for r in c0] == [4, 4, 4, 4]
    # consecutive windows share stride..size tokens (overlap = size-stride)
    for a, b in zip(c0, c0[1:]):
        assert a.chunk_text.split()[2:] == b.chunk_text.split()[:2]
    # doc 1: exactly size tokens -> one chunk
    assert [r.chunk_text for r in by_doc[1]] == ["t0 t1 t2 t3"]
    # doc 2: shorter than size -> one short chunk
    (c2,) = by_doc[2]
    assert c2.chunk_text == "one two" and c2.chunk_tokens == 2
    # empty and NULL text -> exactly one empty chunk (reference chunker's
    # zero-length rule: one padded chunk, src/gd_byte_unit.rs:44-49)
    for d in (3, 4):
        (c,) = by_doc[d]
        assert c.chunk_idx == 0 and c.chunk_text == ""
    # doc 5: size+1 tokens -> 2 chunks, final chunk short
    c5 = sorted(by_doc[5], key=lambda r: r.chunk_idx)
    assert [r.chunk_tokens for r in c5] == [4, 3]
    assert c5[1].chunk_text == "t2 t3 t4"


def test_chunk_validation(spark, chunk_docs):
    from rust_gd_spark.operators.chunking import chunk_by_tokens

    with pytest.raises(ValueError, match="stride"):
        chunk_by_tokens(chunk_docs, size=4, stride=5)
    with pytest.raises(ValueError, match=">= 1"):
        chunk_by_tokens(chunk_docs, size=0, stride=1)


def test_chunk_matches_duckdb_twin(spark, chunk_docs):
    import duckdb

    from rust_gd_spark.operators.chunking import (
        chunk_by_tokens,
        chunk_by_tokens_sql,
    )

    got = {
        (r.id, r.chunk_idx): (r.chunk_text, r.chunk_tokens)
        for r in chunk_by_tokens(
            chunk_docs, "doc_id", "text", size=3, stride=2
        ).collect()
    }
    pdf = chunk_docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            chunk_by_tokens_sql("documents", "doc_id", "text", 3, 2)
        ).fetchall()
    }
    assert got == want


# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------


def test_snapshot_diff_statuses(spark):
    from rust_gd_spark.operators.snapshot import snapshot_diff

    old = spark.createDataFrame(
        [Row(doc_id=1, text="a"), Row(doc_id=2, text="b"),
         Row(doc_id=3, text="c"), Row(doc_id=5, text=None)]
    )
    new = spark.createDataFrame(
        [Row(doc_id=2, text="b"), Row(doc_id=3, text="c2"),
         Row(doc_id=4, text="d"), Row(doc_id=5, text="")]
    )
    got = {r.id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "added",
        # NULL and '' share the exact-dup content key (repo NULL doctrine)
        5: "unchanged",
    }


def test_snapshot_diff_keys_roundtrip(spark):
    """changed rows expose both keys so downstream can re-clean the delta."""
    from rust_gd_spark.operators.snapshot import snapshot_diff

    old = spark.createDataFrame([Row(doc_id=1, text="x")])
    new = spark.createDataFrame([Row(doc_id=1, text="y")])
    (r,) = snapshot_diff(old, new).collect()
    assert r.status == "changed" and r.old_key != r.new_key
    assert r.old_key is not None and r.new_key is not None


# ---------------------------------------------------------------------------
# tfidf_topk
# ---------------------------------------------------------------------------


def test_tfidf_scores_and_topk(spark):
    from rust_gd_spark.operators.tfidf import tfidf_topk

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="apple apple banana"),
            Row(doc_id=1, text="banana cherry"),
            Row(doc_id=2, text="cherry cherry cherry date"),
        ]
    )
    out = tfidf_topk(docs, k=2)
    rows = {(r.id, r.term): r for r in out.collect()}
    # hand-checked: N=3; df(apple)=1, df(banana)=2, df(cherry)=2, df(date)=1
    assert rows[(0, "apple")].tf == 2
    assert rows[(0, "apple")].score == round(2 * math.log(3 / 1), 6)
    assert rows[(2, "cherry")].score == round(3 * math.log(3 / 2), 6)
    assert rows[(2, "date")].score == round(1 * math.log(3 / 1), 6)
    # top-2 per doc, by score desc then term asc
    per_doc = {}
    for (i, t), r in rows.items():
        per_doc.setdefault(i, []).append(r)
    assert all(len(v) == 2 for i, v in per_doc.items() if i != 1)
    # doc 0: apple (2·ln3) beats banana (1·ln1.5)
    assert {r.term for r in per_doc[0]} == {"apple", "banana"}


def test_tfidf_tie_break_total_order(spark):
    from rust_gd_spark.operators.tfidf import tfidf_topk

    docs = spark.createDataFrame(
        [Row(doc_id=0, text="zz aa"), Row(doc_id=1, text="zz aa")]
    )
    out = tfidf_topk(docs, k=1).collect()
    # equal scores everywhere -> term asc wins deterministically
    assert {(r.id, r.term) for r in out} == {(0, "aa"), (1, "aa")}


# ---------------------------------------------------------------------------
# exact_k_sample
# ---------------------------------------------------------------------------


def test_exact_k_sample_size_and_invariance(spark):
    from rust_gd_spark.operators.sampling import exact_k_sample

    df = spark.range(0, 500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("src"),
    )
    out = exact_k_sample(df, "doc_id", "src", k=10, seed=1)
    sizes = {r.src: r.n for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"0": 10, "1": 10, "2": 10}
    # partition-invariance: same kept set at any parallelism
    a = {r.doc_id for r in out.collect()}
    b = {
        r.doc_id
        for r in exact_k_sample(
            df.repartition(13), "doc_id", "src", k=10, seed=1
        ).collect()
    }
    assert a == b
    # a different seed picks a different set
    c = {
        r.doc_id
        for r in exact_k_sample(df, "doc_id", "src", k=10, seed=2).collect()
    }
    assert a != c


def test_exact_k_sample_small_stratum(spark):
    from rust_gd_spark.operators.sampling import exact_k_sample

    df = spark.createDataFrame(
        [Row(doc_id=i, src="only") for i in range(4)]
    )
    out = exact_k_sample(df, "doc_id", "src", k=10)
    assert out.count() == 4  # fewer than k rows: keep them all
