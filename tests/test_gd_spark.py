"""Spark GD layer tests: per-turn text equality under stable turn ordering
(the BASELINE.json per-row invariant) on both GD paths."""

import pyspark.sql.functions as F

from rust_gd_spark.gd.spark import (
    assign_base_ids,
    deserialize_turns,
    gd_conversation_roundtrip,
    gd_decompose,
    gd_dedup_metrics,
    gd_reconstruct,
    serialize_turns,
)


def test_serialize_roundtrip():
    idxs = [0, 1, 5, 7]
    texts = ["hello", "", "寿限無(じゅげむ)", "x" * 1000]
    assert deserialize_turns(serialize_turns(idxs, texts)) == (idxs, texts)


def test_conversation_roundtrip_rs(spark, transcripts_df):
    res = gd_conversation_roundtrip(
        transcripts_df, kind="rs", dict_size=255, n=128, k=124
    ).cache()
    n_conv = res.count()
    assert n_conv == 60
    assert res.filter(~F.col("roundtrip_ok")).count() == 0
    # metrics sane
    row = res.agg(F.sum("orig_bytes"), F.sum("deduped_bytes")).first()
    assert row[0] > 0 and row[1] > 0


def test_conversation_roundtrip_hamming(spark, transcripts_df):
    sample = transcripts_df.filter(F.col("conv_id") < "conv-00000010")
    res = gd_conversation_roundtrip(sample, kind="hamming", dict_size=511, deg=8)
    assert res.filter(~F.col("roundtrip_ok")).count() == 0


def test_decompose_reconstruct_identity(spark, transcripts_df):
    """The scalable path: decompose -> chunk rows -> reconstruct == input."""
    chunks = gd_decompose(transcripts_df, n=64, k=60).cache()
    assert chunks.count() > 0
    restored = gd_reconstruct(chunks, n=64, k=60)
    orig = transcripts_df.select("conv_id", "turn_idx", "text")
    assert orig.exceptAll(restored).count() == 0
    assert restored.exceptAll(orig).count() == 0


def test_base_dictionary_join(spark, transcripts_df):
    chunks = gd_decompose(transcripts_df, n=64, k=60)
    bases, with_id = assign_base_ids(chunks)
    # dictionary integrity: one base per id (the check_inner_integrity analogue)
    dup_ids = bases.groupBy("base_id").count().filter("count > 1")
    assert dup_ids.count() == 0
    assert with_id.count() == chunks.count()


def test_dedup_metrics(spark, transcripts_df):
    chunks = gd_decompose(transcripts_df, n=64, k=60)
    m = gd_dedup_metrics(chunks, dict_size=255, n=64, k=60).first()
    assert m["n_chunks"] > m["n_distinct_bases"] > 0  # fixture has duplicates
    assert 0 < m["dedup_ratio"] <= 1.2


def _alignment_matrix(n: int, seed: int = 5):
    """Deterministic nonsingular n×n over GF(2^8): unit upper-triangular
    (ones on the diagonal, seeded random strictly above) — triangular with
    nonzero diagonal is always invertible."""
    import numpy as np

    rng = np.random.default_rng(seed)
    t = np.triu(rng.integers(0, 256, size=(n, n), dtype=np.uint8), k=1)
    np.fill_diagonal(t, 1)
    return t


def test_conversation_roundtrip_rs_with_alignment(spark, transcripts_df):
    """Spark surface of the reference's error-alignment entry point
    (`src/lib.rs:73-78`), mirroring the RS+T round-trip test
    (`src/lib.rs:197-239`) at conversation granularity."""
    t = _alignment_matrix(8)
    sample = transcripts_df.filter(F.col("conv_id") < "conv-00000010")
    res = gd_conversation_roundtrip(
        sample, kind="rs", dict_size=255, precoding=t.tolist(), n=8, k=6
    )
    assert res.filter(~F.col("roundtrip_ok")).count() == 0


def test_decompose_reconstruct_with_alignment(spark, transcripts_df):
    t = _alignment_matrix(64)
    sample = transcripts_df.filter(F.col("conv_id") < "conv-00000010")
    chunks = gd_decompose(sample, n=64, k=60, precoding=t.tolist()).cache()
    restored = gd_reconstruct(chunks, n=64, k=60, precoding=t.tolist())
    orig = sample.select("conv_id", "turn_idx", "text")
    assert orig.exceptAll(restored).count() == 0
    assert restored.exceptAll(orig).count() == 0
    # aligned decompose must differ from unaligned (T actually applied)
    plain = gd_decompose(sample, n=64, k=60)
    a = {(r.conv_id, r.chunk_idx): r.base for r in chunks.collect()}
    b = {(r.conv_id, r.chunk_idx): r.base for r in plain.collect()}
    assert any(a[key] != b[key] for key in a)


def test_hamming_rejects_alignment(spark):
    import pytest as _pytest

    from rust_gd_spark.gd.core import make_gd

    with _pytest.raises(ValueError, match="not supported for Hamming"):
        make_gd("hamming", 511, precoding=[[1]], deg=8)
