"""Bloom-prefiltered cross-corpus dedup (operators/bloom.py).

Contract under test: EXACT anti-join semantics regardless of Bloom sizing
(the filter may only add confirm work, never change the answer), zero
false negatives (reference dictionary invariant `src/dict.rs:38-63`:
a present key always probes present), and shard-routing parity between
the JVM pmod probe path and the numpy build path.
"""

import random

import pytest
from pyspark.sql import functions as F


def _mk_texts(seed: int, n: int) -> list[str]:
    rng = random.Random(seed)
    words = [f"w{i:03d}" for i in range(200)]
    return [
        " ".join(rng.choice(words) for _ in range(rng.randint(3, 30)))
        for _ in range(n)
    ]


@pytest.fixture(scope="module")
def corpus_df(spark):
    texts = _mk_texts(7, 400)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def new_df(spark, corpus_df):
    """120 planted dups of corpus texts (new ids) + 80 fresh texts + a NULL
    and an empty text (NULL doctrine: both key as md5(''))."""
    texts = _mk_texts(7, 400)
    dups = [(10_000 + i, texts[i * 3]) for i in range(120)]
    fresh = [(20_000 + i, t) for i, t in enumerate(_mk_texts(99, 80))]
    extra = [(30_000, None), (30_001, "")]
    df = spark.createDataFrame(
        dups + fresh + extra, "doc_id long, text string"
    )
    df.cache().count()
    return df


def _expected_survivor_ids(corpus_df, new_df) -> set:
    corpus_texts = {
        (r.text or "") for r in corpus_df.select("text").collect()
    }
    return {
        r.doc_id
        for r in new_df.collect()
        if (r.text or "") not in corpus_texts
    }


def test_no_false_negatives(spark, corpus_df, new_df):
    """Every key that IS in the corpus must flag bloom_hit=True — for any
    shard count, including one that exercises negative-hash routing."""
    from rust_gd_spark.operators.bloom import build_shard_blooms, flag_might_contain

    key = F.md5(F.coalesce(F.col("text"), F.lit("")))
    corpus_keys = corpus_df.select(F.xxhash64(key).alias("key_hash"))
    for num_shards in (1, 7, 32):
        blooms = build_shard_blooms(
            corpus_keys, num_shards=num_shards, bits_per_shard=1 << 14, num_hashes=4
        )
        probes = new_df.select(
            "doc_id", F.xxhash64(key).alias("key_hash")
        )
        flagged = flag_might_contain(
            probes, blooms, 1 << 14, 4, num_shards
        )
        in_corpus_ids = {
            r.doc_id
            for r in new_df.collect()
            if (r.text or "")
            in {(c.text or "") for c in corpus_df.collect()}
        }
        hits = {r.doc_id for r in flagged.filter("bloom_hit").collect()}
        assert in_corpus_ids <= hits, f"false negative at num_shards={num_shards}"


def test_anti_join_exact(spark, corpus_df, new_df):
    from rust_gd_spark.operators.bloom import bloom_anti_join

    out = bloom_anti_join(new_df, corpus_df, "doc_id", "text",
                          num_shards=8, bits_per_shard=1 << 16, num_hashes=5)
    got = {r.id for r in out.collect()}
    assert got == _expected_survivor_ids(corpus_df, new_df)


def test_anti_join_exact_under_forced_false_positives(spark, corpus_df, new_df):
    """A deliberately undersized filter (128 bits/shard for 400 keys) is
    drowning in false positives — the exact confirm must still produce the
    exact answer, and the FP path must actually be exercised."""
    from rust_gd_spark.operators.bloom import (
        bloom_anti_join,
        build_shard_blooms,
        flag_might_contain,
    )

    out = bloom_anti_join(new_df, corpus_df, "doc_id", "text",
                          num_shards=2, bits_per_shard=128, num_hashes=2)
    got = {r.id for r in out.collect()}
    expected = _expected_survivor_ids(corpus_df, new_df)
    assert got == expected

    # prove FPs existed: flag fresh-only keys against the tiny filter
    key = F.md5(F.coalesce(F.col("text"), F.lit("")))
    corpus_keys = corpus_df.select(F.xxhash64(key).alias("key_hash"))
    blooms = build_shard_blooms(corpus_keys, 2, 128, 2)
    fresh = new_df.filter(F.col("doc_id") >= 20_000).select(
        "doc_id", F.xxhash64(key).alias("key_hash")
    )
    fp = flag_might_contain(fresh, blooms, 128, 2, 2).filter("bloom_hit").count()
    assert fp > 0, "128-bit filter over 400 keys produced no FPs — probe broken?"


def test_anti_join_shuffle_fallback_matches(spark, corpus_df, new_df):
    from rust_gd_spark.operators.bloom import bloom_anti_join

    a = bloom_anti_join(new_df, corpus_df, broadcast_candidates=True,
                        num_shards=4, bits_per_shard=1 << 14, num_hashes=4)
    b = bloom_anti_join(new_df, corpus_df, broadcast_candidates=False,
                        num_shards=4, bits_per_shard=1 << 14, num_hashes=4)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_anti_join_materialized_keys_matches(spark, corpus_df, new_df):
    # checkpointing the compact key projection must not change the result
    from rust_gd_spark.operators.bloom import bloom_anti_join

    a = bloom_anti_join(new_df, corpus_df, materialize_keys=False,
                        num_shards=4, bits_per_shard=1 << 14, num_hashes=4)
    b = bloom_anti_join(new_df, corpus_df, materialize_keys=True,
                        num_shards=4, bits_per_shard=1 << 14, num_hashes=4)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_empty_sides(spark, corpus_df, new_df):
    from rust_gd_spark.operators.bloom import bloom_anti_join

    empty = new_df.filter("doc_id < 0")
    # empty corpus: everything in the batch survives
    out = bloom_anti_join(new_df, empty, "doc_id", "text",
                          num_shards=4, bits_per_shard=1 << 10, num_hashes=3)
    assert out.count() == new_df.count()
    # empty batch: empty result
    out2 = bloom_anti_join(empty, corpus_df, "doc_id", "text",
                           num_shards=4, bits_per_shard=1 << 10, num_hashes=3)
    assert out2.count() == 0


def test_kernel_no_false_negative_property():
    """Pure-numpy property: any key folded into a bitset must test
    positive afterwards, for adversarial sizes (tiny m, many hashes) and
    the full signed-hash range — no Spark involved."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from rust_gd_spark.operators.bloom import _km_index, _set_bits, _test_bits

    @settings(max_examples=200, deadline=None)
    @given(
        keys=st.lists(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            min_size=1, max_size=64,
        ),
        m_bits=st.sampled_from([8, 64, 1024, 1 << 16]),
        k=st.integers(min_value=1, max_value=8),
    )
    def check(keys, m_bits, k):
        h = np.array(keys, dtype=np.int64).view(np.uint64)
        bits = np.zeros(m_bits // 8, np.uint8)
        _set_bits(bits, _km_index(h, k, m_bits))
        assert _test_bits(bits, _km_index(h, k, m_bits)).all()

    check()


def test_kernel_shard_parity_with_pmod():
    """numpy int64 % positive divisor must equal Spark's pmod for the
    whole signed range — the routing contract between build (numpy) and
    probe (JVM expression)."""
    import numpy as np

    hs = np.array([-(2**63), -1, 0, 1, 2**63 - 1, -7, 7], dtype=np.int64)
    for s in (1, 2, 7, 32):
        got = hs % s
        expected = np.array([((int(v) % s) + s) % s for v in hs])
        assert (got == expected).all(), s


def test_sparse_and_dense_partials_agree(spark, corpus_df, new_df):
    """One fat input partition forces dense partials past the break-even;
    many thin partitions stay sparse — the combined filter must flag the
    exact same probe set either way."""
    from rust_gd_spark.operators.bloom import build_shard_blooms, flag_might_contain

    key = F.md5(F.coalesce(F.col("text"), F.lit("")))
    corpus_keys = corpus_df.select(F.xxhash64(key).alias("key_hash"))
    probes = new_df.select("doc_id", F.xxhash64(key).alias("key_hash"))
    m, k, s = 1 << 13, 4, 3  # 1 KiB/bitset: 400 keys dense, ~12/task sparse
    flags = []
    for parts in (1, 32):
        blooms = build_shard_blooms(
            corpus_keys.repartition(parts), num_shards=s,
            bits_per_shard=m, num_hashes=k,
        )
        flagged = flag_might_contain(probes, blooms, m, k, s)
        flags.append({r.doc_id for r in flagged.filter("bloom_hit").collect()})
    assert flags[0] == flags[1]


def test_merge_equals_build_once(spark, corpus_df, tmp_path):
    """Incremental maintenance: build over half the corpus, persist,
    merge in the second half — the merged filter must be BIT-IDENTICAL
    to one built over the full corpus in one pass."""
    from rust_gd_spark.operators.bloom import build_shard_blooms, merge_shard_blooms

    key = F.md5(F.coalesce(F.col("text"), F.lit("")))
    keys = corpus_df.select(F.xxhash64(key).alias("key_hash"))
    a = keys.filter(F.col("key_hash") % 2 == 0)
    b = keys.filter(F.col("key_hash") % 2 != 0)
    args = dict(num_shards=5, bits_per_shard=1 << 13, num_hashes=4)

    p = str(tmp_path / "blooms")
    build_shard_blooms(a, **args).write.parquet(p)
    merged = merge_shard_blooms(spark.read.parquet(p),
                                build_shard_blooms(b, **args))
    full = build_shard_blooms(keys, **args)
    got = {r.shard: bytes(r.bits) for r in merged.collect()}
    want = {r.shard: bytes(r.bits) for r in full.collect()}
    assert got == want


def test_merge_rejects_mismatched_sizes(spark, corpus_df):
    from rust_gd_spark.operators.bloom import build_shard_blooms, merge_shard_blooms

    key = F.md5(F.coalesce(F.col("text"), F.lit("")))
    keys = corpus_df.select(F.xxhash64(key).alias("key_hash"))
    a = build_shard_blooms(keys, num_shards=3, bits_per_shard=1 << 10, num_hashes=3)
    b = build_shard_blooms(keys, num_shards=3, bits_per_shard=1 << 12, num_hashes=3)
    with pytest.raises(Exception, match="mismatched bits_per_shard"):
        merge_shard_blooms(a, b).collect()
