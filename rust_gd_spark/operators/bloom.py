"""Bloom-prefiltered cross-corpus exact dedup — "is this new row already in
the 10^12-row corpus?" without shuffling the corpus.

The reference's dictionary answers exactly this question for chunk bases
(`src/dict.rs:38-63`: probe-before-insert); at corpus scale the probe
becomes a membership test against data that cannot live in one process.
A plain anti-join answers it exactly but shuffles BOTH sides by key — at
10^12 corpus rows that is ~8 TB of key traffic for a batch that may be
0.01% of the corpus. The classic fix (used by every warehouse runtime
filter, e.g. Spark's own InjectRuntimeFilter) is a Bloom filter:

  stage 1  corpus → sharded Bloom bitsets, built MAP-SIDE. Each scan task
           folds its rows into per-shard partials — sparse (bit
           positions) below the break-even, dense bitsets above — and a
           groupBy(shard) OR-combine produces the final ``num_shards``
           rows. Per-task shuffle volume = min(total bloom bytes,
           task keys × k × 8 B): bounded by the smaller of the filter
           itself and the keys the task actually saw.
  stage 2  new batch → one shuffle by shard → cogrouped membership test
           against the single bitset row of that shard (the bitset is
           never replicated per probe row, unlike a broadcast join whose
           join output would duplicate it).
  stage 3  Bloom misses are DEFINITIVELY absent (no false negatives) and
           pass through with no join at all. Bloom hits — true matches
           plus an ε of false positives — are exact-confirmed against the
           corpus with the corpus on the STREAMED side of a broadcast
           hash join, so the corpus is scanned (column-pruned) but never
           shuffled.

The result is exact anti-join semantics (DuckDB-oracled in
``__spark_entry__.oracle_sql()['bloom_dedup_newbatch']``); the Bloom layer
only decides how much work the exact confirm does. Total shuffled bytes:
O(|new batch| + Σ_task min(total_bloom_bytes, task_keys × 8)), never
O(|corpus| × key width).

Hashing: one JVM-side ``xxhash64`` per key, split Kirsch-Mitzenmacher
style (h_i = h_lo + i·h_odd mod m — two halves of one 64-bit hash give k
index functions; Kirsch & Mitzenmacher, ESA'06) inside Arrow-vectorized
numpy. No per-row Python anywhere.

Sizing at the north rule's scale: 10^12 keys at 10 bits/key is ~1.25 TB
of bitset — far beyond one executor, which is exactly why the filter is
SHARDED by key hash: each shard holds m/8 bytes and only ever meets its
own shard's probe rows in one task. ``num_shards`` should be ≥ cluster
parallelism (it is the stage-2 task count); shard load is uniform because
the shard index is a hash residue.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def _km_index(h: np.ndarray, num_hashes: int, m_bits: int) -> np.ndarray:
    """(n,) uint64 key hashes → (k, n) bit positions via double hashing."""
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd stride covers all residues
    i = np.arange(num_hashes, dtype=np.uint64)[:, None]
    return (h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    """OR positions into a uint8 bitset; np.bitwise_or.at handles the
    read-modify-write collisions a plain fancy-index assignment loses."""
    np.bitwise_or.at(
        bits,
        (pos >> np.uint64(3)).astype(np.int64).ravel(),
        (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)).ravel(),
    )


def _test_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """(k, n) positions → (n,) bool: all k bits set."""
    byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
    hit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
    return hit.all(axis=0).astype(bool)


def build_shard_blooms(
    keyed: DataFrame,
    num_shards: int = 32,
    bits_per_shard: int = 1 << 20,
    num_hashes: int = 6,
    key_hash_col: str = "key_hash",
) -> DataFrame:
    """``(shard int, bits binary)`` — one row per shard that saw ≥ 1 key.

    Map-side partials: each input partition folds ALL its Arrow batches
    into per-shard accumulators before emitting. A key-poor shard emits a
    SPARSE partial (the sorted distinct bit positions, 8 B each); a
    key-rich shard emits the dense bitset — whichever is smaller, chosen
    per (task, shard). Per-task shuffle volume is therefore
    min(num_shards × bits_per_shard/8, keys_in_task × num_hashes × 8 B):
    never worse than shuffling the keys themselves (the plan this
    operator exists to beat), and collapsing to tiny dense bitsets once
    tasks are key-rich. Dense accumulators are boolean scatter arrays
    (bits_per_shard BYTES each — 8× the packed bitset, packed at emit),
    allocated per shard only after that shard crosses the sparse/dense
    break-even; size num_shards × bits_per_shard so the worst case stays
    executor-resident.
    """
    if bits_per_shard % 8:
        raise ValueError("bits_per_shard must be a multiple of 8")
    nbytes = bits_per_shard // 8

    def _partials(batches):
        # per shard: either a dense BOOLEAN scatter array (one byte per
        # bit while accumulating — fancy boolean indexing is duplicate-
        # safe and ~an order of magnitude faster than np.bitwise_or.at's
        # scalar read-modify-write loop; packed 8:1 only at emit) or a
        # list of uint64 position arrays (flattened lazily at emit)
        dense: dict[int, np.ndarray] = {}
        sparse: dict[int, list[np.ndarray]] = {}
        sparse_n: dict[int, int] = {}

        def densify(s: int) -> np.ndarray:
            mask = dense[s] = np.zeros(bits_per_shard, np.bool_)
            for pos in sparse.pop(s, ()):
                mask[pos] = True
            sparse_n.pop(s, None)
            return mask

        for pdf in batches:
            hs = pdf[key_hash_col].to_numpy(dtype=np.int64)
            h = hs.view(np.uint64)
            # numpy int64 % positive == Spark pmod (sign of divisor), so
            # the probe side can shard JVM-side with the same arithmetic
            shards = hs % num_shards
            order = np.argsort(shards, kind="stable")
            h, shards = h[order], shards[order]
            bounds = np.searchsorted(shards, np.arange(num_shards + 1))
            for s in range(num_shards):
                lo, hi = bounds[s], bounds[s + 1]
                if lo == hi:
                    continue
                pos = _km_index(h[lo:hi], num_hashes, bits_per_shard)
                if s in dense:
                    dense[s][pos.ravel()] = True
                    continue
                flat = pos.ravel()
                sparse.setdefault(s, []).append(flat)
                sparse_n[s] = sparse_n.get(s, 0) + flat.size
                if sparse_n[s] * 8 >= nbytes:  # break-even: go dense
                    densify(s)

        rows_shard, rows_bits, rows_dense = [], [], []
        for s, mask in dense.items():
            rows_shard.append(s)
            rows_bits.append(np.packbits(mask, bitorder="little").tobytes())
            rows_dense.append(True)
        for s, chunks in sparse.items():
            pos = np.unique(np.concatenate(chunks))
            rows_shard.append(s); rows_bits.append(pos.tobytes()); rows_dense.append(False)
        if rows_shard:
            yield pd.DataFrame(
                {
                    "shard": pd.Series(rows_shard, dtype="int32"),
                    "bits": rows_bits,
                    "dense": pd.Series(rows_dense, dtype=bool),
                }
            )

    def _combine(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(nbytes, np.uint8)
        for raw, is_dense in zip(pdf["bits"], pdf["dense"]):
            if is_dense:
                bits |= np.frombuffer(raw, np.uint8)
            else:
                _set_bits(bits, np.frombuffer(raw, np.uint64))
        return pd.DataFrame(
            {"shard": pdf["shard"].iloc[:1], "bits": [bits.tobytes()]}
        )

    partials = keyed.select(key_hash_col).mapInPandas(
        _partials, "shard int, bits binary, dense boolean"
    )
    return partials.groupBy("shard").applyInPandas(_combine, "shard int, bits binary")


def merge_shard_blooms(*blooms: DataFrame) -> DataFrame:
    """OR-combine several ``(shard, bits)`` filter tables built with the
    SAME (num_shards, bits_per_shard, num_hashes) — the incremental-corpus
    maintenance path: persist the corpus filter once
    (``blooms.write.parquet(path)``), then per ingest batch
    ``merge_shard_blooms(spark.read.parquet(path),
    build_shard_blooms(new_keys, ...))`` and write back. Union-OR is
    exact: the merged filter is bit-identical to one built over the
    concatenated corpora (pinned in tests), so dedup quality never decays
    across increments. Bitsets can only gain bits; rebuild when the fill
    fraction pushes the FP rate past budget (monitor via
    ``F.bit_count``-style audits or key counts)."""

    def _or(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.frombuffer(pdf["bits"].iloc[0], np.uint8).copy()
        for raw in pdf["bits"].iloc[1:]:
            other = np.frombuffer(raw, np.uint8)
            if other.shape != acc.shape:
                raise ValueError(
                    "merge_shard_blooms: mismatched bits_per_shard "
                    f"({other.size * 8} vs {acc.size * 8})"
                )
            acc |= other
        return pd.DataFrame(
            {"shard": pdf["shard"].iloc[:1], "bits": [acc.tobytes()]}
        )

    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.groupBy("shard").applyInPandas(_or, "shard int, bits binary")


def flag_might_contain(
    batch: DataFrame,
    blooms: DataFrame,
    bits_per_shard: int,
    num_hashes: int,
    num_shards: int,
    key_hash_col: str = "key_hash",
) -> DataFrame:
    """``batch`` + ``bloom_hit boolean``, via ONE shuffle of the batch.

    Cogrouped applyInPandas: each shard's probe rows meet that shard's
    single bitset row in one task — the bitset is read once per shard, not
    joined (and therefore duplicated) onto every probe row. A shard with
    no bloom row (no corpus key hashed there) flags everything False —
    vacuously correct: nothing from the corpus lives in that shard.
    """
    out_schema = T.StructType(
        batch.schema.fields + [T.StructField("bloom_hit", T.BooleanType())]
    )

    def _probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        left = left.drop(columns=["_shard"])
        if len(left) == 0:
            return left.assign(bloom_hit=pd.Series([], dtype=bool))
        if len(right) == 0:
            return left.assign(bloom_hit=False)
        bits = np.frombuffer(right["bits"].iloc[0], np.uint8)
        h = left[key_hash_col].to_numpy(dtype=np.int64).view(np.uint64)
        return left.assign(
            bloom_hit=_test_bits(bits, _km_index(h, num_hashes, bits_per_shard))
        )

    # pmod == numpy int64 % positive divisor — bit-identical shard routing
    # to build_shard_blooms' map-side partials
    shard = F.pmod(F.col(key_hash_col), F.lit(num_shards)).cast("int")
    probed = (
        batch.withColumn("_shard", shard)
        .groupBy("_shard")
        .cogroup(blooms.groupBy("shard"))
        .applyInPandas(_probe, out_schema)
    )
    return probed


def bloom_anti_join(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_shards: int = 32,
    bits_per_shard: int = 1 << 20,
    num_hashes: int = 6,
    broadcast_candidates: bool = True,
    materialize_keys: bool = False,
) -> DataFrame:
    """Rows of ``new_df`` whose text is NOT present in ``corpus_df`` —
    exact anti-join semantics, Bloom-accelerated. Output:
    ``(id, content_key)``.

    content_key = md5(coalesce(text,'')) — same key and NULL doctrine as
    ``exactdup.exact_dup_groups`` (and DuckDB-reproducible). The confirm
    join keys on content_key, so the Bloom layer (keyed on
    xxhash64(content_key)) can only ever cost extra work, never
    correctness: a 64-bit collision makes a false positive that the
    confirm removes.

    ``broadcast_candidates=True`` is the small-batch-vs-huge-corpus plan:
    corpus streamed against a broadcast hash of the candidate keys (the
    Bloom hits — true matches + ε·|new| false positives), so nothing
    corpus-sized is ever shuffled. Set False for the batch≈corpus regime,
    where a plain co-partitioned shuffle join is the right plan anyway.

    ``materialize_keys=True`` localCheckpoints the compact
    ``(content_key, key_hash)`` projection so the corpus TEXT is scanned
    and hashed once instead of twice (filter build + exact confirm).
    ~48 B/row of executor-local storage — the right trade interactively
    and on clusters with local disk to spare; default off because at
    10^12 rows the re-scan streams while the checkpoint must be stored.
    """
    key = lambda c: F.md5(F.coalesce(F.col(c), F.lit("")))  # noqa: E731
    corpus_keys = corpus_df.select(
        key(text_col).alias("content_key"),
        F.xxhash64(key(text_col)).alias("key_hash"),
    )
    if materialize_keys:
        corpus_keys = corpus_keys.localCheckpoint(eager=True)
    blooms = build_shard_blooms(
        corpus_keys, num_shards, bits_per_shard, num_hashes
    ).localCheckpoint(eager=True)  # tiny (num_shards rows); built exactly once

    new_keyed = new_df.select(
        F.col(id_col).alias("id"),
        key(text_col).alias("content_key"),
        F.xxhash64(key(text_col)).alias("key_hash"),
    )
    flagged = flag_might_contain(
        new_keyed, blooms, bits_per_shard, num_hashes, num_shards
    ).localCheckpoint(eager=True)  # feeds both branches; compact rows

    misses = flagged.filter(~F.col("bloom_hit"))  # definitively new
    candidates = flagged.filter(F.col("bloom_hit"))

    cand_keys = candidates.select("content_key").distinct()
    if broadcast_candidates:
        # inner join with the SMALL side broadcast: corpus scan stays
        # map-side (Spark cannot broadcast the left side of a left_anti,
        # so the anti is decomposed into semi ∘ anti over the small sets)
        matched = (
            corpus_keys.join(F.broadcast(cand_keys), "content_key")
            .select("content_key")
            .distinct()  # partial-agg shrinks to ≤ |cand_keys| per task
        )
        survivors = candidates.join(
            F.broadcast(matched), "content_key", "left_anti"
        )
    else:
        survivors = candidates.join(corpus_keys, "content_key", "left_anti")
    return misses.select("id", "content_key").union(
        survivors.select("id", "content_key")
    )
