"""Spark layer over the GD kernel.

Two paths, both DataFrame-native:

1. **Faithful per-conversation round-trip** (`gd_conversation_roundtrip`):
   each conversation is one GD stream — turn texts are serialized in stable
   turn order into a byte buffer, GD-deduped, GD-duped with a fresh
   dictionary, and compared per turn. This is the Spark analogue of the
   reference's `assert_eq!(duped, words)` tests (`src/lib.rs:130,183,230`);
   conversations parallelize across executors (the reference's
   `spawn_blocking` chunk parallelism, `gd_byte_unit.rs:67-76`, becomes
   Spark task parallelism).

2. **Scalable decompose/dictionary-join** (`gd_decompose` →
   `assign_base_ids` → `gd_dedup_metrics` → `gd_reconstruct`): chunks
   become rows `(conv_id, chunk_idx, base, deviation)`; the reference's
   stateful LRU dictionary probe (`src/dict.rs:38-63`) becomes a
   dictionary-encoding *join* against a distinct-base table; reconstruction
   is the inverse join + batched re-encode + ordered reassembly. This is
   the path that scales to 10^12 turns: no global state, one shuffle by
   conv_id, one by base.

Serialization contract: a conversation's turns are packed as repeated
``[u32 big-endian byte length][utf-8 bytes]`` records in turn order —
lossless and order-stable, so per-turn text equality is checkable.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from .core import make_gd


def serialize_turns(turn_idx: list[int], texts: list[str]) -> bytes:
    """Pack turns as repeated [u32 turn_idx][u32 len][utf-8 bytes]."""
    out = bytearray()
    for i, t in zip(turn_idx, texts):
        b = t.encode("utf-8")
        out.extend(struct.pack(">II", i, len(b)))
        out.extend(b)
    return bytes(out)


def deserialize_turns(buf: bytes) -> tuple[list[int], list[str]]:
    idxs: list[int] = []
    texts: list[str] = []
    ptr = 0
    while ptr + 8 <= len(buf):
        i, n = struct.unpack(">II", buf[ptr : ptr + 8])
        ptr += 8
        idxs.append(i)
        texts.append(buf[ptr : ptr + n].decode("utf-8"))
        ptr += n
    return idxs, texts


def _conv_spread(df: DataFrame) -> DataFrame:
    """Explicit conv-hash width at the core count for the round-trip kernel.

    The per-conversation GF(2^8) kernel is CPU-dense; AQE's byte-based
    coalescing sizes the conv shuffle for bytes per task (8 tasks on 32
    cores measured — a 0.6 s straggler job). The explicit repartition
    satisfies the downstream groupBy clustering (no second exchange) and
    is scale-free: defaultParallelism is the cluster's core count, which
    is what a compute-bound stage wants. Applied ONLY to the kernel whose
    output feeds no further shuffle (gd_conversation_roundtrip returns one
    row per conv): gd_decompose's consumers join/aggregate its chunks, and
    the extra map tasks measurably cost more than the kernel spread saves
    (ABAB 1.29x worse) — those stay at AQE's width.
    """
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n_parts, "conv_id")


_RS_CACHE: dict = {}


def _rs_cached(n: int, k: int, precoding=None):
    """Per-executor-process ReedSolomon cache: the generator matrix (and
    T^-1 when error alignment is installed) is built once per
    (n, k, T) per Python worker, not once per pandas group."""
    from .rs import ReedSolomon

    tkey = None if precoding is None else np.asarray(
        precoding, dtype=np.uint8
    ).tobytes()
    key = (n, k, tkey)
    if key not in _RS_CACHE:
        code = ReedSolomon(n, k)
        if precoding is not None:
            code.set_precoding(np.asarray(precoding, dtype=np.uint8))
        _RS_CACHE[key] = code
    return _RS_CACHE[key]


# ---------------------------------------------------------------------------
# Path 1: faithful per-conversation GD round-trip
# ---------------------------------------------------------------------------

ROUNDTRIP_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.IntegerType()),
        T.StructField("orig_bytes", T.LongType()),
        T.StructField("deduped_bytes", T.LongType()),
        T.StructField("dedup_ratio", T.DoubleType()),
        T.StructField("roundtrip_ok", T.BooleanType()),
    ]
)


def gd_conversation_roundtrip(
    transcripts: DataFrame,
    kind: str = "rs",
    dict_size: int = 255,
    precoding=None,
    **params,
) -> DataFrame:
    """Per-conversation GD dedup + dup + per-turn equality check.

    Returns one row per conversation with dedup metrics and the round-trip
    verdict. ``params`` are the code params (n=, k= for rs; deg= for
    hamming). ``precoding``: optional n×n error-alignment matrix T (RS
    only) — the Spark surface of the reference's third entry point
    (`src/lib.rs:73-78`); the encode side applies T, the decode side T^-1,
    and the round-trip equality check covers both (mirrors the RS(4,3)+T
    test, `src/lib.rs:197-239`).
    """
    if not params:
        params = {"n": 128, "k": 124}
    if precoding is not None:
        # plain nested lists serialize into the UDF closure
        precoding = np.asarray(precoding, dtype=np.uint8).tolist()

    def run(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("turn_idx")
        texts = group["text"].tolist()
        idxs = group["turn_idx"].astype(int).tolist()
        buf = serialize_turns(idxs, texts)
        gd_dedup = make_gd(kind, dict_size, precoding=precoding, **params)
        gd_dup = make_gd(kind, dict_size, precoding=precoding, **params)
        deduped = gd_dedup.dedup(buf)
        restored = gd_dup.dup(deduped)
        ok = deserialize_turns(restored) == (idxs, texts)
        return pd.DataFrame(
            {
                "conv_id": [group["conv_id"].iloc[0]],
                "n_turns": [len(texts)],
                "orig_bytes": [len(buf)],
                "deduped_bytes": [len(deduped.data)],
                "dedup_ratio": [len(deduped.data) / max(len(buf), 1)],
                "roundtrip_ok": [ok],
            }
        )

    return (
        _conv_spread(transcripts.select("conv_id", "turn_idx", "text"))
        .groupBy("conv_id")
        .applyInPandas(run, schema=ROUNDTRIP_SCHEMA)
    )


# ---------------------------------------------------------------------------
# Path 2: scalable decompose / dictionary-join / reconstruct
# ---------------------------------------------------------------------------

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("chunk_idx", T.LongType()),
        T.StructField("base", T.BinaryType()),
        T.StructField("deviation", T.BinaryType()),
        T.StructField("last_chunk_pad", T.IntegerType()),
    ]
)


def gd_decompose(
    transcripts: DataFrame, n: int = 128, k: int = 124, precoding=None
) -> DataFrame:
    """Chunk + RS-decompose every conversation into base/deviation rows.

    One shuffle (groupBy conv_id); decode is numpy-batched over all chunks
    of a conversation at once inside the Arrow batch. ``precoding``:
    optional n×n error-alignment matrix T — decompose then operates on
    c·T (`rs/mod.rs:105-114`), moving 'fluctuating' symbol positions into
    the deviation so more bases coincide (`DESIGN.md:62-109`).
    """
    if precoding is not None:
        precoding = np.asarray(precoding, dtype=np.uint8).tolist()

    def run(group: pd.DataFrame) -> pd.DataFrame:
        code = _rs_cached(n, k, precoding)
        group = group.sort_values("turn_idx")
        buf = serialize_turns(
            group["turn_idx"].astype(int).tolist(), group["text"].tolist()
        )
        from .core import _chunk_bytes

        chunks, pad = _chunk_bytes(buf, n)
        bases, devs = code.decode(chunks)
        b = bases.shape[0]
        return pd.DataFrame(
            {
                "conv_id": [group["conv_id"].iloc[0]] * b,
                "chunk_idx": np.arange(b, dtype=np.int64),
                "base": [row.tobytes() for row in bases],
                "deviation": [row.tobytes() for row in devs],
                "last_chunk_pad": np.where(
                    np.arange(b) == b - 1, pad, 0
                ).astype(np.int32),
            }
        )

    return (
        transcripts.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandas(run, schema=CHUNK_SCHEMA)
    )


def assign_base_ids(chunks: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Dictionary-encode bases: the GD dictionary as a DataFrame join.

    Returns (bases table ``(base_id, base, n_refs)``, chunks with base_id).
    base_id = xxhash64(base) — content-addressed, deterministic, no global
    sequential counter (which would serialize at 10^12 scale). 64-bit
    collision odds at 10^9 distinct bases ~ 3e-2 per Birthday bound on the
    whole corpus — acceptable for dedup-metric purposes; the reconstruct
    path carries the base column itself so correctness never depends on id
    uniqueness.
    """
    with_id = chunks.withColumn("base_id", F.xxhash64("base"))
    bases = with_id.groupBy("base_id", "base").agg(F.count("*").alias("n_refs"))
    return bases, with_id


def gd_dedup_metrics(chunks: DataFrame, dict_size: int = 255, n: int = 128, k: int = 124) -> DataFrame:
    """Dedup-ratio metric replicating the reference's bit-cost accounting
    (`gd_byte_unit.rs:78-98`): first occurrence of a base costs
    1 + 8k + 8(n-k) bits, later occurrences cost 1 + id_bitlen + 8(n-k).

    Global (cross-conversation) dictionary semantics — the batch
    generalization of the reference's single-process dict; unbounded, so no
    LRU evictions (documented divergence, SURVEY.md §4.1).
    """
    id_bitlen = dict_size.bit_length()
    base_bits, dev_bits = 8 * k, 8 * (n - k)
    first = F.row_number().over(
        Window.partitionBy("base").orderBy("conv_id", "chunk_idx")
    )
    costed = chunks.withColumn("occ", first).withColumn(
        "bit_cost",
        F.when(F.col("occ") == 1, F.lit(1 + base_bits + dev_bits)).otherwise(
            F.lit(1 + id_bitlen + dev_bits)
        ),
    )
    return costed.agg(
        F.count("*").alias("n_chunks"),
        F.countDistinct("base").alias("n_distinct_bases"),
        (F.sum("bit_cost") / F.lit(8)).alias("deduped_bytes"),
        (F.count("*") * n).alias("orig_bytes"),
        (F.sum("bit_cost") / (F.count("*") * n * 8)).alias("dedup_ratio"),
    )


TURNS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def gd_reconstruct(
    chunks: DataFrame, n: int = 128, k: int = 124, precoding=None
) -> DataFrame:
    """Inverse of gd_decompose: re-encode chunks (applying T^-1 last when
    error alignment is installed, `rs/mod.rs:147-152`), reassemble
    conversations in chunk order, deserialize back to
    (conv_id, turn_idx, text) rows."""
    if precoding is not None:
        precoding = np.asarray(precoding, dtype=np.uint8).tolist()

    def run(group: pd.DataFrame) -> pd.DataFrame:
        code = _rs_cached(n, k, precoding)
        group = group.sort_values("chunk_idx")
        bases = np.frombuffer(b"".join(group["base"]), dtype=np.uint8).reshape(-1, k)
        devs = np.frombuffer(b"".join(group["deviation"]), dtype=np.uint8).reshape(
            -1, n - k
        )
        cw = code.encode(bases, devs)
        pad = int(group["last_chunk_pad"].iloc[-1])
        flat = cw.reshape(-1)
        if pad:
            flat = np.concatenate([cw[:-1].reshape(-1), cw[-1, pad:]])
        idxs, texts = deserialize_turns(flat.tobytes())
        return pd.DataFrame(
            {
                "conv_id": [group["conv_id"].iloc[0]] * len(texts),
                "turn_idx": np.asarray(idxs, dtype=np.int32),
                "text": texts,
            }
        )

    return chunks.groupBy("conv_id").applyInPandas(run, schema=TURNS_SCHEMA)
