"""Stateful streaming exact-dedup via ``applyInPandasWithState``.

`streaming.py` implements the full incremental NEAR-dup pipeline with
disk-backed parquet stores (Iceberg stand-ins) — the right shape when
state is corpus-sized. This module covers the other Structured-Streaming
state surface: Spark's OWN managed per-key state
(``applyInPandasWithState``), which is the right shape when state is a
bounded per-key record and you want Spark's checkpointing, watermark
eviction, and exactly-once semantics to own it.

The operator is the reference dictionary, stream-form
(`src/dict.rs:38-63` → SURVEY.md A17/A18): the first arrival of a
content key is the dictionary INSERT (it becomes the canonical id —
"base"); every later arrival is a PROBE hit (a duplicate — "deviation"),
tagged with the canonical it deduplicates against and its duplicate
rank. ``ttl_ms`` maps to the reference's LRU bound (`src/dict.rs:50-63`):
a key idle past the TTL is evicted by Spark's state timeout, and a
re-arrival becomes a fresh canonical — exactly like a re-inserted LRU
entry getting a new id.

Scale notes: state per key is 16 bytes (canonical id + count); keys
shard across executors by groupBy hash — the managed-state analogue of
the content-key store, with no history join at all. The md5-of-
coalesced-text key follows the engine-wide NULL doctrine
(`streaming.py`, `exactdup.py`).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("content_key", T.StringType()),
        T.StructField("canonical_id", T.LongType()),
        T.StructField("is_dup", T.BooleanType()),
        T.StructField("dup_rank", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("canonical_id", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def streaming_exact_dedup(
    stream_df: DataFrame,
    id_col: str = "uid",
    text_col: str = "text",
    ttl_ms: int | None = None,
) -> DataFrame:
    """``(id, content_key, canonical_id, is_dup, dup_rank)`` per input row.

    ``stream_df`` must be a streaming DataFrame. ``id_col`` values are
    hashed to int64 node keys (``xxhash64``, the batch pipeline's id
    doctrine) so state stays fixed-width. Within one micro-batch the
    smallest id of a new key becomes canonical (deterministic — matches
    ``exact_dup_groups``'s min-id rule); across micro-batches the stored
    canonical wins. ``ttl_ms`` enables processing-time state eviction
    (the LRU analogue); ``None`` keeps state forever.
    """
    keyed = stream_df.select(
        F.xxhash64(F.col(id_col).cast("string")).alias("id"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("content_key"),
    )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def dedup_fn(
        key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # LRU eviction: drop the key's dictionary entry; the next
            # arrival re-inserts as a fresh canonical.
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        ids = batch["id"].sort_values().to_numpy()
        if state.exists:
            canonical, n_seen = state.get
        else:
            canonical, n_seen = int(ids[0]), 0
        ranks = n_seen + pd.RangeIndex(1, len(ids) + 1).to_numpy()
        state.update((int(canonical), int(n_seen + len(ids))))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "id": ids,
                "content_key": key[0],
                "canonical_id": int(canonical),
                "is_dup": [int(i) != int(canonical) for i in ids],
                "dup_rank": ranks,
            }
        )

    return keyed.groupBy("content_key").applyInPandasWithState(
        dedup_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def run_over_file_stream(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    id_col: str = "uid",
    text_col: str = "text",
    schema: T.StructType | None = None,
    ttl_ms: int | None = None,
    sink_table: str = "exact_dedup_state_sink",
) -> Any:
    """Convenience harness: parquet-file stream → ``streaming_exact_dedup``
    → in-memory sink. Returns the started ``StreamingQuery``; call
    ``processAllAvailable()`` then read ``spark.table(sink_table)``.
    Parquet-dir micro-batches are the sandbox stand-in for a Kafka/Iceberg
    CDC source — same code path either way.
    """
    if schema is None:
        schema = T.StructType(
            [
                T.StructField(id_col, T.StringType()),
                T.StructField(text_col, T.StringType()),
            ]
        )
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    out = streaming_exact_dedup(src, id_col, text_col, ttl_ms=ttl_ms)
    return (
        out.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
