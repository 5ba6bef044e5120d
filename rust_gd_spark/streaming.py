"""Incremental near-duplicate detection over a transcript stream.

SURVEY.md §2 declared streaming out of scope for the reference (it has
none) — but a production transcript corpus is APPEND-ONLY, and the
reference's own CLI is incremental at heart: the dictionary persists across
512 KiB blocks so later blocks dedup against everything seen before
(`examples/main.rs:36-61`, SURVEY.md A31). This module is the Spark
analogue: Structured Streaming ``foreachBatch`` where the cross-block
dictionary state is a set of persisted parquet stores.

Design (scale-first):

* **State = three append-only parquet stores** under ``state_dir``:
  ``content_keys(content_key, canonical_id)`` — the exact-dup dictionary;
  ``bands(band_idx, band_hash, id)`` — the LSH postings of every rep seen;
  ``shingles(id, shingles)`` — verify-side shingle sets of every rep.
  Appending parquet per micro-batch is the sandbox stand-in for Iceberg
  appends (same layout the batch pipeline uses for checkpoints).
* **Per micro-batch**: exact-dedup the batch against the content-key store
  (new key → the batch's min uid becomes canonical); for new reps, compute
  shingles + fused band hashes with the SAME kernels as the batch pipeline
  (identical config ⇒ identical candidate semantics); candidate pairs =
  in-batch bucket pairs ∪ batch-vs-history band joins; exact-Jaccard
  verify against the shingle store; emit ``(id_l, id_r, path, score)``
  edges to ``edges/``.
* **Assignments are eventually-exact**: per-batch output assigns each row
  its exact-dup canonical; cluster structure over near-dup edges is
  recovered by ``compact_clusters`` — a batch connected-components job
  over the accumulated edge log (the same large-star/small-star operator
  the batch pipeline uses). Incremental CC with in-stream merges would
  force a mutable cluster map (a global synchronization point at 10^12
  scale); an append-only edge log + periodic compaction keeps every
  micro-batch embarrassingly parallel and gives bit-identical clusters to
  the batch pipeline on the same input (pinned by test).

Restart/resume: all state is on disk; the streaming checkpoint dir
(Spark's own) plus these stores make the job resumable after loss — the
same contract as the batch pipeline's stage checkpoints (§4.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from .operators import exactdup, minhash
from .operators.components import assign_clusters


def _store_path(state_dir: str, name: str) -> str:
    return os.path.join(state_dir, name)


def _read_store(spark, state_dir: str, name: str, schema: str) -> DataFrame:
    path = _store_path(state_dir, name)
    try:
        return spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], schema)


def process_batch(
    batch_df: DataFrame,
    state_dir: str,
    w: int = 5,
    num_perm: int = 128,
    bands: int = 32,
    rows: int = 4,
    threshold: float = 0.7,
    max_bucket_size: int = 2000,
    seed: int = 1,
) -> dict:
    """One micro-batch of incremental dedup. ``batch_df`` must carry
    ``(uid, text)``. Returns counters (for tests/monitoring); appends to
    the state stores and the ``edges``/``assignments`` logs.
    """
    spark = batch_df.sparkSession
    batch = batch_df.select("uid", "text").localCheckpoint(eager=True)

    # --- exact path vs history ------------------------------------------
    keyed = batch.select("uid", F.md5("text").alias("content_key"))
    store_keys = _read_store(
        spark, state_dir, "content_keys", "content_key string, canonical_id string"
    )
    batch_min = keyed.groupBy("content_key").agg(F.min("uid").alias("batch_min"))
    merged = batch_min.join(store_keys, "content_key", "left")
    new_keys = merged.filter(F.col("canonical_id").isNull()).select(
        "content_key", F.col("batch_min").alias("canonical_id")
    ).localCheckpoint(eager=True)
    canon = merged.select(
        "content_key",
        F.coalesce("canonical_id", "batch_min").alias("canonical_id"),
    )
    assignments = keyed.join(canon, "content_key").select(
        "uid", "canonical_id", F.lit("exact").alias("path")
    )

    # --- near-dup path: new reps only -----------------------------------
    # one rep per NEW content key (history reps are already in the stores)
    reps = (
        keyed.join(new_keys.select("content_key", "canonical_id"), "content_key")
        .filter(F.col("uid") == F.col("canonical_id"))
        .join(batch, "uid")
        .select("uid", "text")
    )
    sh = minhash.shingle_df(reps, "uid", "text", w=w).localCheckpoint(eager=True)
    bh = minhash.minhash_band_hashes(sh, num_perm, bands, rows, seed)
    banded = minhash.explode_band_hashes(bh).localCheckpoint(eager=True)

    # in-batch candidates: one-shuffle bucket pairs
    new_pairs, _ = minhash.lsh_candidate_pairs(
        banded, max_bucket_size=max_bucket_size
    )
    # batch-vs-history candidates: equi-join new postings against the store
    band_store = _read_store(
        spark, state_dir, "bands", "band_idx int, band_hash long, id string"
    )
    hist_pairs = (
        banded.join(
            band_store.withColumnRenamed("id", "hist_id"),
            ["band_idx", "band_hash"],
        )
        .select(
            F.least("id", "hist_id").alias("id_l"),
            F.greatest("id", "hist_id").alias("id_r"),
        )
        .filter(F.col("id_l") != F.col("id_r"))
        .dropDuplicates(["id_l", "id_r"])
    )
    cand = new_pairs.select("id_l", "id_r").unionByName(hist_pairs)

    # verify against batch + historical shingles
    shingle_store = _read_store(
        spark, state_dir, "shingles", "id string, shingles array<long>"
    )
    all_sh = sh.select(F.col("id"), "shingles").unionByName(shingle_store)
    verified = minhash.verify_jaccard(cand, all_sh, threshold=threshold)
    edges = verified.select(
        "id_l", "id_r", F.lit("minhash").alias("path"),
        F.col("jaccard").alias("score"),
    ).localCheckpoint(eager=True)

    # --- persist ---------------------------------------------------------
    counters = {
        "rows": batch.count(),
        "new_keys": new_keys.count(),
        "edges": edges.count(),
    }
    new_keys.write.mode("append").parquet(_store_path(state_dir, "content_keys"))
    banded.select("band_idx", "band_hash", F.col("id")).write.mode("append").parquet(
        _store_path(state_dir, "bands")
    )
    sh.write.mode("append").parquet(_store_path(state_dir, "shingles"))
    edges.write.mode("append").parquet(_store_path(state_dir, "edges"))
    assignments.write.mode("append").parquet(_store_path(state_dir, "assignments"))
    return counters


def incremental_dedup_stream(
    transcripts_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    **kwargs,
):
    """Wire ``process_batch`` into a Structured Streaming query.

    ``transcripts_stream`` is a streaming DataFrame with the input_hint
    schema; rows get the stable per-turn uid and flow through
    ``process_batch`` per micro-batch. Returns the started query.
    """
    from .pipeline import with_turn_uid

    def _each(batch_df, epoch_id):  # pragma: no cover - thin driver glue
        process_batch(with_turn_uid(batch_df), state_dir, **kwargs)

    writer = (
        transcripts_stream.writeStream.foreachBatch(_each)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_clusters(spark, state_dir: str) -> DataFrame:
    """Batch compaction: exact clusters over everything streamed so far.

    Exact-dup stars (from ``assignments``) ∪ near-dup edges (from
    ``edges``) → the SAME large-star/small-star CC the batch pipeline
    uses → ``(id, cluster_id)`` for every streamed row. Run periodically
    (or on demand); equivalent to re-running the batch pipeline on the
    union of all micro-batches at identical config.
    """
    assigns = spark.read.parquet(_store_path(state_dir, "assignments"))
    exact_edges = assigns.filter(F.col("uid") != F.col("canonical_id")).select(
        F.col("canonical_id").alias("id_l"), F.col("uid").alias("id_r")
    )
    near = _read_store(
        spark, state_dir, "edges",
        "id_l string, id_r string, path string, score double",
    ).select("id_l", "id_r")
    edges = exact_edges.unionByName(near).dropDuplicates(["id_l", "id_r"])
    ids = assigns.select(F.col("uid").alias("id")).dropDuplicates(["id"])
    return assign_clusters(ids, edges, "id")
