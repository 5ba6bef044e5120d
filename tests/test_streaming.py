"""Incremental (streaming) dedup: per-batch state evolution, a real
Structured Streaming run over a file source, and compaction equivalence
with the batch pipeline at matched config."""

import pytest
from pyspark.sql import functions as F

from rust_gd_spark import streaming as st
from rust_gd_spark.pipeline import DedupConfig, near_dup_pipeline, with_turn_uid


def _clusters_as_partition(df):
    """cluster assignment -> frozenset of frozensets (label-free)."""
    rows = df.collect()
    by = {}
    for r in rows:
        by.setdefault(r.cluster_id, set()).add(r.id)
    return frozenset(frozenset(v) for v in by.values())


@pytest.fixture()
def turn_batches(small_corpus):
    """The fixture corpus split into three row-disjoint batches."""
    pdf = small_corpus.transcripts
    n = len(pdf)
    return [pdf.iloc[: n // 3], pdf.iloc[n // 3 : 2 * n // 3], pdf.iloc[2 * n // 3 :]]


def test_incremental_matches_batch_pipeline(spark, small_corpus, turn_batches, tmp_path):
    state = str(tmp_path / "state")
    for part in turn_batches:
        df = with_turn_uid(
            spark.createDataFrame(part[["conv_id", "turn_idx", "text"]])
        ).select("uid", "text")
        st.process_batch(df, state, threshold=0.7)

    inc = st.compact_clusters(spark, state)

    full = with_turn_uid(
        spark.createDataFrame(
            small_corpus.transcripts[["conv_id", "turn_idx", "text"]]
        )
    )
    # matched config: exact + minhash only (the incremental path's scope)
    res = near_dup_pipeline(
        full, "uid", "text",
        DedupConfig(
            jaccard_threshold=0.7, enable_simhash=False, enable_substring=False,
            neighbor_window=None,
        ),
    )
    assert _clusters_as_partition(inc) == _clusters_as_partition(res.clusters)


def test_incremental_state_counters(spark, turn_batches, tmp_path):
    """Exact dups arriving in a later batch must attach to the EARLIER
    batch's canonical id, and their content keys must not re-enter the
    store."""
    state = str(tmp_path / "state")
    df0 = with_turn_uid(
        spark.createDataFrame(turn_batches[0][["conv_id", "turn_idx", "text"]])
    ).select("uid", "text")
    c0 = st.process_batch(df0, state)
    # replay batch 0 verbatim: zero new keys, zero new edges
    c_replay = st.process_batch(df0, state)
    assert c_replay["rows"] == c0["rows"]
    assert c_replay["new_keys"] == 0
    assigns = spark.read.parquet(f"{state}/assignments")
    # every replayed row resolves to the original canonical (one per key)
    keys = spark.read.parquet(f"{state}/content_keys")
    assert keys.groupBy("content_key").count().filter("count > 1").count() == 0
    assert assigns.filter(F.col("canonical_id").isNull()).count() == 0


def test_streaming_file_source_end_to_end(spark, turn_batches, tmp_path):
    """A real readStream over a file source with availableNow triggers:
    files appearing across two runs are both absorbed; state persists."""
    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    schema = "conv_id string, turn_idx int, text string"

    def write_batch(i):
        spark.createDataFrame(
            turn_batches[i][["conv_id", "turn_idx", "text"]]
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"b{i}"))

    def run_stream():
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "*.parquet")
            .parquet(str(src / "*"))
        )
        q = st.incremental_dedup_stream(stream, state, ckpt)
        q.awaitTermination(120)

    write_batch(0)
    run_stream()
    n0 = spark.read.parquet(f"{state}/assignments").count()
    assert n0 == len(turn_batches[0])

    write_batch(1)
    run_stream()  # restart: only the new files are processed
    total = spark.read.parquet(f"{state}/assignments").count()
    assert total == len(turn_batches[0]) + len(turn_batches[1])

    inc = st.compact_clusters(spark, state)
    assert inc.count() == total
    assert inc.select("id").distinct().count() == total
