"""applyInPandasWithState exact-dedup tests: cross-batch dictionary
semantics (probe/insert, A17/A18 stream-form) under Spark-managed state."""

from pyspark.sql import functions as F

from rust_gd_spark import streaming_state as ss


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, ["uid", "text"]).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_cross_batch_dedup_state(spark, tmp_path):
    """A key first seen in batch 1 must canonicalize batch-2 arrivals via
    Spark-managed state — no external store involved."""
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(
        spark,
        src,
        [("a1", "hello world"), ("b1", "other text"), ("a2", "hello world")],
    )
    q = ss.run_over_file_stream(spark, src, ckpt, sink_table="sink_t1")
    try:
        q.processAllAvailable()
        _write_batch(
            spark, src, [("a3", "hello world"), ("c1", None), ("c2", "")]
        )
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table("sink_t1").toPandas()
    key_of = {}
    for _, r in out.iterrows():
        key_of[r["id"]] = r
    # map back: recompute the hashed ids
    hashed = {
        u: spark.range(1).select(F.xxhash64(F.lit(u))).collect()[0][0]
        for u in ["a1", "a2", "a3", "b1", "c1", "c2"]
    }
    rows = {u: key_of[hashed[u]] for u in hashed}
    # hello-world group: canonical = min(hash(a1), hash(a2)) from batch 1,
    # and a3 (batch 2) must join THAT canonical, not start its own
    canon_hello = min(hashed["a1"], hashed["a2"])
    assert rows["a1"]["canonical_id"] == canon_hello
    assert rows["a3"]["canonical_id"] == canon_hello
    assert bool(rows["a3"]["is_dup"]) is True
    assert int(rows["a3"]["dup_rank"]) == 3
    assert bool(rows["b1"]["is_dup"]) is False
    # NULL doctrine: NULL text and '' share one key
    assert rows["c1"]["content_key"] == rows["c2"]["content_key"]
    assert rows["c1"]["canonical_id"] == rows["c2"]["canonical_id"]
    # exactly one non-dup (the canonical) per content key
    grp = out.groupby("content_key")["is_dup"].agg(["sum", "count"])
    assert ((grp["count"] - grp["sum"]) == 1).all()


def test_single_batch_min_id_canonical(spark, tmp_path):
    """Within one micro-batch the smallest hashed id wins — the
    exact_dup_groups min-id rule, stream-form."""
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(
        spark, src, [(u, "same text") for u in ["x1", "x2", "x3", "x4"]]
    )
    q = ss.run_over_file_stream(spark, src, ckpt, sink_table="sink_t2")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table("sink_t2").toPandas()
    assert len(out) == 4
    assert out["canonical_id"].nunique() == 1
    assert out["canonical_id"].iloc[0] == out["id"].min()
    assert sorted(out["dup_rank"]) == [1, 2, 3, 4]
