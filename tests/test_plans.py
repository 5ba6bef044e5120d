"""Physical-plan regression pins for the scale-critical operators.

Each test asserts the plan PROPERTY that makes the operator viable at
100 TB — parquet filter/column pushdown, exchange counts, top-k window
pushdown, single Arrow evaluation — not the full plan text (which
churns across Spark versions). A refactor that silently reintroduces a
duplicate UDF evaluation, an extra shuffle, or a full-column scan fails
here before any bench run would notice."""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_filter_and_column_pushdown(spark, tmp_path):
    p = str(tmp_path / "docs")
    spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
        F.lit("en").alias("lang"),
        (F.col("id") % 3).alias("bucket"),
    ).write.parquet(p)
    df = (
        spark.read.parquet(p)
        .filter(F.col("bucket") == 1)
        .select("doc_id", "text")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(bucket), EqualTo(bucket,1)" in plan
    # column pruning: the scan schema carries only what the query needs
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema and "lang" not in read_schema


def test_tumbling_window_is_one_agg_exchange(spark, tmp_path):
    from rust_gd_spark.streaming_window import tumbling_event_stats

    p = str(tmp_path / "ev")
    spark.sql(
        "select id as event_id, timestamp'2024-01-01' + make_interval(0,0,0,0,0,0,id) as ts,"
        " id % 7 as user_id, 'click' as event_type, cast(id as double) as value,"
        " '{}' as props from range(1000)"
    ).write.parquet(p)
    # the exact-distinct n_users column legitimately needs a second
    # expand/exchange phase; the distinct-free rollup must be ONE exchange
    ev = spark.read.parquet(p)
    slim = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
    )
    assert _plan(slim).count("Exchange") == 1
    # and the full operator (with n_users) stays at two
    assert _plan(tumbling_event_stats(ev)).count("Exchange") == 2


def test_ivf_single_arrow_kernel_and_topk_window(spark):
    import numpy as np
    from rust_gd_spark.operators.embedding import cosine_topk_ivf

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cosine_topk_ivf(df, k=3, n_centroids=4, n_probe=2, train_rows=80)
    plan = _plan(out)
    # the scan kernel is ONE grouped Arrow stage; candidate pairs never
    # pass through a row-at-a-time UDF
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "ArrowEvalPython" not in plan.split("FlatMapGroupsInPandas")[0]
    # Spark's rank<=k pushdown keeps k rows per probe on both sides of
    # the final exchange
    assert "WindowGroupLimit" in plan


def test_asof_join_single_exchange_no_python(spark):
    import datetime as dt

    from rust_gd_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t0, 7)], "lid long, ts timestamp, user_id long"
    )
    right = spark.createDataFrame(
        [(7, t0, 9)], "user_id long, ts timestamp, rid long"
    )
    plan = _plan(asof_join(left, right, right_cols=["ts", "rid"]))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan  # pure codegen, no UDF anywhere


def test_exact_group_agg_is_partial(spark, tmp_path):
    """Map-side combine: the aggregation exchanges PARTIAL results, so
    shuffle volume is O(groups), not O(rows)."""
    p = str(tmp_path / "ev2")
    spark.sql(
        "select id % 5 as k, cast(id as double) as v from range(1000)"
    ).write.parquet(p)
    df = spark.read.parquet(p).groupBy("k").agg(F.sum("v").alias("s"))
    plan = _plan(df)
    map_side = plan.split("Exchange")[-1]  # the subtree below the shuffle
    assert "partial_sum" in map_side


def test_aqe_splits_planted_mega_key(spark):
    """The skew story the operator docstrings rely on (hot LSH buckets,
    mega IVF cells, hub users): a runtime-detected skewed partition is
    split by AQE, not ours to hand-shard. Thresholds are lowered to make
    a test-sized mega-key (50% of rows on one key) cross the skew bar;
    the final adaptive plan must carry the skew=true split marker."""
    overrides = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        left = spark.range(200000).select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("x" * 50), F.col("id")).alias("pay"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), F.col("id").alias("rv")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 200000
        plan = _plan(j)  # the SAME queryExecution collect() just ran
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketed_tables_join_with_zero_exchange(spark, tmp_path):
    """The co-located-join claim: two tables bucketed on the join key by
    the same bucket count sort-merge-join with NO Exchange at all —
    bucketing is the 100 TB lever for repeated joins on a stable key
    (dedup runs that re-join the same content-key store every batch)."""
    import uuid

    # unique names: a managed table's LOCATION survives a metastore reset,
    # so a fixed name collides with leftovers from earlier sessions
    ta, tb = f"bkt_a_{uuid.uuid4().hex[:8]}", f"bkt_b_{uuid.uuid4().hex[:8]}"
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.range(10000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("va")
        ).write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(ta)
        spark.range(5000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
        ).write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(tb)
        j = spark.table(ta).join(spark.table(tb), "k")
        assert j.count() == 5000
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert plan.count("Exchange") == 0
    finally:
        spark.sql(f"drop table if exists {ta}")
        spark.sql(f"drop table if exists {tb}")
        if saved is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_partitioned_write_prunes_scan(spark, tmp_path):
    """Hive-style partitioned layout + partition pruning: a filter on the
    partition column reaches the scan as a PartitionFilter, so untouched
    day-directories are never opened — the layout lever that bounds every
    incremental/backfill job by the days it touches, not corpus size."""
    p = str(tmp_path / "by_day")
    spark.sql(
        "select id, date_add(date'2024-01-01', cast(id % 7 as int)) as day,"
        " cast(id as double) as v from range(700)"
    ).write.partitionBy("day").parquet(p)
    df = spark.read.parquet(p).filter(F.col("day") == "2024-01-03").select("id", "v")
    plan = _plan(df)
    part_filters = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "2024-01-03" in part_filters
    # data filters list stays empty: nothing is re-checked row-wise
    assert df.count() == 100


def test_bloom_confirm_never_shuffles_corpus(spark, tmp_path):
    """The Bloom anti-join's exact-confirm path must keep the corpus on
    the STREAMED side of broadcast joins: the only shuffles in the final
    plan are the two small-side key distincts, and no sort-merge join
    (which would shuffle corpus keys) may appear."""
    from rust_gd_spark.operators.bloom import bloom_anti_join

    p = str(tmp_path / "bloom_corpus")
    spark.sql(
        "select id as doc_id, concat('text ', id % 400) as text from range(2000)"
    ).write.parquet(p)
    corpus = spark.read.parquet(p)
    batch = spark.sql(
        "select id + 100000 as doc_id, concat('text ', id % 600) as text"
        " from range(600)"
    )
    out = bloom_anti_join(batch, corpus, num_shards=4,
                          bits_per_shard=1 << 12, num_hashes=4)
    out.count()  # AQE: inspect the FINAL adaptive plan
    plan = _plan(out)
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # cand/matched distincts


def test_cdc_chunker_is_zero_shuffle(spark, tmp_path):
    """Content-defined chunking must stay a pure scan→project→generate
    chain: all cut/start/end arithmetic is Catalyst array expressions,
    so the ONLY acceptable plan has no Exchange at all. The chunk STORE
    is the canonical two-phase distinct-agg (partial on (hash, id) for
    n_docs, final on hash) — exactly two narrow exchanges, never
    more."""
    from rust_gd_spark.operators.cdc import cdc_chunk_store, cdc_chunks

    p = str(tmp_path / "cdc_docs")
    spark.sql(
        "select id as doc_id, concat('tok', id % 7, ' tok', id % 11,"
        " ' tok', id % 13, ' tok', id % 5) as text from range(500)"
    ).write.parquet(p)
    chunks = cdc_chunks(spark.read.parquet(p), "doc_id", "text", divisor=4)
    assert "Exchange" not in _plan(chunks)
    store = cdc_chunk_store(chunks)
    store.count()
    splan = _plan(store)
    assert splan.count("Exchange hashpartitioning") == 2
    # map-side combine before the exchange (partial_ aggregate modes)
    assert "partial_count" in splan or "partial" in splan.lower()


def test_training_shuffle_is_single_exchange(spark, tmp_path):
    """The deterministic shard shuffle must cost exactly one exchange
    (hash on shard) feeding the within-shard sort+row_number — never a
    global single-partition window."""
    from rust_gd_spark.operators.sampling import training_shuffle

    p = str(tmp_path / "shuffle_docs")
    spark.sql("select id as k from range(1000)").write.parquet(p)
    out = training_shuffle(spark.read.parquet(p), "k", n_shards=8, seed=3)
    plan = _plan(out)
    assert plan.count("Exchange hashpartitioning") == 1
    # NO SinglePartition exchange: the layout is shard-local by design
    assert "Exchange SinglePartition" not in plan


def test_conversation_dup_pairs_plan_is_agg_join_only(spark, tmp_path):
    """Conversation-level dedup must stay JVM-side: distinct turn-set
    agg (map-side combine), inverted-index equi-join, pair aggregate with
    partial modes — no Python evaluation anywhere, no nested-loop join
    (the band predicate is an exact hash equi-join by construction)."""
    from rust_gd_spark.operators.convdedup import conversation_dup_pairs

    p = str(tmp_path / "convs")
    spark.sql(
        "select concat('c', id % 20) as conv_id,"
        " cast(id div 20 as int) as turn_idx,"
        " concat('turn ', id % 37) as text from range(400)"
    ).write.parquet(p)
    pairs = conversation_dup_pairs(
        spark.read.parquet(p), threshold=0.2, measure="jaccard"
    )
    pairs.count()
    plan = _plan(pairs)
    assert "EvalPython" not in plan  # Batch/ArrowEvalPython both
    assert "NestedLoop" not in plan
    assert "partial" in plan.lower()  # map-side combine on the pair agg


def test_url_dedup_plan_is_codegen_agg_join(spark, tmp_path):
    """URL dedup must stay pure-JVM and window-free: the regexp
    canonicalization chain runs inside whole-stage codegen, grouping is
    a partial+final HashAggregate on the canonical key (AQE-splittable
    join back) — never a per-key Window, which would pin every copy of a
    hot crawler-trap URL into one task."""
    from rust_gd_spark.operators.urldedup import url_dup_groups

    p = str(tmp_path / "urls")
    spark.sql(
        "select id, concat('https://WWW.ex', id % 7,"
        " '.com:443/p?utm_x=', id, '#f') as url from range(300)"
    ).write.parquet(p)
    out = url_dup_groups(spark.read.parquet(p))
    out.collect()  # drive to the FINAL adaptive plan (codegen spans appear)
    plan = _plan(out)
    assert "EvalPython" not in plan
    assert "Window" not in plan
    assert "NestedLoop" not in plan
    assert "partial_min" in plan  # map-side combine on the group agg
    assert "*(1)" in plan  # canonicalization runs inside codegen stage 1


def test_dense_group_kernels_single_exchange(spark):
    """The CPU-dense per-conversation kernels (suffix-array repetition,
    GD round-trip) hash-repartition to the core count so AQE's byte-based
    coalescing cannot serialize them — and that explicit repartition must
    SATISFY the groupBy clustering, i.e. exactly one Exchange reaches the
    Arrow kernel, never a second one for the groupBy."""
    from rust_gd_spark.gd.spark import gd_conversation_roundtrip
    from rust_gd_spark.operators.suffixarray import conversation_repetition

    tr = spark.sql(
        "select concat('c', id % 5) as conv_id, cast(id div 5 as int) as"
        " turn_idx, concat('turn text ', id) as text from range(50)"
    )
    for df in (
        conversation_repetition(tr, k=8),
        gd_conversation_roundtrip(tr, kind="rs", dict_size=255, n=128, k=124),
    ):
        plan = _plan(df)
        assert plan.count("Exchange hashpartitioning") == 1
        assert "FlatMapGroupsInPandas" in plan
