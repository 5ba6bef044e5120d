"""training_data_prep composite + embedding_dedup_clusters tests."""

from pyspark.sql import functions as F

from rust_gd_spark.pipeline import DedupConfig
from rust_gd_spark.prep import training_data_prep


GOOD = (
    "The quick brown fox jumps over the lazy dog while the careful "
    "researcher measures throughput, latency, and shuffle volume across "
    "every stage of the distributed pipeline before drawing conclusions."
)
GOOD_NEAR = (
    "The quick brown fox jumps over the lazy dog while the careful "
    "researcher measures throughput, latency, and shuffle volume across "
    "every stage of the distributed pipeline before drawing any conclusion."
)
BENCH = (
    "What is the capital of France? Paris is the capital and largest city "
    "of France, situated on the Seine river in the north of the country."
)
JUNK = "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) ____ ++++ ===="


def _prep(spark, rows, ref_rows, **kw):
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    ref = spark.createDataFrame(ref_rows, ["doc_id", "text"])
    kw.setdefault(
        "cfg",
        DedupConfig(
            jaccard_threshold=0.5, min_substring_len=120,
            enable_simhash=False, neighbor_window=None,
        ),
    )
    return training_data_prep(docs, ref, "doc_id", "text", **kw).collect()


def test_gates_and_survivorship(spark):
    rows = [
        (1, GOOD),          # kept, clusters with 2
        (2, GOOD_NEAR),     # near-dup of 1 (J >= 0.5, shared 120-byte prefix)
        (3, GOOD),          # exact dup of 1
        (4, BENCH),         # contaminated (verbatim benchmark copy)
        (5, JUNK),          # quality-gated
        (6, "An entirely unrelated but perfectly reasonable document about "
            "gardening, compost ratios, and the patience required to grow "
            "tomatoes in a short northern season without a greenhouse."),
    ]
    out = _prep(spark, rows, [(100, BENCH)], quality_min=0.5)
    by_cluster = {r.cluster_id: r for r in out}
    # docs 1,2,3 form one cluster; doc 6 is a singleton; 4 and 5 are gone
    assert set(by_cluster) == {1, 6}
    c = by_cluster[1]
    assert c.cluster_size == 3
    # rep = longest text (GOOD_NEAR ends in "any conclusion." — 1 byte longer)
    assert c.rep_id == 2
    assert c.kept_bytes == len(GOOD_NEAR.encode())
    assert c.total_bytes == 2 * len(GOOD.encode()) + len(GOOD_NEAR.encode())
    assert by_cluster[6].cluster_size == 1
    assert 0.0 <= c.rep_quality <= 1.0


def test_quality_gate_boundary_uses_rounded_score(spark):
    # everything passes decontam (empty-overlap ref); quality_min high
    # enough to drop JUNK but keep prose
    rows = [(1, GOOD), (2, JUNK)]
    out = _prep(spark, rows, [(100, "zz yy xx ww vv uu tt ss rr qq")],
                quality_min=0.5)
    assert {r.rep_id for r in out} == {1}


def test_contaminated_near_dup_still_dropped(spark):
    # a lightly edited benchmark copy shares >= 50% of its 5-grams with it
    bench_near = BENCH.replace("largest city", "biggest city")
    rows = [(1, GOOD), (2, bench_near)]
    out = _prep(spark, rows, [(100, BENCH)], quality_min=0.3)
    assert {r.rep_id for r in out} == {1}


def test_embedding_dedup_clusters_planted(spark):
    import numpy as np

    from rust_gd_spark.operators.embedding import embedding_dedup_clusters

    rng = np.random.default_rng(11)
    base = rng.normal(size=(4, 32))
    rows = []
    # 3 planted near-identical copies of vector 0 (ids 0,1,2), distinct rest
    for i in range(3):
        rows.append((i, (base[0] + 0.01 * rng.normal(size=32)).tolist()))
    for j in range(1, 4):
        rows.append((j + 10, base[j].tolist()))
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = embedding_dedup_clusters(
        e, "vec_id", "embedding", threshold=0.95, block_rows=2
    ).collect()
    lab = {r.id: r.cluster_id for r in out}
    assert len(lab) == 6
    assert lab[0] == lab[1] == lab[2] == 0  # min member id
    singles = {lab[j] for j in (11, 12, 13)}
    assert singles == {11, 12, 13}
