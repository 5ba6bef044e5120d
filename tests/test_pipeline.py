"""End-to-end pipeline tests: cluster recall >= 0.99 vs a brute-force
oracle at identical config (BASELINE.json criterion), resume-from-
checkpoint, lineage/metrics shape."""

import os
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from rust_gd_spark.pipeline import (
    DedupConfig,
    dedup_metrics,
    near_dup_pipeline,
    reassemble_conversations,
    with_turn_uid,
)


@pytest.fixture(scope="module")
def turns_df(transcripts_df):
    return with_turn_uid(transcripts_df)


def _uf_clusters(nodes, pairs):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def _cluster_pairs(assign):
    from collections import defaultdict

    by = defaultdict(list)
    for n, c in assign.items():
        by[c].append(n)
    out = set()
    for mem in by.values():
        mem.sort()
        for i in range(len(mem)):
            for j in range(i + 1, len(mem)):
                out.add((mem[i], mem[j]))
    return out


def _py_shingles(text, w=5):
    toks = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split()
    if len(toks) < w:
        return frozenset({" ".join(toks)})
    return frozenset(" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1))


@pytest.fixture(scope="module")
def oracle_pairs(spark, turns_df, small_corpus):
    """Brute-force O(n²) duplicate pairs at the pipeline's config:
    exact text == | jaccard >= 0.7 | simhash hamming <= 3 | common
    substring >= 200. Independent of the pipeline's candidate generation
    (only gram hashing reuses Spark's xxhash64, by construction identical)."""
    from rust_gd_spark.operators import simhash as sh
    from rust_gd_spark.operators.substring import _rolling_hashes

    tr = small_corpus.transcripts
    uids = (tr.conv_id + ":" + tr.turn_idx.astype(str)).tolist()
    texts = tr.text.tolist()
    n = len(uids)

    pairs = set()
    # exact + jaccard
    sh_sets = [_py_shingles(t) for t in texts]
    # simhash fingerprints via the operator's gram hashes (Spark xxhash64)
    fp_rows = sh.simhash_fingerprints(
        sh.char_ngram_df(turns_df, "uid", "text", k=8)
    ).collect()
    fp = {r.id: np.uint64(r.fp & 0xFFFFFFFFFFFFFFFF) for r in fp_rows}
    # substring: 200-gram rolling hash posting lists
    from collections import defaultdict

    posting = defaultdict(set)
    for i, t in enumerate(texts):
        b = t.encode()
        if len(b) >= 200:
            for h in set(_rolling_hashes(b, 200).tolist()):
                posting[h].add(i)
    sub_cand = set()
    for ids in posting.values():
        ids = sorted(ids)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                sub_cand.add((ids[x], ids[y]))

    for i in range(n):
        for j in range(i + 1, n):
            dup = texts[i] == texts[j]
            if not dup:
                a, b = sh_sets[i], sh_sets[j]
                inter = len(a & b)
                if inter and inter / (len(a) + len(b) - inter) >= 0.7:
                    dup = True
            if not dup and bin(int(fp[uids[i]]) ^ int(fp[uids[j]])).count("1") <= 3:
                dup = True
            if not dup and (i, j) in sub_cand:
                dup = True
            if dup:
                pairs.add(tuple(sorted((uids[i], uids[j]))))
    return uids, pairs


def test_cluster_recall_vs_oracle(spark, turns_df, oracle_pairs, tmp_path):
    uids, exp_pairs = oracle_pairs
    res = near_dup_pipeline(turns_df, "uid", "text", DedupConfig())
    got = {r.id: r.cluster_id for r in res.clusters.collect()}
    assert set(got) == set(uids)

    exp_assign = _uf_clusters(uids, exp_pairs)
    exp_cluster_pairs = _cluster_pairs(exp_assign)
    got_cluster_pairs = _cluster_pairs(got)

    assert exp_cluster_pairs, "oracle must find duplicate pairs"
    recall = len(exp_cluster_pairs & got_cluster_pairs) / len(exp_cluster_pairs)
    assert recall >= 0.99, recall
    # precision guard: verified paths only, so spurious merges must be rare
    precision = len(exp_cluster_pairs & got_cluster_pairs) / len(got_cluster_pairs)
    assert precision >= 0.95, precision


def test_pipeline_metrics_and_lineage(spark, turns_df):
    res = near_dup_pipeline(turns_df, "uid", "text")
    stages = {r.stage for r in res.metrics.collect()}
    assert {"exact_groups", "shingles", "minhash_pairs", "simhash_pairs",
            "substring_pairs", "pairs", "clusters"} <= stages
    lin = res.lineage.groupBy("stage").agg(F.sum("rows").alias("rows")).collect()
    by_stage = {r.stage: r.rows for r in lin}
    n = turns_df.count()
    assert by_stage["clusters"] == n
    assert by_stage["exact_groups"] == n
    m = dedup_metrics(res.clusters).collect()[0]
    assert m.n_rows == n and 0 < m.n_clusters < n and 0 < m.dup_fraction < 1


def test_resume_from_checkpoint(spark, turns_df, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    r1 = near_dup_pipeline(turns_df, "uid", "text", checkpoint_dir=ckpt, run_id="r1")
    c1 = sorted((r.id, r.cluster_id) for r in r1.clusters.collect())
    assert not any(r.resumed for r in r1.metrics.collect())

    # delete the LAST two stage commits to simulate a mid-job kill
    import shutil

    for stage in ("pairs", "clusters"):
        shutil.rmtree(os.path.join(ckpt, "r1", stage))

    r2 = near_dup_pipeline(turns_df, "uid", "text", checkpoint_dir=ckpt, run_id="r1")
    c2 = sorted((r.id, r.cluster_id) for r in r2.clusters.collect())
    assert c1 == c2
    resumed = {r.stage: r.resumed for r in r2.metrics.collect()}
    assert resumed["shingles"] and resumed["minhash_pairs"]
    assert not resumed["pairs"] and not resumed["clusters"]


def test_conversation_reassembly_stable_order(spark, transcripts_df):
    conv = reassemble_conversations(transcripts_df)
    row = conv.filter(F.col("uid") == "conv-00000000").collect()[0]
    src = (
        transcripts_df.filter(F.col("conv_id") == "conv-00000000")
        .orderBy("turn_idx")
        .collect()
    )
    assert row.text == "\n".join(r.text for r in src)
    assert conv.count() == transcripts_df.select("conv_id").distinct().count()


def test_audits_populated_on_resume(spark, turns_df, tmp_path):
    ckpt = str(tmp_path / "ckpt_audit")
    r1 = near_dup_pipeline(turns_df, "uid", "text", checkpoint_dir=ckpt, run_id="ra")
    assert set(r1.audits) == {"lsh_skew", "simhash_skew", "substring_skew"}
    # fully-resumed run: audits must be read back from parquet, not empty
    r2 = near_dup_pipeline(turns_df, "uid", "text", checkpoint_dir=ckpt, run_id="ra")
    assert all(r.resumed for r in r2.metrics.collect())
    assert set(r2.audits) == {"lsh_skew", "simhash_skew", "substring_skew"}
    for name, adf in r2.audits.items():
        assert "bucket_size" in adf.columns and "action" in adf.columns, name
        adf.count()  # readable


def test_write_read_outputs_roundtrip(spark, turns_df, tmp_path):
    import json
    import os as _os

    from rust_gd_spark.pipeline import read_outputs, write_outputs

    out = str(tmp_path / "out")
    res = near_dup_pipeline(turns_df, "uid", "text")
    manifest = write_outputs(res, out, run_id="w1")
    assert set(manifest["tables"]) == {"clusters", "pairs", "metrics", "lineage"}
    assert _os.path.exists(_os.path.join(out, "w1", "manifest.json"))
    with open(_os.path.join(out, "w1", "manifest.json")) as fh:
        assert json.load(fh)["run_id"] == "w1"

    back = read_outputs(spark, out, run_id="w1")
    c1 = sorted((r.id, r.cluster_id) for r in res.clusters.collect())
    c2 = sorted((r.id, r.cluster_id) for r in back.clusters.collect())
    assert c1 == c2
    assert back.pairs.count() == res.pairs.count()
    assert set(back.audits) == set(res.audits)


def test_write_read_gd_outputs_roundtrip(spark, transcripts_df, tmp_path):
    from rust_gd_spark.gd.spark import gd_decompose, gd_reconstruct
    from rust_gd_spark.pipeline import read_gd_outputs, write_gd_outputs

    out = str(tmp_path / "gdout")
    convs = [r.conv_id for r in
             transcripts_df.select("conv_id").distinct().limit(5).collect()]
    tr = transcripts_df.filter(F.col("conv_id").isin(convs))
    chunks = gd_decompose(tr, n=128, k=124)
    write_gd_outputs(chunks, out, run_id="g1")
    restored = gd_reconstruct(read_gd_outputs(spark, out, run_id="g1"), n=128, k=124)
    orig = tr.select("conv_id", "turn_idx", "text")
    assert restored.exceptAll(orig).isEmpty()
    assert orig.exceptAll(restored).isEmpty()


def test_path_toggles_disable_stages(spark, turns_df):
    res = near_dup_pipeline(
        turns_df, "uid", "text",
        DedupConfig(enable_simhash=False, enable_substring=False),
    )
    stages = {r.stage for r in res.metrics.collect()}
    assert "simhash_pairs" not in stages and "substring_pairs" not in stages
    assert "minhash_pairs" in stages
    paths = {r.path for r in res.pairs.select("path").distinct().collect()}
    assert paths <= {"exact", "minhash"}


def test_simhash_rotation_mode_matches_banding(spark, turns_df):
    """simhash_mode='rotations' (Manku WWW'07) through the FULL pipeline
    must produce the same cluster partition as the banding mode at matched
    verify distance: banding guarantees candidates at d ≤ sim_bands−1 = 3,
    rotations co-bucket every pair at d ≤ 7 ⊇ 3, and at this corpus size
    prefix buckets are smaller than the sorted window so adjacency is
    exhaustive — both candidate sets then verify to the same d ≤ 3 pairs."""
    base = DedupConfig(enable_minhash=False, enable_substring=False)
    from dataclasses import replace

    res_band = near_dup_pipeline(turns_df, "uid", "text", base)
    res_rot = near_dup_pipeline(
        turns_df, "uid", "text", replace(base, simhash_mode="rotations")
    )

    def partition(df):
        by = {}
        for r in df.collect():
            by.setdefault(r.cluster_id, set()).add(r.id)
        return frozenset(frozenset(v) for v in by.values())

    assert partition(res_band.clusters) == partition(res_rot.clusters)
    # the rotation path really ran (stage present, pairs labeled simhash)
    assert "simhash_pairs" in {r.stage for r in res_rot.metrics.collect()}


def test_minhash_oph_scheme_matches_kperm(spark, turns_df):
    """minhash_scheme='oph' (densified one-permutation hashing) through the
    FULL pipeline must produce the same cluster partition as the k-perm
    kernel: both candidate generators have per-band miss probability ≪ 1
    on the fixture's high-margin near-dups, and the exact-Jaccard verify
    makes precision identical — so the verified edge set, hence the CC
    partition, coincides."""
    base = DedupConfig(enable_simhash=False, enable_substring=False)
    from dataclasses import replace

    res_kperm = near_dup_pipeline(turns_df, "uid", "text", base)
    res_oph = near_dup_pipeline(
        turns_df, "uid", "text", replace(base, minhash_scheme="oph")
    )

    def partition(df):
        by = {}
        for r in df.collect():
            by.setdefault(r.cluster_id, set()).add(r.id)
        return frozenset(frozenset(v) for v in by.values())

    assert partition(res_kperm.clusters) == partition(res_oph.clusters)
    assert "minhash_pairs" in {r.stage for r in res_oph.metrics.collect()}


def test_null_text_rows_survive(spark):
    """NULL text is in-contract (normalize_text coalesces NULL to '').
    md5(NULL) is NULL, and a null-unsafe equi-join on the content key
    silently dropped those rows from the clusters output — every input
    row must come back, NULL texts grouped with '' (one exact group)."""
    rows = [
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("b", None),
        ("c", "the quick brown fox jumps over the lazy dog"),
        ("d", None),
        ("e", ""),
    ]
    df = spark.createDataFrame(rows, "uid string, text string")
    res = near_dup_pipeline(df, "uid", "text", DedupConfig())
    got = {r.id: r.cluster_id for r in res.clusters.collect()}
    assert set(got) == {"a", "b", "c", "d", "e"}
    # NULL and '' share one content key (the NULL doctrine) → one cluster
    assert got["b"] == got["d"] == got["e"]
    assert got["a"] == got["c"]


def test_canonical_clusters_relabel(spark, turns_df):
    from rust_gd_spark.pipeline import canonical_clusters

    res = near_dup_pipeline(turns_df, "uid", "text")
    canon = canonical_clusters(res.clusters)
    rows = canon.collect()
    by = {}
    for r in rows:
        by.setdefault(r.cluster_id, []).append(r.id)
    for label, members in by.items():
        assert label == min(members)
    # same partition as the raw labels
    raw = {r.id: r.cluster_id for r in res.clusters.collect()}
    canon_map = {r.id: r.cluster_id for r in rows}
    import itertools as _it

    sample = list(raw)[:200]
    for a, b in _it.combinations(sample, 2):
        assert (raw[a] == raw[b]) == (canon_map[a] == canon_map[b])


def test_cluster_representatives_semantics(spark):
    from rust_gd_spark.pipeline import cluster_representatives

    # hand-built clusters: c1 = {a,b,c} (b longest), c2 = tie on length
    # (d vs e, both 2 bytes → smallest id wins), c3 = NULL-text singleton
    clusters = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "d"),
         ("f", "f")],
        "id string, cluster_id string",
    )
    src = spark.createDataFrame(
        [("a", "xx"), ("b", "xxxx"), ("c", "x"), ("d", "yy"), ("e", "zz"),
         ("f", None)],
        "uid string, text string",
    )
    out = {
        r.cluster_id: r
        for r in cluster_representatives(clusters, src, "uid", "text").collect()
    }
    assert out["a"].rep_id == "b" and out["a"].kept_bytes == 4
    assert out["a"].cluster_size == 3 and out["a"].total_bytes == 7
    assert out["d"].rep_id == "d"  # tie → smallest id
    assert out["f"].rep_id == "f" and out["f"].kept_bytes == 0


def test_cluster_representatives_pipeline(spark, turns_df):
    from rust_gd_spark.pipeline import canonical_clusters, cluster_representatives

    res = near_dup_pipeline(turns_df, "uid", "text")
    canon = canonical_clusters(res.clusters)
    reps = cluster_representatives(canon, turns_df, "uid", "text")
    # every cluster gets exactly one rep; sizes sum to the corpus
    n_rows = turns_df.count()
    rows = reps.collect()
    assert sum(r.cluster_size for r in rows) == n_rows
    assert len({r.cluster_id for r in rows}) == len(rows)
    # rep is a member and kept_bytes <= total_bytes
    members = {r.id: r.cluster_id for r in canon.collect()}
    for r in rows:
        assert members[r.rep_id] == r.cluster_id
        assert 0 <= r.kept_bytes <= r.total_bytes
