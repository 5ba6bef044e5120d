"""Embedding similarity-search tests: exact brute-force vs numpy oracle;
hyperplane-LSH near-dup recall on planted duplicates."""

import numpy as np
import pytest
from pyspark.sql import functions as F, types as T

from rust_gd_spark.operators import embedding as emb


def _make_df(spark, M, ids=None):
    ids = ids if ids is not None else list(range(len(M)))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    return spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in zip(ids, M)], schema
    )


@pytest.fixture(scope="module")
def planted(spark):
    """200 random 32-d vectors + 30 planted near-dups (cosine >= ~0.95)."""
    rng = np.random.default_rng(9)
    base = rng.standard_normal((200, 32))
    dups, pairs = [], []
    for j in range(30):
        src = j * 5
        noisy = base[src] + 0.12 * rng.standard_normal(32)
        dups.append(noisy)
        pairs.append((src, 200 + j))
    M = np.vstack([base, np.array(dups)])
    return _make_df(spark, M), M, pairs


def test_bruteforce_topk_matches_numpy(spark, planted):
    df, M, _ = planted
    got = emb.cosine_topk_bruteforce(df, k=3).collect()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    # float32 ingestion: recompute from the stored float values
    stored = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in df.collect()}
    ids = sorted(stored)
    Mn = np.stack([stored[i] for i in ids])
    Mn = Mn / np.linalg.norm(Mn, axis=1, keepdims=True)
    S = np.round(Mn @ Mn.T, 6)
    np.fill_diagonal(S, -2)
    by_id = {}
    for r in got:
        by_id.setdefault(r.id, []).append((r.rank, r.neighbor_id, r.cosine))
    for vid, rows in by_id.items():
        rows.sort()
        i = ids.index(vid)
        order = sorted(range(len(ids)), key=lambda j: (-S[i, j], ids[j]))[:3]
        exp = [(ids[j], S[i, j]) for j in order]
        assert [(n, c) for _, n, c in rows] == [(n, pytest.approx(c, abs=2e-6)) for n, c in exp], vid


def test_lsh_near_dup_recall_on_planted(spark, planted):
    df, M, pairs = planted
    got = {(r.id_l, r.id_r) for r in emb.embedding_near_dup_pairs(df, threshold=0.9).collect()}
    exp = {tuple(sorted(p)) for p in pairs}
    # drop planted pairs whose actual cosine landed below 0.9
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    exp = {p for p in exp if Mn[p[0]] @ Mn[p[1]] >= 0.901}
    assert len(exp) >= 20
    recall = len(got & exp) / len(exp)
    assert recall >= 0.9, recall
    # precision is exact by construction (verified cosine)
    for l, r in got:
        assert round(float(Mn[l] @ Mn[r]), 4) >= 0.8999


def test_lsh_topk_subset_of_bruteforce_candidates(spark, planted):
    df, _, _ = planted
    lsh = emb.cosine_topk_lsh(df, k=3).collect()
    brute = emb.cosine_topk_bruteforce(df, k=3).collect()
    bmap = {(r.id, r.neighbor_id): r.cosine for r in brute}
    # every LSH hit reports the true cosine
    whole = {(r.id, r.neighbor_id): r.cosine for r in lsh}
    sims_brute = emb.cosine_topk_bruteforce(df, k=250).collect()
    full = {(r.id, r.neighbor_id): r.cosine for r in sims_brute}
    for key, c in list(whole.items())[:200]:
        assert key in full and abs(full[key] - c) < 1e-6
    # rank-1 planted neighbors must be found
    hit = sum(1 for (i, n), c in whole.items() if c >= 0.9)
    assert hit >= 30


def test_signature_determinism(spark, planted):
    df, _, _ = planted
    a = {r.id: r.fp for r in emb.hyperplane_signatures(df, seed=7).collect()}
    b = {r.id: r.fp for r in emb.hyperplane_signatures(df, seed=7).collect()}
    c = {r.id: r.fp for r in emb.hyperplane_signatures(df, seed=8).collect()}
    assert a == b
    assert a != c


def test_bruteforce_guard_raises_on_oversized_ref(spark, planted):
    df, _, _ = planted
    with pytest.raises(ValueError, match="max_ref_rows"):
        emb.cosine_topk_bruteforce(df, k=3, max_ref_rows=10)
    with pytest.raises(ValueError, match="max_ref_rows"):
        emb.cosine_pairs_bruteforce(df, threshold=0.9, max_ref_rows=10)


def test_bruteforce_query_df_restricts_neighbors(spark, planted):
    df, _, _ = planted
    q = df.filter("vec_id < 10")
    got = emb.cosine_topk_bruteforce(df, k=3, query_df=q).collect()
    assert {r.neighbor_id for r in got} <= set(range(10))
    assert all(r.id != r.neighbor_id for r in got)


def test_candidate_pairs_one_shuffle_and_audit(spark, planted):
    df, _, _ = planted
    sigs = emb.hyperplane_signatures(df, nbits=64, seed=7)
    pairs, audit = emb.embedding_candidate_pairs(sigs, nbits=64, bands=8,
                                                 max_bucket_size=3)
    # audit reports oversized buckets with the shared schema
    cols = set(audit.columns)
    assert {"band_idx", "band_val", "bucket_size", "action"} <= cols
    # physical plan: no Window operator in candidate generation
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_multiword_signatures_roundtrip(spark, planted):
    df, M, _ = planted
    rows = emb.hyperplane_signatures(df, nbits=256, seed=7).collect()
    assert all(len(r.fp) == 4 for r in rows)
    # matches the reference numpy computation bit-for-bit
    import numpy as _np

    stored = {r.vec_id: _np.array(r.embedding, dtype=_np.float64)
              for r in df.collect()}
    rng = _np.random.default_rng(7)
    planes = rng.standard_normal((32, 256))
    for r in rows[:20]:
        v = stored[r.id]
        v = v / _np.linalg.norm(v)
        bits = (v @ planes) >= 0
        words = []
        for w in range(4):
            x = 0
            for j in range(64):
                if bits[w * 64 + j]:
                    x |= 1 << j
            words.append(x - (1 << 64) if x >= (1 << 63) else x)
        assert list(r.fp) == words, r.id


def test_prefilter_cutoff_monotone():
    assert emb.prefilter_hamming_cutoff(0.9, 64) < emb.prefilter_hamming_cutoff(0.5, 64)
    assert emb.prefilter_hamming_cutoff(0.9, 64) >= 9   # >= mean bits
    assert emb.prefilter_hamming_cutoff(0.35, 256) <= 256


def test_ivf_exhaustive_probe_matches_bruteforce(spark, planted):
    """n_probe >= n_centroids probes every cell — the IVF plumbing
    (train, assign, cell join, verify, rank) must reproduce the exact
    brute-force top-k bit-for-bit."""
    df, _, _ = planted
    exact = sorted(
        (r.id, r.rank, r.neighbor_id, r.cosine)
        for r in emb.cosine_topk_bruteforce(df, k=3).collect()
    )
    ivf = sorted(
        (r.id, r.rank, r.neighbor_id, r.cosine)
        for r in emb.cosine_topk_ivf(
            df, k=3, n_centroids=8, n_probe=8, train_rows=500
        ).collect()
    )
    assert ivf == exact


def test_ivf_pruned_recall_and_planted_pairs(spark, planted):
    """Pruned probing (n_probe=4 of 8 cells): overall top-1 recall vs
    brute force stays high, and every planted near-dup (cosine ≥ .95,
    i.e. nearly colinear — same home cell with margin) is found."""
    df, _, pairs = planted
    exact1 = {
        r.id: r.neighbor_id
        for r in emb.cosine_topk_bruteforce(df, k=1).collect()
    }
    got1 = {
        r.id: r.neighbor_id
        for r in emb.cosine_topk_ivf(
            df, k=1, n_centroids=8, n_probe=4, train_rows=500
        ).collect()
    }
    hits = sum(got1.get(i) == n for i, n in exact1.items())
    assert hits / len(exact1) >= 0.9, hits / len(exact1)
    for src, dup in pairs:
        assert got1.get(dup) == src, (src, dup)


def test_ivf_determinism(spark, planted):
    df, _, _ = planted
    a = sorted(map(tuple, emb.cosine_topk_ivf(df, k=2, n_centroids=8,
                                              n_probe=2).collect()))
    b = sorted(map(tuple, emb.cosine_topk_ivf(df, k=2, n_centroids=8,
                                              n_probe=2).collect()))
    assert a == b


def test_ivf_centroids_normalized_and_bounded(spark, planted):
    df, _, _ = planted
    C = emb.train_ivf_centroids(df, n_centroids=8, train_rows=100)
    assert C.shape[0] == 8
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0)
    # n_centroids above the sample size degrades gracefully
    C2 = emb.train_ivf_centroids(df, n_centroids=500, train_rows=64)
    assert C2.shape[0] == 64


def test_ivf_pruned_recall_row(spark, planted):
    """The driver-facing recall row (`ivf_pruned_recall`): probing every
    cell must give recall exactly 1.0 for every vector (pruned == exact by
    construction), and pruned probing yields recall in [0, 1] with the
    planted near-dups' home cells intact."""
    df, _, _ = planted
    full = emb.ivf_pruned_recall(
        df, k=3, n_centroids=8, n_probe=8, block_rows=64
    ).collect()
    assert len(full) == 230
    assert all(r.recall == 1.0 and r.n_hits == 3 for r in full), [
        r for r in full if r.recall != 1.0
    ][:3]
    pruned = emb.ivf_pruned_recall(
        df, k=3, n_centroids=8, n_probe=2, block_rows=64
    ).collect()
    assert len(pruned) == 230
    assert all(0.0 <= r.recall <= 1.0 for r in pruned)
    assert any(r.recall < 1.0 for r in pruned)  # genuinely pruned


def test_hash_centroids_deterministic_and_normalized(spark, planted):
    df, _, _ = planted
    a = emb.hash_centroids(df, n_centroids=8)
    b = emb.hash_centroids(df, n_centroids=8)
    assert a.shape == (8, 32)
    assert np.array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-12)
