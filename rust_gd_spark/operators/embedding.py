"""Similarity search over embedding columns (``array<float>``).

Two paths, same contract:

* ``cosine_topk_bruteforce`` — exact top-k per vector. Broadcast-nested-loop
  over an L2-normalized copy; dot products via ``zip_with``/``aggregate``
  (JVM-side, no Python). The correctness baseline: at 10^12 scale you run
  it only against a broadcast-able QUERY set, never self-join the corpus.
* ``hyperplane_lsh_buckets`` + ``embedding_near_dup_pairs`` — the scale
  path: random-hyperplane signs (Charikar'02) give a 64-bit signature;
  banding (same machinery as SimHash) yields candidate buckets; cosine is
  verified exactly on candidates only. One shuffle on band keys; the skew
  cap + audit policy matches the text paths.

Determinism: hyperplanes come from a seeded numpy RNG on the driver,
captured in the UDF closure (the reference broadcasts its generator matrix
identically — `rs/mod.rs:25-60`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T


def l2_normalize(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Adds ``vnorm array<double>`` — L2-normalized double copy, JVM-side."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return df.withColumn(
        "vnorm",
        F.when(norm > 0, F.transform(v, lambda x: x / norm)).otherwise(v),
    )


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def cosine_topk_bruteforce(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact ``(id, neighbor_id, cosine, rank)`` — top-k per vector.

    Execution: the neighbor side is materialized once on the driver and
    captured in the UDF closure (the distributed analogue: broadcast the
    QUERY set — same memory contract as Spark's own broadcast join); the
    probe side streams through ``mapInPandas``, one numpy matmul per Arrow
    batch instead of 25M Catalyst expression folds. Top-k happens inside
    the batch — only k rows per vector ever cross back, no global window.

    Deterministic ordering: (round(cosine,6) desc, neighbor_id asc) so
    floating-point dust cannot reorder ties across engines.
    """
    import pandas as _pd

    n = l2_normalize(df, vec_col).select(F.col(id_col).alias("id"), F.col("vnorm"))
    ref = n.toPandas()
    ref_ids = ref["id"].to_numpy()
    R = np.stack(ref["vnorm"].to_numpy()).astype(np.float64)  # (m, d)

    out_schema = T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType),
            T.StructField("neighbor_id", df.schema[id_col].dataType),
            T.StructField("cosine", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            L = np.stack(pdf["vnorm"].to_numpy()).astype(np.float64)
            S = np.round(L @ R.T, 6)  # (b, m)
            ids_l = pdf["id"].to_numpy()
            # exclude self matches
            self_mask = ids_l[:, None] == ref_ids[None, :]
            S[self_mask] = -np.inf
            rows_id, rows_nb, rows_c, rows_r = [], [], [], []
            for bi in range(S.shape[0]):
                s = S[bi]
                # top-k by (-cosine, neighbor_id): lexsort keys last = primary
                idx = np.lexsort((ref_ids, -s))[:k]
                rows_id.extend([ids_l[bi]] * len(idx))
                rows_nb.extend(ref_ids[idx].tolist())
                rows_c.extend(s[idx].tolist())
                rows_r.extend(range(1, len(idx) + 1))
            yield _pd.DataFrame(
                {
                    "id": rows_id,
                    "neighbor_id": rows_nb,
                    "cosine": rows_c,
                    "rank": _pd.Series(rows_r, dtype="int32"),
                }
            )

    return n.mapInPandas(run, schema=out_schema)


def cosine_pairs_bruteforce(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Exact ``(id_l, id_r, cosine)`` for every pair with cosine ≥ threshold.

    Same execution shape as ``cosine_topk_bruteforce``: the reference side
    is broadcast (driver-materialized in local mode), the probe side streams
    through ``mapInPandas`` with one numpy matmul per Arrow batch; only
    id_l < id_r survivors cross back. This is the oracle-checkable exact
    operator; ``embedding_near_dup_pairs`` is its hyperplane-LSH
    approximation for corpora where O(n²) is not an option.
    """
    import pandas as _pd

    n = l2_normalize(df, vec_col).select(F.col(id_col).alias("id"), F.col("vnorm"))
    ref = n.toPandas()
    ref_ids = ref["id"].to_numpy()
    R = np.stack(ref["vnorm"].to_numpy()).astype(np.float64)

    out_schema = T.StructType(
        [
            T.StructField("id_l", df.schema[id_col].dataType),
            T.StructField("id_r", df.schema[id_col].dataType),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            L = np.stack(pdf["vnorm"].to_numpy()).astype(np.float64)
            S = np.round(L @ R.T, 6)
            ids_l = pdf["id"].to_numpy()
            keep = (S >= threshold) & (ids_l[:, None] < ref_ids[None, :])
            li, ri = np.nonzero(keep)
            yield _pd.DataFrame(
                {
                    "id_l": ids_l[li],
                    "id_r": ref_ids[ri],
                    "cosine": S[li, ri],
                }
            )

    return n.mapInPandas(run, schema=out_schema)


def hyperplane_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 64,
    dim: int | None = None,
    seed: int = 7,
) -> DataFrame:
    """``(id, fp long, vnorm)`` — sign pattern against ``nbits`` seeded
    random hyperplanes, packed into an int64. One vectorized pandas UDF
    (a single (batch × dim) @ (dim × nbits) matmul per Arrow batch)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, nbits))

    @F.pandas_udf(T.LongType())
    def fp_udf(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="int64")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in col])
        bits = (m @ planes) >= 0
        weights = (np.uint64(1) << np.arange(nbits, dtype=np.uint64))
        fp = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)
        return pd.Series(fp.astype(np.int64))

    n = l2_normalize(df, vec_col)
    return n.select(F.col(id_col).alias("id"), fp_udf("vnorm").alias("fp"), "vnorm")


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    nbits: int = 64,
    bands: int = 8,
    seed: int = 7,
    max_bucket_size: int = 2000,
) -> DataFrame:
    """``(id_l, id_r, cosine)`` with cosine >= threshold, via hyperplane-LSH
    candidates + exact verification.

    With nbits=64, bands=8 (8-bit bands): P[two vectors at angle θ share a
    band] = (1−θ/π)^8 per band; at cosine 0.9 (θ≈26°) ≥1-of-8 collision
    probability ≈ 1 − (1 − 0.284)^8 ≈ 0.93 per run — the knob is ``bands``;
    verification keeps precision exact regardless.
    """
    sigs = hyperplane_signatures(df, id_col, vec_col, nbits, seed=seed)
    width = nbits // bands
    mask = (1 << width) - 1
    band_arr = F.array(
        *[
            F.shiftrightunsigned(F.col("fp"), i * width).bitwiseAND(F.lit(mask))
            for i in range(bands)
        ]
    )
    banded = sigs.select(
        "id", "vnorm", F.posexplode(band_arr).alias("band_idx", "band_val")
    )
    sized = banded.withColumn(
        "bucket_size", F.count("*").over(Window.partitionBy("band_idx", "band_val"))
    ).filter(F.col("bucket_size") <= max_bucket_size)
    l = sized.select("band_idx", "band_val", F.col("id").alias("id_l"), F.col("vnorm").alias("v_l"))
    r = sized.select("band_idx", "band_val", F.col("id").alias("id_r"), F.col("vnorm").alias("v_r"))
    return (
        l.join(r, ["band_idx", "band_val"])
        .filter(F.col("id_l") < F.col("id_r"))
        .dropDuplicates(["id_l", "id_r"])
        .withColumn("cosine", F.round(_dot("v_l", "v_r"), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_l", "id_r", "cosine")
    )


def cosine_topk_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nbits: int = 64,
    bands: int = 8,
    seed: int = 7,
    max_bucket_size: int = 2000,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to LSH-candidate
    neighbors. Same output schema as the brute-force baseline."""
    sigs = hyperplane_signatures(df, id_col, vec_col, nbits, seed=seed)
    width = nbits // bands
    mask = (1 << width) - 1
    band_arr = F.array(
        *[
            F.shiftrightunsigned(F.col("fp"), i * width).bitwiseAND(F.lit(mask))
            for i in range(bands)
        ]
    )
    banded = sigs.select(
        "id", "vnorm", F.posexplode(band_arr).alias("band_idx", "band_val")
    )
    sized = banded.withColumn(
        "bucket_size", F.count("*").over(Window.partitionBy("band_idx", "band_val"))
    ).filter(F.col("bucket_size") <= max_bucket_size)
    l = sized.select("band_idx", "band_val", F.col("id"), F.col("vnorm").alias("v_l"))
    r = sized.select(
        "band_idx", "band_val", F.col("id").alias("neighbor_id"), F.col("vnorm").alias("v_r")
    )
    cands = (
        l.join(r, ["band_idx", "band_val"])
        .filter(F.col("id") != F.col("neighbor_id"))
        .dropDuplicates(["id", "neighbor_id"])
        .withColumn("cosine", F.round(_dot("v_l", "v_r"), 6))
        .select("id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return cands.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
