"""Similarity search over embedding columns (``array<float>``).

Two paths, same contract:

* ``cosine_topk_bruteforce`` / ``cosine_pairs_bruteforce`` — exact
  operators. The reference (neighbor) side must be broadcast-able: it is
  collected once on the driver, shipped to executors via
  ``sparkContext.broadcast``, and hard-guarded by ``max_ref_rows`` — the
  call RAISES rather than silently collecting a corpus-scale table. At
  10^12 rows these are oracle/baseline operators for a bounded reference
  set (``query_df``), never a corpus self-join.
* ``hyperplane_signatures`` → ``lsh_band_buckets`` →
  ``embedding_candidate_pairs`` — the scale path: random-hyperplane signs
  (Charikar'02) give an ``nbits``-bit signature; banding yields candidate
  buckets; candidate generation is ONE shuffle of the band table via
  ``_buckets.bucket_pairs`` (capped + audited, same contract as the
  MinHash/SimHash/winnow paths); a JVM-side Hamming prefilter on the
  signatures kills most chance collisions BEFORE any dedup or vector
  join; exact cosine is verified on survivors against a slim
  ``(id, vnorm)`` table.

Parameter regimes (band width = nbits/bands): high thresholds (≥0.7 —
embedding near-dup) want wide bands (8–16 bits) — selective buckets that
stay small at corpus scale. Low thresholds (≈0.3–0.5 — semantic
similarity) need narrow bands (4 bits) and many of them; buckets then hold
~n/2^width rows, so this regime is inherently near-linear-scan and the
skew cap + audit is what keeps it bounded.

Determinism: hyperplanes come from a seeded numpy RNG on the driver,
captured in the UDF closure (the reference broadcasts its generator matrix
identically — `rs/mod.rs:25-60`).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

#: Hard ceiling for driver-collected reference sets in the brute-force
#: operators. ~100k rows × 64 dims × 8B ≈ 50 MB broadcast — the same
#: budget Spark's own broadcast joins assume. Above this, use the LSH path.
MAX_REF_ROWS_DEFAULT = 100_000


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


def _collect_ref(df: DataFrame, id_col: str, vec_col: str, max_ref_rows: int):
    """Driver-collect + broadcast the reference side, with a hard size guard."""
    n = l2_normalize(df, vec_col).select(F.col(id_col).alias("id"), F.col("vnorm"))
    cnt = n.count()
    if cnt > max_ref_rows:
        raise ValueError(
            f"brute-force reference side has {cnt} rows > max_ref_rows="
            f"{max_ref_rows}; pass a bounded query_df or use the LSH path "
            "(embedding_near_dup_pairs / cosine_topk_lsh)"
        )
    ref = n.toPandas()
    ref_ids = ref["id"].to_numpy()
    R = np.stack(ref["vnorm"].to_numpy()).astype(np.float64)  # (m, d)
    bc = df.sparkSession.sparkContext.broadcast((ref_ids, R))
    return n, bc


def cosine_topk_bruteforce(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    query_df: DataFrame | None = None,
    max_ref_rows: int = MAX_REF_ROWS_DEFAULT,
) -> DataFrame:
    """Exact ``(id, neighbor_id, cosine, rank)`` — top-k per probe vector.

    The NEIGHBOR side (``query_df`` if given, else ``df`` itself) is
    driver-collected once, guarded by ``max_ref_rows`` (raises above it),
    and shipped via ``sparkContext.broadcast`` — one copy per executor,
    not one per task closure. The probe side (``df``) streams through
    ``mapInPandas``, one numpy matmul per Arrow batch; only k rows per
    vector cross back, no global window.

    Deterministic ordering: (round(cosine,6) desc, neighbor_id asc) so
    floating-point dust cannot reorder ties across engines.
    """
    import pandas as _pd

    ref_side = query_df if query_df is not None else df
    _, bc = _collect_ref(ref_side, id_col, vec_col, max_ref_rows)
    probe = l2_normalize(df, vec_col).select(F.col(id_col).alias("id"), F.col("vnorm"))

    out_schema = T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType),
            T.StructField("neighbor_id", df.schema[id_col].dataType),
            T.StructField("cosine", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )

    def run(batches):
        ref_ids, R = bc.value
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

    return probe.mapInPandas(run, schema=out_schema)


def cosine_pairs_bruteforce(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    query_df: DataFrame | None = None,
    max_ref_rows: int = MAX_REF_ROWS_DEFAULT,
) -> DataFrame:
    """Exact ``(id_l, id_r, cosine)`` for every pair with cosine ≥ threshold.

    Same execution contract as ``cosine_topk_bruteforce``: the reference
    side is size-guarded, driver-collected once, and broadcast; the probe
    side streams through ``mapInPandas``; only id_l < id_r survivors cross
    back. This is the oracle-checkable exact operator;
    ``embedding_near_dup_pairs`` is its LSH approximation for corpora
    where O(n²) is not an option.
    """
    import pandas as _pd

    ref_side = query_df if query_df is not None else df
    _, bc = _collect_ref(ref_side, id_col, vec_col, max_ref_rows)
    probe = l2_normalize(df, vec_col).select(F.col(id_col).alias("id"), F.col("vnorm"))

    out_schema = T.StructType(
        [
            T.StructField("id_l", df.schema[id_col].dataType),
            T.StructField("id_r", df.schema[id_col].dataType),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def run(batches):
        ref_ids, R = bc.value
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

    return probe.mapInPandas(run, schema=out_schema)


# ---------------------------------------------------------------------------
# LSH scale path
# ---------------------------------------------------------------------------


def hyperplane_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 64,
    dim: int | None = None,
    seed: int = 7,
) -> DataFrame:
    """``(id, fp array<long>[nbits/64], vnorm)`` — sign pattern against
    ``nbits`` seeded random hyperplanes, packed into int64 words
    (little-endian: bit j of the signature = bit j%64 of word j//64).
    One vectorized pandas UDF — a single (batch × dim) @ (dim × nbits)
    matmul per Arrow batch."""
    if nbits % 64 != 0:
        raise ValueError("nbits must be a multiple of 64")
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, nbits))
    words = nbits // 64
    shifts = np.arange(64, dtype=np.uint64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def fp_udf(col: pd.Series) -> pd.Series:
        if len(col) == 0:
            return pd.Series([], dtype="object")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in col])
        bits = (m @ planes) >= 0                        # (b, nbits)
        b3 = bits.reshape(len(m), words, 64).astype(np.uint64)
        packed = (b3 << shifts[None, None, :]).sum(axis=2, dtype=np.uint64)
        return pd.Series(list(packed.astype(np.int64)))

    n = l2_normalize(df, vec_col)
    return n.select(F.col(id_col).alias("id"), fp_udf("vnorm").alias("fp"), "vnorm")


def lsh_band_buckets(sigs: DataFrame, nbits: int, bands: int) -> DataFrame:
    """``(id, fp, band_idx, band_val)`` — JVM-side band extraction from the
    packed signature words. Band width = nbits/bands; must divide 64 so a
    band never straddles words."""
    width = nbits // bands
    if width == 0 or nbits % bands or 64 % width:
        raise ValueError(f"band width nbits/bands={nbits}/{bands} must divide 64")
    per_word = 64 // width

    def band_expr(i: int):
        word = F.element_at("fp", i // per_word + 1)
        shifted = F.shiftrightunsigned(word, (i % per_word) * width)
        if width == 64:
            return shifted
        return shifted.bitwiseAND(F.lit((1 << width) - 1))

    band_arr = F.array(*[band_expr(i) for i in range(bands)])
    return sigs.select(
        "id", "fp", F.posexplode(band_arr).alias("band_idx", "band_val")
    )


def _hamming(fp_l, fp_r):
    """Hamming distance between two packed signatures — JVM-side popcount."""
    return F.aggregate(
        F.zip_with(fp_l, fp_r, lambda a, b: F.bit_count(a.bitwiseXOR(b))),
        F.lit(0),
        lambda s, x: s + x,
    )


def prefilter_hamming_cutoff(threshold: float, nbits: int) -> int:
    """Data-independent Hamming cutoff for a cosine threshold: a pair at
    cosine == threshold differs in Binomial(nbits, θ/π) signature bits;
    cutoff = mean + 4.5σ keeps any true pair with probability ≈ 1 − 3e-6
    while rejecting the bulk of chance band collisions (random pairs sit
    at nbits/2)."""
    p = math.acos(max(min(threshold, 1.0), -1.0)) / math.pi
    return min(nbits, math.ceil(nbits * p + 4.5 * math.sqrt(nbits * p * (1 - p))))


def embedding_candidate_pairs(
    sigs: DataFrame,
    nbits: int,
    bands: int,
    max_bucket_size: int = 2000,
    neighbor_window: int | None = None,
    salt_oversized: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Bucket pairs on (band_idx, band_val) carrying both packed signatures.

    ONE shuffle of the band table (``_buckets.bucket_pairs``) — the
    window-count + self-join formulation costs three. Payload is the
    nbits/8-byte signature, NOT the full vector: vectors join in only at
    verify time, onto survivors. Oversized buckets are excluded + audited,
    never dropped silently — the same contract as the MinHash/SimHash/
    winnow paths. Pairs are NOT deduplicated here; callers run the cheap
    Hamming prefilter first so the dedup shuffle sees survivors.
    """
    from ._buckets import bucket_pairs

    banded = lsh_band_buckets(sigs.select("id", "fp"), nbits, bands)
    # the band table derives cheaply (JVM bit ops) from sigs — callers
    # checkpoint sigs once; re-deriving bands twice beats storing the
    # bands×-exploded table (same reasoning as the MinHash band explode)
    return bucket_pairs(
        banded,
        ["band_idx", "band_val"],
        payload_cols=["fp"],
        max_bucket_size=max_bucket_size,
        neighbor_window=neighbor_window,
        materialize=False,
        salt_oversized=salt_oversized,
    )


def _verify_cosine(cand: DataFrame, sigs: DataFrame, left: str, right: str) -> DataFrame:
    """Join candidate id pairs back to a slim (id, vnorm) table and compute
    exact cosine — vectors ride only on the post-prefilter survivor set."""
    slim = sigs.select("id", "vnorm")
    return (
        cand.join(slim.select(F.col("id").alias(left), F.col("vnorm").alias("v_l")), left)
        .join(slim.select(F.col("id").alias(right), F.col("vnorm").alias("v_r")), right)
        .withColumn("cosine", F.round(_dot("v_l", "v_r"), 6))
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    nbits: int = 64,
    bands: int = 8,
    seed: int = 7,
    max_bucket_size: int = 2000,
    prefilter: bool = True,
) -> DataFrame:
    """``(id_l, id_r, cosine)`` with cosine >= threshold, via hyperplane-LSH
    candidates + exact verification.

    Plan shape (the 100 TB path): signature UDF once (checkpointed) →
    one-shuffle bucket pairs with the 8·nbits/64-byte fp as payload →
    JVM Hamming prefilter on the raw (possibly duplicated) collision
    stream → dedup survivors → slim vnorm join → exact cosine filter.
    Nothing quadratic is ever materialized with vectors attached.

    Candidate recall: P[pair at angle θ shares ≥1 band] =
    1 − (1 − (1−θ/π)^width)^bands; verification keeps precision exact
    regardless. Audit: use ``embedding_candidate_pairs`` directly to
    observe skew-capped buckets.
    """
    sigs = hyperplane_signatures(df, id_col, vec_col, nbits, seed=seed)
    sigs = sigs.localCheckpoint(eager=True)
    raw, _audit = embedding_candidate_pairs(
        sigs, nbits, bands, max_bucket_size=max_bucket_size
    )
    if prefilter:
        cutoff = prefilter_hamming_cutoff(threshold, nbits)
        raw = raw.filter(_hamming("fp_l", "fp_r") <= cutoff)
    cand = raw.select("id_l", "id_r").dropDuplicates(["id_l", "id_r"])
    return (
        _verify_cosine(cand, sigs, "id_l", "id_r")
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
    neighbors. Same output schema as the brute-force baseline. Same
    one-shuffle candidate generation as ``embedding_near_dup_pairs``
    (candidates mirrored to both directions — top-k is per-probe); no
    Hamming prefilter (no threshold to derive a cutoff from)."""
    sigs = hyperplane_signatures(df, id_col, vec_col, nbits, seed=seed)
    sigs = sigs.localCheckpoint(eager=True)
    raw, _audit = embedding_candidate_pairs(
        sigs, nbits, bands, max_bucket_size=max_bucket_size
    )
    und = raw.select("id_l", "id_r").dropDuplicates(["id_l", "id_r"])
    cand = und.select(F.col("id_l").alias("id"), F.col("id_r").alias("neighbor_id")).union(
        und.select(F.col("id_r").alias("id"), F.col("id_l").alias("neighbor_id"))
    )
    scored = _verify_cosine(cand, sigs, "id", "neighbor_id").select(
        "id", "neighbor_id", "cosine"
    )
    w = Window.partitionBy("id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
