"""Cluster delta encoding — the reference's base+deviation record stream
at document granularity.

The reference's entire output model is records of ``[separator][id OR
base][deviation]`` (`src/gd_byte_unit.rs:78-98`, `src/separator.rs:4-26`,
`src/lib.rs:90-94`): one full copy of each dictionary base, and for every
other chunk a small residual that makes reconstruction lossless. The
near-dup detection tiers (MinHash/SimHash/winnowing → connected
components) FIND the clusters; this operator finishes the generalized-
deduplication story by actually ENCODING them: per cluster the
representative document is stored once in full (``kind='base'`` — the
reference's AsIs record, `src/separator.rs:4-26`), and every other
member is stored as ``(rep_id, prefix_chars, suffix_chars, deviation)``
(``kind='delta'`` — the Deduped record), where

    member = rep[:prefix_chars] + deviation + rep[-suffix_chars:]

i.e. the deviation is the member's middle slice after stripping the
longest common prefix with the rep and then the longest common suffix of
the remainders. Near-duplicate transcripts (re-logged sessions with one
edited turn, boilerplate-wrapped pages) collapse to a few bytes each;
exact duplicates collapse to an empty deviation. ``delta_decode``
reconstructs the corpus losslessly from the encoded table alone — the
analogue of the reference's asserted round-trip (`src/lib.rs:130`).

Scale notes: representative pick is ONE hash aggregation on cluster_id
(`pipeline.cluster_representatives` — map-side partial agg, mega-cluster
safe); the member↔rep text joins are plain equi-joins (rep side is one
row per cluster; AQE broadcasts/splits as sizes dictate). The only
Python is the common-prefix/suffix kernel — an Arrow ``pandas_udf`` over
DELTA rows only (a vanishing fraction of a deduplicated corpus) whose
batch is processed as one fixed-width code-point matrix (numpy ``U``
view → (rows × maxlen) uint32 grid, elementwise compare + cumprod), not
a per-row Python loop; sub-batches are capped at ~32M cells so a batch
of long documents cannot balloon the Arrow worker.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

# cap rows*maxlen per vectorized sub-batch (~256 MB of uint32 for both
# sides at 32M cells)
_MAX_CELLS = 32_000_000

_RESERVED = {
    "kind", "prefix_chars", "suffix_chars", "deviation", "orig_chars",
    "dev_chars", "rep_id",
}


def _prefix_suffix_arrays(a_list, b_list):
    """Vectorized longest-common-prefix p and longest-common-suffix-of-
    remainders s for paired string arrays. Returns int64 arrays (p, s).

    One fixed-width code-point matrix per side: ``np.array(dtype='U')``
    pads to the chunk max length, ``.view(uint32)`` exposes the code
    points; prefix = cumprod of (equal & within min-length), suffix =
    cumprod of end-aligned gathers bounded to the post-prefix remainder.
    Both are exact code-point counts (NOT bytes), matching Spark
    ``substring``/``length`` and DuckDB ``substr``/``length`` semantics.
    """
    n = len(a_list)
    p_out = np.zeros(n, dtype=np.int64)
    s_out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return p_out, s_out
    la = np.fromiter((len(x) for x in a_list), dtype=np.int64, count=n)
    lb = np.fromiter((len(x) for x in b_list), dtype=np.int64, count=n)
    start = 0
    while start < n:
        # size sub-batches by the worst row so rows*maxlen stays bounded
        end = start
        mx = 1
        while end < n:
            cand = max(mx, la[end], lb[end], 1)
            if (end - start + 1) * cand > _MAX_CELLS and end > start:
                break
            mx = cand
            end += 1
        m = int(mx)
        rows = slice(start, end)
        k = end - start
        A = np.array(a_list[start:end], dtype=f"U{m}").view(np.uint32).reshape(k, m)
        B = np.array(b_list[start:end], dtype=f"U{m}").view(np.uint32).reshape(k, m)
        lim = np.minimum(la[rows], lb[rows])
        idx = np.arange(m)[None, :]
        eqp = (A == B) & (idx < lim[:, None])
        p = eqp.cumprod(axis=1).sum(axis=1)
        # suffix of the remainders: j-th code point from each end, valid
        # while both positions stay inside their post-prefix remainder
        rix = np.arange(k)[:, None]
        ja = la[rows][:, None] - 1 - idx
        jb = lb[rows][:, None] - 1 - idx
        va = ja >= p[:, None]
        vb = jb >= p[:, None]
        gA = A[rix, np.clip(ja, 0, m - 1)]
        gB = B[rix, np.clip(jb, 0, m - 1)]
        eqs = (gA == gB) & va & vb
        s = eqs.cumprod(axis=1).sum(axis=1)
        p_out[rows] = p
        s_out[rows] = s
        start = end
    return p_out, s_out


def _prefix_suffix_udf():
    """Arrow pandas UDF built lazily (decorating at import time requires an
    active SparkSession for DDL-type parsing)."""

    @pandas_udf("struct<p: long, s: long>")
    def _prefix_suffix(member: pd.Series, rep: pd.Series) -> pd.DataFrame:
        a = member.fillna("").tolist()
        b = rep.fillna("").tolist()
        p, s = _prefix_suffix_arrays(a, b)
        return pd.DataFrame({"p": p, "s": s})

    return _prefix_suffix


def cluster_delta_encode(
    clusters: DataFrame,
    src: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Encode a clustered corpus as base + delta records.

    ``clusters``: ``(id, cluster_id)`` (e.g. ``canonical_clusters`` of a
    ``near_dup_pipeline`` run); ``src`` holds the texts. The
    representative (longest text in UTF-8 bytes, ties → smallest id —
    the `pipeline.cluster_representatives` rule) becomes the cluster's
    ``base`` record carrying its full text in ``deviation``; every other
    member becomes a ``delta`` record carrying only the middle slice.

    Returns ``(id, cluster_id, rep_id, kind, prefix_chars, suffix_chars,
    deviation, orig_chars, dev_chars)`` — char counts are code points,
    NULL text follows the engine-wide NULL→'' doctrine.
    """
    from ..pipeline import cluster_representatives

    if id_col in _RESERVED or text_col in _RESERVED:
        raise ValueError(
            f"id/text columns collide with output columns: {id_col}, {text_col}"
        )
    reps = cluster_representatives(clusters, src, id_col, text_col).select(
        "cluster_id", "rep_id"
    )
    txt = src.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_txt"),
    )
    members = (
        clusters.select("id", "cluster_id")
        .join(reps, "cluster_id")
        .join(txt, "id")
        .join(
            txt.select(
                F.col("id").alias("rep_id"), F.col("_txt").alias("_rep_txt")
            ),
            "rep_id",
        )
    )
    base = members.filter(F.col("id") == F.col("rep_id")).select(
        "id", "cluster_id", "rep_id",
        F.lit("base").alias("kind"),
        F.lit(0).cast("long").alias("prefix_chars"),
        F.lit(0).cast("long").alias("suffix_chars"),
        F.col("_txt").alias("deviation"),
        F.length("_txt").cast("long").alias("orig_chars"),
        F.length("_txt").cast("long").alias("dev_chars"),
    )
    delta = (
        members.filter(F.col("id") != F.col("rep_id"))
        .withColumn("_ps", _prefix_suffix_udf()(F.col("_txt"), F.col("_rep_txt")))
        .select(
            "id", "cluster_id", "rep_id",
            F.lit("delta").alias("kind"),
            F.col("_ps.p").alias("prefix_chars"),
            F.col("_ps.s").alias("suffix_chars"),
            F.expr(
                "substring(_txt, _ps.p + 1,"
                " greatest(length(_txt) - _ps.p - _ps.s, 0L))"
            ).alias("deviation"),
            F.length("_txt").cast("long").alias("orig_chars"),
            (F.length("_txt") - F.col("_ps.p") - F.col("_ps.s"))
            .cast("long")
            .alias("dev_chars"),
        )
    )
    return base.unionByName(delta)


def delta_decode(encoded: DataFrame) -> DataFrame:
    """Lossless inverse of :func:`cluster_delta_encode` — needs ONLY the
    encoded table (base rows carry the full rep text), mirroring the
    reference's self-contained ``Deduped`` stream (`src/lib.rs:90-94`).

    Returns ``(id, cluster_id, text)``; ``dup(dedup(x)) == x`` up to the
    NULL→'' doctrine. One small join: every member against its cluster's
    single base row.
    """
    bases = (
        encoded.filter(F.col("kind") == "base")
        .select(
            F.col("cluster_id").alias("_cid"),
            F.col("deviation").alias("_rep_txt"),
        )
    )
    return (
        encoded.join(bases, encoded["cluster_id"] == bases["_cid"])
        .select(
            "id",
            "cluster_id",
            F.when(F.col("kind") == "base", F.col("deviation"))
            .otherwise(
                F.concat(
                    F.expr("substring(_rep_txt, 1, cast(prefix_chars as int))"),
                    F.col("deviation"),
                    F.expr(
                        "case when suffix_chars > 0 then"
                        " substring(_rep_txt,"
                        "  length(_rep_txt) - cast(suffix_chars as int) + 1,"
                        "  cast(suffix_chars as int)) else '' end"
                    ),
                )
            )
            .alias("text"),
        )
    )
