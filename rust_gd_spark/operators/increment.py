"""Incremental near-dup lookup: a NEW batch probed against an INDEXED
corpus — without ever re-pairing corpus × corpus.

The production shape at 10^12 turns is not "dedup the corpus" (done
once) but "every day, find which of today's 10^7 new documents
near-duplicate anything already ingested". Rerunning the full
self-join pipeline re-shuffles the corpus for every increment; the
right shape is:

* the corpus's LSH index — ``(id, bands, bsig)`` from
  ``bbit.bbit_sketch_bands`` — is computed ONCE and persisted (it is
  ~160 B/doc: 32 band longs + a 128-byte b-bit sketch);
* an increment computes the SAME sketch for its own rows only, joins
  its band postings against the corpus's (the corpus is probed, never
  re-paired: the join's output is bounded by bucket collisions with
  the batch, and a small batch's posting table broadcasts), and
* verification uses the b-bit sketches on BOTH sides — the corpus
  TEXT is never read again, matching ``bbit.verify_bbit``'s byte
  budget.

This is the streaming-dedup idea (``streaming.py`` epoch stores) in
batch form, and the exact complement of ``bloom.bloom_dedup_newbatch``
(which answers "exact-seen-before?"; this answers "near-seen-before?").

Reference analogue: the reference CLI's cross-block dictionary — new
blocks dedup against state built from prior blocks without re-reading
them (`examples/main.rs:36-61`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .bbit import bbit_sketch_bands, verify_bbit
from .minhash import shingle_df


def incremental_near_dups(
    corpus_index: DataFrame,
    batch: DataFrame,
    id_col: str = "uid",
    text_col: str = "text",
    w: int = 5,
    num_perm: int = 128,
    bands: int = 32,
    rows: int = 4,
    b: int = 8,
    threshold: float = 0.8,
    seed: int = 1,
    broadcast_batch: bool = False,
) -> DataFrame:
    """``(batch_id, corpus_id, n_match, j_est)`` — batch docs whose
    b-bit-estimated Jaccard against some indexed corpus doc meets
    ``threshold``.

    ``corpus_index`` is ``bbit_sketch_bands`` output (``id``, ``bands``,
    ``bsig``) built with the SAME (w, num_perm, bands, rows, b, seed) —
    the sketch config is the index's schema contract. Batch and corpus
    ids must not collide. ``broadcast_batch=True`` force-broadcasts the
    batch's posting table (the common case: increments are orders of
    magnitude smaller than the corpus); default leaves the choice to
    AQE runtime stats.
    """
    bsk = bbit_sketch_bands(
        shingle_df(batch, id_col, text_col, w=w),
        num_perm=num_perm, bands=bands, rows=rows, b=b, seed=seed,
    ).localCheckpoint(eager=True)
    # Three consumers read the index (band postings + both verify join
    # sides); when the caller hands a plan instead of a scan-backed
    # persisted table, that plan — typically the corpus sketch kernel —
    # ran three times (kernel subtrees are not exchange-reuse
    # candidates). The pin holds only the 160 B/doc sketches, never the
    # corpus, and measured 1.7x on the bench fixture — but it is SKIPPED
    # when the index plan carries no Python kernel (i.e. it IS the
    # persisted sketch table, re-read per consumer for the price of a
    # column scan): the module's contract is a persisted corpus index at
    # 10^12-doc scale, and eagerly copying ~160 B/doc of parquet into
    # executor storage per increment call is the kind of unbounded
    # duplication three cheap re-scans never justify.
    try:
        _plan = corpus_index._jdf.queryExecution().simpleString()
        _has_kernel = "EvalPython" in _plan or "InPandas" in _plan
    except Exception:
        _has_kernel = True
    if _has_kernel:
        corpus_index = corpus_index.localCheckpoint(eager=True)
    cpost = corpus_index.select(
        F.col("id").alias("corpus_id"),
        F.posexplode("bands").alias("band_idx", "band_hash"),
    )
    bpost = bsk.select(
        F.col("id").alias("batch_id"),
        F.posexplode("bands").alias("band_idx", "band_hash"),
    )
    if broadcast_batch:
        bpost = F.broadcast(bpost)
    cand = (
        cpost.join(bpost, ["band_idx", "band_hash"])
        .select("batch_id", "corpus_id")
        .dropDuplicates(["batch_id", "corpus_id"])
        .localCheckpoint(eager=True)
    )
    sketches = corpus_index.select("id", "bsig").unionByName(
        bsk.select("id", "bsig")
    )
    out = verify_bbit(
        cand.select(
            F.col("batch_id").alias("id_l"), F.col("corpus_id").alias("id_r")
        ),
        sketches,
        num_perm=num_perm,
        b=b,
        threshold=threshold,
    )
    return out.select(
        F.col("id_l").alias("batch_id"),
        F.col("id_r").alias("corpus_id"),
        "n_match",
        "j_est",
    )
