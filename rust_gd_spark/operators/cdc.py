"""Content-defined chunking (CDC) + chunk-store deduplication.

The storage-dedup generalization of the reference engine's chunker: the
reference splits the stream at FIXED byte offsets (`src/gd_byte_unit.rs:
42-65`), so inserting one byte shifts every later chunk boundary and
kills all downstream dictionary hits. Content-defined chunking (the
Rabin / LBFS / FastCDC family) instead cuts wherever a rolling hash of
the local content crosses a threshold — boundaries move WITH the
content, so an insertion perturbs only the chunk it lands in and the
chunk dictionary (`src/dict.rs:38-63`) keeps matching everything else.
This module is that idea at token granularity over a document corpus:

* ``cdc_chunks`` — variable-size chunks cut after any token whose
  trailing ``gram``-token window hashes to ``0 (mod divisor)``; expected
  chunk length = ``divisor`` tokens (geometric).
* ``cdc_chunk_store`` — the corpus-wide chunk dictionary: per distinct
  chunk, occurrence/document counts and the canonical first occurrence
  (the row a GD-style store would keep; every other copy is an id
  reference, `src/dict.rs:50-63`).
* ``cdc_dedup_ratio`` — the reference's dedup-rate observability
  (`src/lib.rs:131-135`) at corpus scale: stored tokens / raw tokens.

Engine parity: the cut decision is the repo's 52-bit md5-prefix integer
(see ``sampling.weighted_sample``) — ``conv(substr(md5(gram),1,13),16,10)
% divisor`` in Spark equals ``('0x'||substr(md5(gram),1,13))::ubigint %
divisor`` in DuckDB bit-for-bit, so the whole operator has an exact SQL
twin (``cdc_chunks_sql``).

Scale design (10⁹+ documents):

* Chunking itself is ZERO shuffles — cut positions, chunk starts/ends,
  and chunk texts are Catalyst array expressions over the scan (same
  shape as ``chunking.py``); per-token cost is one md5 over a short
  gram, JVM-side, no Python.
* The chunk store is ONE partial-agg shuffle over narrow
  ``(chunk_hash, ord)`` rows (map-side combine collapses within-doc and
  within-partition repeats before the exchange); the join back to tag
  canonical rows reuses the hash key.
* Unlike FastCDC we impose no min/max chunk bounds — those make the cut
  decision stateful (a cut suppressed by the min bound shifts every
  later decision), which breaks both the SQL twin and parallel
  evaluation. The cost is a geometric size tail:
  P(chunk > c·divisor) ≈ e^-c, so a 20·divisor chunk appears once per
  ~5·10⁸ cut decisions — at 100 TB a handful of long chunks, not a skew
  hazard (chunks never become join keys here; only their hashes do).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .minhash import tokenize


def _cut_u52(gram_text: Column) -> Column:
    """52-bit integer from the md5 prefix of a gram — the engine-parity
    uniform hash (13 hex chars are exact in an IEEE double AND a BIGINT,
    so Spark and DuckDB agree bit-for-bit)."""
    return F.conv(F.substring(F.md5(gram_text), 1, 13), 16, 10).cast("long")


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    divisor: int = 32,
    gram: int = 2,
) -> DataFrame:
    """``(id, chunk_idx, chunk_text, chunk_tokens, chunk_hash)`` —
    content-defined variable-size token chunks.

    A cut happens AFTER token ``i`` (1-based, ``i < n``) iff the 52-bit
    md5 integer of the space-joined window ``tokens[max(i-gram+1,1)..i]``
    is ``0 (mod divisor)``. The final token never cuts (the document end
    is the implicit last boundary). An empty/NULL document tokenizes to
    one empty token and yields exactly one empty chunk — the repo-wide
    split-of-empty tokenizer convention (``minhash.tokenize``: split('')
    = ['']), NOT a reference rule (the reference's chunker computes
    residue 0 → zero chunks for an empty buffer; `src/gd_byte_unit.rs:
    44-49` pads a short FINAL chunk, which is a different case).

    Normalization is byte-identical to the MinHash shingler, so chunk
    hashes and document-level near-dup signatures describe the same
    token stream.
    """
    if divisor < 1:
        raise ValueError(f"divisor must be >= 1, got {divisor}")
    if gram < 1:
        raise ValueError(f"gram must be >= 1, got {gram}")
    toks = tokenize(F.col(text_col))
    n = F.size(toks)

    def is_cut(i):
        gs = F.greatest(i - (gram - 1), F.lit(1))
        gram_text = F.concat_ws(" ", F.slice(toks, gs, i - gs + 1))
        return _cut_u52(gram_text) % divisor == 0

    # sequence(1, 0) in Spark DESCENDS ([1, 0]) instead of being empty —
    # guard single-token/empty docs explicitly.
    cuts = F.when(
        n >= 2, F.filter(F.sequence(F.lit(1), n - 1), is_cut)
    ).otherwise(F.array().cast("array<int>"))
    starts = F.concat(F.array(F.lit(1)), F.transform(cuts, lambda c: c + 1))
    ends = F.concat(cuts, F.array(n))
    chunks = F.zip_with(
        starts,
        ends,
        lambda s, e: F.struct(
            F.concat_ws(" ", F.slice(toks, s, e - s + 1)).alias("txt"),
            (e - s + 1).cast("long").alias("ntok"),
        ),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(chunks).alias("chunk_idx", "c"),
    ).select(
        "id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("c.txt").alias("chunk_text"),
        F.col("c.ntok").alias("chunk_tokens"),
        F.md5("c.txt").alias("chunk_hash"),
    )


def cdc_chunk_store(chunks: DataFrame) -> DataFrame:
    """The corpus chunk dictionary: one row per distinct chunk with
    ``(chunk_hash, n_copies, n_docs, chunk_tokens, first_id,
    first_chunk_idx)`` — ``first_*`` is the lexicographically smallest
    ``(id, chunk_idx)`` occurrence, the copy a dedup store keeps.

    Plan shape (pinned in tests/test_plans.py): Spark's canonical
    two-phase distinct-agg — partial aggregate + exchange on
    ``(chunk_hash, id)`` for the ``n_docs`` distinct, then final
    exchange on ``chunk_hash`` — two shuffles of NARROW rows (hash +
    counters), with the canonical pick riding the same aggregate as
    ``min(struct(id, chunk_idx))`` (lexicographic struct total order,
    the survivorship pattern from ``pipeline.cluster_representatives``;
    correct for ANY id type — string, negative, or unsigned — unlike the
    earlier ``id·10⁹ + chunk_idx`` integer encoding, whose long cast
    NULLed string ids and whose div/% truncate-toward-zero miscomputed
    negative ones). Callers that don't need ``n_docs`` could drop to
    one shuffle, but the dictionary's per-document reach is what
    decides boilerplate-vs-duplication."""
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("id").alias("n_docs"),
            # min, not first: same value for every copy (same hash ⇒ same
            # text), but min is deterministic and oracle-reproducible
            F.min("chunk_tokens").alias("chunk_tokens"),
            F.min(F.struct("id", "chunk_idx")).alias("_first"),
        )
        .select(
            "chunk_hash",
            "n_copies",
            "n_docs",
            "chunk_tokens",
            F.col("_first.id").alias("first_id"),
            F.col("_first.chunk_idx").alias("first_chunk_idx"),
        )
    )


def cdc_dedup_ratio(chunks: DataFrame) -> DataFrame:
    """One-row corpus metric — the reference's printed dedup rate
    (`src/lib.rs:131-135`) in relational form: raw token volume vs the
    chunk store's (store = one copy per distinct chunk)."""
    store = cdc_chunk_store(chunks)
    totals = chunks.agg(
        F.count(F.lit(1)).alias("total_chunks"),
        F.sum("chunk_tokens").alias("total_tokens"),
    )
    kept = store.agg(
        F.count(F.lit(1)).alias("unique_chunks"),
        F.sum("chunk_tokens").alias("store_tokens"),
    )
    return totals.crossJoin(kept).select(
        "total_chunks",
        "unique_chunks",
        "total_tokens",
        "store_tokens",
        F.round(F.col("store_tokens") / F.col("total_tokens"), 6).alias(
            "dedup_ratio"
        ),
    )


def cdc_chunks_sql(
    table: str,
    id_expr: str,
    text_expr: str,
    divisor: int,
    gram: int,
) -> str:
    """DuckDB twin of ``cdc_chunks`` — same normalization, same 52-bit
    cut hash, same start/end arithmetic. ``range(1, n)`` is half-open
    (empty for n ≤ 1), matching the Spark guard."""
    norm = (
        f"trim(regexp_replace(lower(coalesce({text_expr}, '')),"
        f" '[^a-z0-9]+', ' ', 'g'))"
    )
    return f"""
        with t as (
          select {id_expr} as id,
                 string_split_regex({norm}, '\\s+') as toks
          from {table}
        ),
        n as (select id, toks, len(toks) as n_tok from t),
        c as (
          select id, toks, n_tok,
                 list_filter(range(1, n_tok), i ->
                   ('0x' || substr(md5(array_to_string(
                      list_slice(toks, greatest(i - {gram - 1}, 1), i), ' ')),
                      1, 13))::ubigint % {divisor} = 0) as cuts
          from n
        ),
        b as (
          select id, toks,
                 list_prepend(1, list_transform(cuts, c -> c + 1)) as starts,
                 list_append(cuts, n_tok) as ends
          from c
        )
        select id,
               (k - 1)::bigint as chunk_idx,
               array_to_string(list_slice(toks, starts[k], ends[k]), ' ')
                 as chunk_text,
               (ends[k] - starts[k] + 1)::bigint as chunk_tokens,
               md5(array_to_string(list_slice(toks, starts[k], ends[k]), ' '))
                 as chunk_hash
        from b, unnest(range(1, len(starts) + 1)) as u(k)
    """


def cdc_delta(new_chunks: DataFrame, old_chunks: DataFrame) -> DataFrame:
    """Per-document delta-storage rollup of a new corpus snapshot against
    an old one's chunk store: ``(id, n_chunks, n_reused, n_new,
    reused_tokens, new_tokens)`` — how much of each new document is
    already stored (its chunks hit the old dictionary, only id
    references needed) vs genuinely new bytes.

    This is the reference engine's cross-block dictionary reuse
    (`examples/main.rs:36-61`: blocks dedup against state built by
    earlier blocks) lifted to corpus versions — the rsync/GD "send only
    the new chunks" primitive that makes re-publishing a 100 TB corpus
    cost O(delta), the storage complement of `snapshot.snapshot_diff`'s
    row-level classification. Because chunking is content-defined, an
    edited document still reuses every chunk outside the edit's
    neighborhood (see ``cdc_chunks``).

    Scale: the old store collapses to distinct hashes (one partial-agg
    shuffle over narrow rows), the membership join is hash-equi (AQE
    broadcasts when the store fits, shuffles otherwise — never a driver
    collect), and the rollup reuses the new side's id grouping. A left
    join (not anti) so fully-reused documents still report.
    """
    old = old_chunks.select("chunk_hash").distinct().withColumn(
        "_hit", F.lit(1)
    )
    j = new_chunks.join(old, "chunk_hash", "left")
    hit = F.col("_hit").isNotNull()
    return j.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(hit, 1).otherwise(0)).alias("n_reused"),
        F.sum(F.when(hit, 0).otherwise(1)).alias("n_new"),
        F.sum(F.when(hit, F.col("chunk_tokens")).otherwise(0)).alias(
            "reused_tokens"
        ),
        F.sum(F.when(hit, 0).otherwise(F.col("chunk_tokens"))).alias(
            "new_tokens"
        ),
    )


def cdc_delta_sql(new_chunks_sql: str, old_chunks_sql: str) -> str:
    """DuckDB twin of ``cdc_delta`` over two ``cdc_chunks_sql`` bodies."""
    return f"""
        with nc as ({new_chunks_sql}),
        oc as (select distinct chunk_hash from ({old_chunks_sql}))
        select nc.id,
               count(*)::bigint as n_chunks,
               sum(case when oc.chunk_hash is not null then 1 else 0
                   end)::bigint as n_reused,
               sum(case when oc.chunk_hash is null then 1 else 0
                   end)::bigint as n_new,
               sum(case when oc.chunk_hash is not null then nc.chunk_tokens
                   else 0 end)::bigint as reused_tokens,
               sum(case when oc.chunk_hash is null then nc.chunk_tokens
                   else 0 end)::bigint as new_tokens
        from nc left join oc using (chunk_hash)
        group by nc.id
    """


def cdc_dedup_rewrite(chunks: DataFrame) -> DataFrame:
    """Duplicate-SPAN removal (Lee et al. 2022's "deduplicating training
    data" step at CDC-chunk granularity): every chunk occurrence that is
    not its hash's canonical first occurrence — lexicographic
    ``min(id, chunk_idx)``, the same survivorship rule as
    :func:`cdc_chunk_store` — is cut, and each document's surviving
    chunks reassemble in ``chunk_idx`` order. Later documents lose the
    spans they repeat from earlier ones (and a doc repeating its own
    chunk loses the repeat); the first occurrence always survives, so
    every distinct chunk remains in the corpus exactly once.

    Returns one row per input document (docs whose every chunk was seen
    earlier keep an empty ``deduped_text``): ``(id, deduped_text,
    chunks_kept, chunks_dropped, tokens_kept, tokens_dropped)``.
    ``deduped_text`` is in the chunker's NORMALIZED token space
    (lowercased, punctuation folded — see ``cdc_chunks``), the form
    training-corpus dedup operates on.

    Plan shape: the keep decision is an equi-JOIN against the two-shuffle
    chunk store, not a window over ``chunk_hash`` — a boilerplate
    mega-chunk (10⁹ copies of one hash) stays AQE-skew-splittable,
    where a per-hash window would pin one task. Reassembly is one
    ``groupBy(id)``; the per-doc sort/extract runs on ~chunks-per-doc
    elements (interpreted HOFs are fine off the per-token path).
    """
    # pin the chunk table: it feeds BOTH the store aggregation and the
    # occurrence join, and the upstream chunker (interpreted higher-order
    # array expressions — the operator's dominant per-row cost) would
    # otherwise run twice (guide §1.2)
    chunks = chunks.localCheckpoint(eager=True)
    store = cdc_chunk_store(chunks).select(
        "chunk_hash", "first_id", "first_chunk_idx"
    )
    occ = chunks.join(store, "chunk_hash")
    kept = (F.col("id") == F.col("first_id")) & (
        F.col("chunk_idx") == F.col("first_chunk_idx")
    )
    return (
        occ.groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(kept, F.struct("chunk_idx", "chunk_text"))
                        )
                    ),
                    lambda s: s["chunk_text"],
                ),
                " ",
            ).alias("deduped_text"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("chunks_kept"),
            F.sum(F.when(kept, 0).otherwise(1)).alias("chunks_dropped"),
            F.sum(F.when(kept, F.col("chunk_tokens")).otherwise(0)).alias(
                "tokens_kept"
            ),
            F.sum(F.when(kept, 0).otherwise(F.col("chunk_tokens"))).alias(
                "tokens_dropped"
            ),
        )
    )


def cdc_dedup_rewrite_sql(chunks_sql: str) -> str:
    """DuckDB twin of :func:`cdc_dedup_rewrite` over a ``cdc_chunks_sql``
    body. The canonical pick uses the nonneg-bigint integer encoding
    (valid for the oracle fixture's doc_id; the engine side uses
    ``min(struct)`` and is id-type-agnostic)."""
    return f"""
        with occ as (
          select id, chunk_idx, chunk_text, chunk_tokens,
                 min(id * 1000000000 + chunk_idx)
                   over (partition by chunk_hash)
                   = id * 1000000000 + chunk_idx as kept
          from ({chunks_sql})
        )
        select id,
               coalesce(string_agg(case when kept then chunk_text end,
                                   ' ' order by chunk_idx), '')
                 as deduped_text,
               sum(case when kept then 1 else 0 end)::bigint as chunks_kept,
               sum(case when kept then 0 else 1 end)::bigint
                 as chunks_dropped,
               sum(case when kept then chunk_tokens else 0 end)::bigint
                 as tokens_kept,
               sum(case when kept then 0 else chunk_tokens end)::bigint
                 as tokens_dropped
        from occ
        group by id
    """
