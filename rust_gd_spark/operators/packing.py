"""Sequence packing: greedy next-fit assignment of documents into
fixed-token-budget training sequences (the "context-window packing"
stage of an LLM data pipeline — raw docs are far shorter than the
context length, so the loader concatenates them; doing the assignment
in the engine makes it deterministic and resumable).

Semantics (next-fit, the streaming-friendly discipline):

* documents are sharded by ``id % n_shards`` and ordered by ``id``
  within a shard — both pure functions of the key, so the packing is
  identical across retries, partitionings, and engines;
* a document joins the current open sequence iff ``fill + n_tokens <=
  capacity``, else it OPENS a new sequence at offset 0;
* a document longer than ``capacity`` gets a singleton sequence (the
  loader's truncation problem, not the packer's).

Scale design: one shuffle (``groupBy(shard)``), then an Arrow-batched
``applyInPandas`` per shard. The in-task loop is O(#sequences) numpy
``searchsorted`` steps over the cumulative token counts — NOT O(#docs)
Python steps — so a 10^12-doc corpus at 10^5 docs/shard costs a few
thousand C-level calls per task. Shard count is the parallelism knob:
pick ≫ executor count (the assignment is shard-local by construction).

Oracle: next-fit is expressible as a linear recursive CTE over
``row_number()`` order (DuckDB), so the packing is bit-checkable.

Relation to the reference engine: the open sequence plays the byte
buffer of the reference's chunker (`src/lib.rs` dedup loop) — greedy
fill, flush on overflow, remainder starts the next chunk.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

PACKED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("shard", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("seq_id", T.LongType()),
        T.StructField("seq_offset", T.LongType()),
    ]
)


def _pack_shard(pdf: pd.DataFrame, capacity: int) -> pd.DataFrame:
    pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
    tok = pdf["n_tokens"].to_numpy(dtype=np.int64)
    n = len(tok)
    cum = np.cumsum(tok)
    seq = np.empty(n, dtype=np.int64)
    off = np.empty(n, dtype=np.int64)
    i, s, base = 0, 0, 0
    while i < n:
        # widest j with cum[i..j-1] - base <= capacity; at least one doc
        j = int(np.searchsorted(cum, base + capacity, side="right"))
        if j <= i:
            j = i + 1  # oversized doc: singleton sequence
        seq[i:j] = s
        off[i] = 0
        if j > i + 1:
            off[i + 1 : j] = cum[i : j - 1] - base
        s += 1
        base = int(cum[j - 1])
        i = j
    pdf["seq_id"] = seq
    pdf["seq_offset"] = off
    return pdf[["id", "shard", "n_tokens", "seq_id", "seq_offset"]]


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    capacity: int,
    n_shards: int = 64,
) -> DataFrame:
    """``(id, shard, n_tokens, seq_id, seq_offset)`` — the packing plan.

    ``tokens_col`` is the per-document token count (compute it with
    ``functions.textstats.token_count`` or a tokenizer-specific column);
    the text itself never moves through this operator.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    slim = df.select(
        F.col(id_col).cast("long").alias("id"),
        (F.col(id_col).cast("long") % n_shards).alias("shard"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )
    return slim.groupBy("shard").applyInPandas(
        lambda pdf: _pack_shard(pdf, capacity), PACKED_SCHEMA
    )


def pack_sequences_sql(
    table: str, id_expr: str, tokens_sql: str, capacity: int, n_shards: int
) -> str:
    """Linear recursive-CTE oracle for ``pack_sequences`` (DuckDB)."""
    return f"""
        with recursive pk_docs as (
          select {id_expr} as id,
                 {id_expr} % {n_shards} as shard,
                 {tokens_sql} as n_tokens,
                 row_number() over (partition by {id_expr} % {n_shards}
                                    order by {id_expr}) as rn
          from {table}
        ),
        packed as (
          select id, shard, n_tokens, rn,
                 0::bigint as seq_id, 0::bigint as seq_offset,
                 n_tokens as fill
          from pk_docs where rn = 1
          union all
          select d.id, d.shard, d.n_tokens, d.rn,
                 case when p.fill + d.n_tokens <= {capacity}
                      then p.seq_id else p.seq_id + 1 end,
                 case when p.fill + d.n_tokens <= {capacity}
                      then p.fill else 0::bigint end,
                 case when p.fill + d.n_tokens <= {capacity}
                      then p.fill + d.n_tokens else d.n_tokens end
          from pk_docs d join packed p
            on d.shard = p.shard and d.rn = p.rn + 1
        )
        select id, shard, n_tokens, seq_id, seq_offset from packed
    """


def packing_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Packing-efficiency report over a :func:`pack_sequences` plan —
    the one-row summary a pipeline engineer reads to pick ``capacity``
    (and to catch a token-count regression inflating pad waste)::

        (n_docs, n_seqs, total_tokens, budget_tokens, pad_tokens,
         fill_frac, n_oversize_seqs, max_docs_per_seq)

    * ``budget_tokens`` = n_seqs × capacity — what the training loader
      pays; ``pad_tokens`` = Σ max(capacity − fill, 0) per sequence —
      what it wastes (an OVERSIZE singleton contributes 0 pad; it is
      counted in ``n_oversize_seqs`` instead, the loader's truncation
      problem);
    * ``fill_frac`` = total_tokens / budget_tokens, 6-dp display
      rounding of an exact integer ratio.

    Scale: one partial+final aggregation on (shard, seq_id) — the
    per-sequence fill — then a single-row global aggregate. Exact
    integer arithmetic throughout.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    per_seq = packed.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("_docs"),
        F.sum("n_tokens").alias("_fill"),
    )
    return per_seq.agg(
        F.sum("_docs").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_seqs"),
        F.sum("_fill").cast("long").alias("total_tokens"),
        (F.count(F.lit(1)) * capacity).cast("long").alias("budget_tokens"),
        F.sum(F.greatest(F.lit(capacity) - F.col("_fill"), F.lit(0)))
        .cast("long")
        .alias("pad_tokens"),
        F.sum(F.when(F.col("_fill") > capacity, 1).otherwise(0))
        .cast("long")
        .alias("n_oversize_seqs"),
        F.max("_docs").cast("long").alias("max_docs_per_seq"),
    ).select(
        "n_docs",
        "n_seqs",
        "total_tokens",
        "budget_tokens",
        "pad_tokens",
        F.round(F.col("total_tokens") / F.col("budget_tokens"), 6).alias(
            "fill_frac"
        ),
        "n_oversize_seqs",
        "max_docs_per_seq",
    )


def packing_stats_sql(packed_sql: str, capacity: int) -> str:
    """ANSI-SQL twin of :func:`packing_stats` over a packing-plan
    subquery (DuckDB-ready)."""
    return f"""
        with pk_plan as ({packed_sql}),
        per_seq as (
          select shard, seq_id, count(*) as docs, sum(n_tokens) as fill
          from pk_plan group by shard, seq_id
        )
        select sum(docs)::bigint as n_docs,
               count(*)::bigint as n_seqs,
               sum(fill)::bigint as total_tokens,
               (count(*) * {capacity})::bigint as budget_tokens,
               sum(greatest({capacity} - fill, 0))::bigint as pad_tokens,
               round(sum(fill)::double / (count(*) * {capacity}), 6)
                 as fill_frac,
               sum(case when fill > {capacity} then 1 else 0 end)::bigint
                 as n_oversize_seqs,
               max(docs)::bigint as max_docs_per_seq
        from per_seq
    """
