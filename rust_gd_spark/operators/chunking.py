"""Sliding-window document chunking (context-window preparation).

The stage between cleaning and packing in a training pipeline: split each
document into overlapping fixed-size token windows so long documents fit a
model's context while boundary-spanning content survives in the overlap.
The same primitive serves retrieval indexing (chunk-level embeddings) —
the `embedding.py` operators consume exactly this output shape.

Relation to the reference engine: this IS the reference's chunker
(`src/gd_byte_unit.rs:42-65` — fixed-length windows over an ordered
stream, short final window allowed) generalized from bytes to tokens,
with ``stride < size`` adding the overlap the reference's disjoint
chunks don't need (its dictionary matches whole chunks; near-dup and
retrieval matching benefit from shingled windows).

Windows start at token offsets 0, stride, 2·stride, … ; the count is
``ceil(max(n_tok − size, 0) / stride) + 1`` so every token is covered,
the final window may be short, and an empty/NULL document yields exactly
one empty chunk — the repo-wide split-of-empty tokenizer convention
(``minhash.tokenize``), not a reference rule: the reference's chunker
yields ZERO chunks for an empty buffer (`src/gd_byte_unit.rs:44-49` pads
a short FINAL chunk, a different case).

Scale design (10⁹+ documents): ZERO shuffles — tokenization, the window
count, and the per-window slices are all Catalyst array expressions over
the scan; ``posexplode`` multiplies rows by ~n_tok/stride but each output
row is narrow. The ``transform``/``sequence`` higher-order calls are
interpreter-evaluated (not whole-stage codegen) like ``ngrams.py`` —
acceptable because the expression count is per-chunk, not per-pair, and
everything stays JVM-side with zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .minhash import tokenize


def chunk_by_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 512,
    stride: int = 384,
) -> DataFrame:
    """``(id, chunk_idx, chunk_text, chunk_tokens)`` — overlapping
    ``size``-token windows every ``stride`` tokens, whitespace-rejoined
    from the normalized token stream (byte-identical normalization to the
    MinHash shingler, so chunk-level and document-level dedup describe
    the same spans)."""
    if size < 1 or stride < 1:
        raise ValueError(f"size and stride must be >= 1, got {size}, {stride}")
    if stride > size:
        raise ValueError(
            f"stride {stride} > size {size} would skip tokens between windows"
        )
    toks = tokenize(F.col(text_col))
    n = F.size(toks)
    # ceil-div via +stride-1: Spark's `/` promotes to double but token
    # counts are far below 2^53, so floor(double-div) equals the DuckDB
    # twin's integer // bit-for-bit
    n_chunks = (
        F.floor((F.greatest(n - size, F.lit(0)) + stride - 1) / stride).cast("int")
        + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * stride + 1, size)),
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            n.alias("_n"),
            F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
        )
        .select(
            "id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            "chunk_text",
            F.least(F.lit(size), F.col("_n") - F.col("chunk_idx") * stride)
            .cast("long")
            .alias("chunk_tokens"),
        )
    )


def chunk_by_tokens_sql(
    table: str,
    id_expr: str,
    text_expr: str,
    size: int,
    stride: int,
) -> str:
    """DuckDB twin of ``chunk_by_tokens`` — same normalization, same
    integer window arithmetic, same slice bounds."""
    norm = f"trim(regexp_replace(lower(coalesce({text_expr}, '')), '[^a-z0-9]+', ' ', 'g'))"
    toks = f"string_split_regex({norm}, '\\s+')"
    return f"""
        with t as (
          select {id_expr} as id, {toks} as toks from {table}
        ),
        n as (
          select id, toks, len(toks) as n_tok,
                 ((greatest(len(toks) - {size}, 0) + {stride} - 1) // {stride}) + 1
                   as n_chunks
          from t
        )
        select id,
               i as chunk_idx,
               array_to_string(
                 list_slice(toks, i * {stride} + 1, i * {stride} + {size}), ' '
               ) as chunk_text,
               least({size}, n_tok - i * {stride})::bigint as chunk_tokens
        from n, unnest(range(0, n_chunks)) as u(i)
    """
