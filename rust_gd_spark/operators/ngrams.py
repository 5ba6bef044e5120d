"""Corpus n-gram audit: top-k word n-grams by document frequency.

The standard corpus-inspection pass before (and after) dedup/cleaning:
which n-grams recur across the most documents? High-document-frequency
n-grams surface boilerplate ("all rights reserved"), template text, and
benchmark contamination candidates — the same spans the reference engine
would capture as highly-reused base chunks in its dictionary
(`src/dict.rs` LRU hit counts are the streaming analogue of document
frequency).

Unlike the MinHash path (`operators/minhash.py`), this operator needs the
gram STRINGS in its output (an audit is read by humans), so it builds
them with Catalyst array expressions instead of the hashed-span kernel.
``transform``/``sequence`` are higher-order expressions — evaluated in
Catalyst's interpreter, not whole-stage codegen — which is acceptable
here because the audit is a reporting query, not a per-pair hot path, and
the work stays JVM-side with zero Python.

Normalization is byte-identical to ``minhash.normalize_text`` (and to the
DuckDB oracle's builders in ``__spark_entry__``): lower → strip
non-alphanumerics → collapse/trim whitespace; rows shorter than ``w``
tokens contribute their whole normalized text, NULL included (as '').

Scale design (10^12 turns): explode → distinct(id, gram) → partial-agg
count is ONE logical shuffle pattern (the distinct and the count
partial-aggregate map-side); the final top-k is a
``TakeOrderedAndProject`` — each task keeps k rows, the driver merges
k·tasks rows, nothing global is sorted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .minhash import tokenize


def gram_strings(text_col, w: int = 2) -> Column:
    """``array<string>`` of whitespace-joined word ``w``-grams.

    Short rows (< w tokens) yield a single whole-text gram — the same
    rule as ``minhash._shingle_hash_batch`` so audit grams and dedup
    shingles describe the same spans.
    """
    toks = tokenize(text_col)
    return F.when(
        F.size(toks) >= w,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - w),
            lambda i: F.concat_ws(" ", F.slice(toks, i + F.lit(1), w)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


def top_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 2,
    k: int = 50,
) -> DataFrame:
    """``(gram, doc_freq)`` — the ``k`` grams occurring in the most
    distinct documents; ties broken by gram ascending (total order, so
    the selected set is deterministic)."""
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(gram_strings(F.col(text_col), w=w)).alias("gram"),
    ).distinct()
    freq = grams.groupBy("gram").agg(F.count("*").alias("doc_freq"))
    return freq.orderBy(F.desc("doc_freq"), F.asc("gram")).limit(k)
