"""DSIR: data selection via hashed-n-gram importance weights.

Xie et al., "Data Selection for Language Models via Importance
Resampling" (NeurIPS 2023): given a large raw corpus and a small
target set (the domain you want more of), estimate two bag-of-hashed-
n-grams unigram distributions p_target and p_raw over B hash buckets,
score every raw document by its importance log-weight

    log w(d) = sum_b  c_d[b] * ( ln p_target[b] - ln p_raw[b] )

(c_d = the document's bucket-count vector), then resample documents
with probability proportional to w(d). The bucketed feature space
makes the estimator cheap and fixed-size regardless of vocabulary.

This module computes the per-document log-weights relationally; the
resampling step composes with the existing deterministic samplers
(`sampling.weighted_sample` on a normalized weight, or rank-based
top-fraction selection).

Feature extraction: word bigrams over the repo-standard tokenizer
(byte-identical to the MinHash shingler), bucketed by the first 13 hex
chars of md5(bigram:seed) taken modulo ``n_buckets`` — 52 bits is
IEEE-double-exact and `'0x…'::ubigint` / `F.conv(…,16,10)` agree
bit-for-bit between DuckDB and Spark (the same parity trick
`sampling.weighted_sample` pins with its own oracle). Distributions
are Laplace-smoothed with ``alpha`` pseudo-counts per bucket so empty
buckets never produce ln(0).

Scale design (10^9+ raw docs, small target): bigrams come from ONE
narrow shuffle of the (id, pos, term) token stream — a window `lead()`
per document (all codegen; the zero-shuffle alternative of exploding
positions alongside the full token array copies the array into every
output row, O(tokens^2) bytes per long document, so the one narrow
exchange is the safe plan at corpus scale). Per-doc bucket counts are
one partial-agg shuffle; the corpus-level bucket histogram re-uses
that aggregate's exchange (ReuseExchange — same subplan feeds both the
histogram and the scoring join). The log-ratio table is at most
``n_buckets`` rows (default 8192) — broadcast, never shuffled against
the corpus. The target set is small by definition and is read once.

Reference analogue: the dictionary-probe asymmetry of rust-gd's
`BasisDict` (`src/dict.rs:38-63`) — a fixed-size table (here B buckets,
there dict_size bases) summarizes an unbounded stream, and every
document is scored by lookups into it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .minhash import tokenize

_DEFAULT_BUCKETS = 8192


def _doc_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
    seed: int,
) -> DataFrame:
    """``(id, bucket, c)`` — per-document hashed-bigram bucket counts.

    Documents with fewer than two tokens produce no rows here; callers
    re-attach them with a left join (their count vector is all-zero, so
    their log-weight is exactly 0).
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "term"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    bigrams = (
        toks.withColumn("nxt", F.lead("term").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            "id",
            F.concat_ws(" ", "term", "nxt").alias("ng"),
        )
    )
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("ng"), F.lit(str(seed)))),
                1,
                13,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(n_buckets),
    ).alias("bucket")
    return bigrams.select("id", bucket).groupBy("id", "bucket").agg(
        F.count("*").alias("c")
    )


def dsir_logweights(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_id_col: str | None = None,
    target_text_col: str | None = None,
    n_buckets: int = _DEFAULT_BUCKETS,
    seed: int = 0,
    alpha: float = 0.5,
) -> DataFrame:
    """``(id, n_ngrams, logw)`` for every row of ``df``: the DSIR
    importance log-weight of the document toward ``target``'s hashed-
    bigram distribution, rounded to 6 dp. Documents with no bigrams
    (fewer than two tokens) get ``n_ngrams = 0, logw = 0.0``.

    Identity property: when ``target`` and ``df`` hold the same text,
    both distributions coincide and every log-weight is exactly 0.
    """
    raw_b = _doc_buckets(df, id_col, text_col, n_buckets, seed)
    tgt_b = _doc_buckets(
        target,
        target_id_col or id_col,
        target_text_col or text_col,
        n_buckets,
        seed,
    )
    raw_hist = raw_b.groupBy("bucket").agg(F.sum("c").alias("cr"))
    tgt_hist = tgt_b.groupBy("bucket").agg(F.sum("c").alias("ct"))
    raw_tot = raw_hist.select(F.sum("cr").alias("tr"))
    tgt_tot = tgt_hist.select(F.sum("ct").alias("tt"))
    smooth = F.lit(alpha) * F.lit(n_buckets)
    # Every bucket seen in the corpus is in raw_hist by construction;
    # buckets the target never hit smooth to alpha pseudo-counts.
    ratio = (
        raw_hist.join(tgt_hist, "bucket", "left")
        .crossJoin(F.broadcast(tgt_tot))
        .crossJoin(F.broadcast(raw_tot))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(alpha))
                    / (F.col("tt") + smooth)
                )
                - F.log((F.col("cr") + F.lit(alpha)) / (F.col("tr") + smooth))
            ).alias("lr"),
        )
    )
    scored = (
        raw_b.join(F.broadcast(ratio), "bucket")
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_ngrams"),
            F.round(F.sum(F.col("c") * F.col("lr")), 6).alias("logw"),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("logw", F.lit(0.0)).alias("logw"),
        )
    )


def _norm_sql(text_expr: str) -> str:
    return (
        f"trim(regexp_replace(lower(coalesce({text_expr}, '')),"
        f" '[^a-z0-9]+', ' ', 'g'))"
    )


def _doc_buckets_sql(
    table: str, id_expr: str, text_expr: str, n_buckets: int, seed: int
) -> str:
    """DuckDB CTE body computing ``(id, bucket, c)`` — the twin of
    `_doc_buckets`: same tokenizer, same bigram order, same 52-bit md5
    bucket arithmetic."""
    toks = f"string_split_regex({_norm_sql(text_expr)}, '\\s+')"
    return f"""
        select id,
               ('0x' || substr(md5(ng || ':' || '{seed}'), 1, 13))::ubigint
                 % {n_buckets} as bucket,
               count(*) as c
        from (
          select id,
                 term || ' ' || lead(term) over (
                   partition by id order by ord) as ng
          from (
            select {id_expr} as id,
                   unnest({toks}) as term,
                   unnest(range(1, len({toks}) + 1)) as ord
            from {table}
          )
          qualify lead(term) over (partition by id order by ord)
            is not null
        )
        group by 1, 2
    """


def dsir_logweights_sql(
    table: str,
    target_table: str,
    id_expr: str,
    text_expr: str,
    target_id_expr: str | None = None,
    target_text_expr: str | None = None,
    n_buckets: int = _DEFAULT_BUCKETS,
    seed: int = 0,
    alpha: float = 0.5,
) -> str:
    """DuckDB twin of `dsir_logweights`."""
    raw_b = _doc_buckets_sql(table, id_expr, text_expr, n_buckets, seed)
    tgt_b = _doc_buckets_sql(
        target_table,
        target_id_expr or id_expr,
        target_text_expr or text_expr,
        n_buckets,
        seed,
    )
    smooth = f"{alpha} * {n_buckets}"
    return f"""
        with raw_b as ({raw_b}),
        tgt_b as ({tgt_b}),
        raw_hist as ( select bucket, sum(c) as cr from raw_b group by 1 ),
        tgt_hist as ( select bucket, sum(c) as ct from tgt_b group by 1 ),
        raw_tot as ( select sum(cr) as tr from raw_hist ),
        tgt_tot as ( select sum(ct) as tt from tgt_hist ),
        ratio as (
          select raw_hist.bucket,
                 ln((coalesce(tgt_hist.ct, 0) + {alpha})
                    / (tgt_tot.tt + {smooth}))
                 - ln((raw_hist.cr + {alpha}) / (raw_tot.tr + {smooth}))
                   as lr
          from raw_hist
          left join tgt_hist using (bucket), raw_tot, tgt_tot
        ),
        scored as (
          select raw_b.id, sum(raw_b.c)::bigint as n_ngrams,
                 round(sum(raw_b.c * ratio.lr), 6) as logw
          from raw_b join ratio using (bucket)
          group by 1
        )
        select {id_expr} as id,
               coalesce(scored.n_ngrams, 0) as n_ngrams,
               coalesce(scored.logw, 0.0) as logw
        from {table}
        left join scored on scored.id = {id_expr}
    """
