"""Unigram language-model cross-entropy scoring (CCNet-style).

CCNet (Wenzek et al., LREC 2020) ranks web documents by the perplexity
of a language model trained on a trusted corpus and keeps the
low-perplexity head/middle. The sandbox has no KenLM, but the unigram
special case is fully relational: estimate p(term) from the corpus
itself (or any reference corpus) and score each document by its
per-token cross-entropy

    xent(d) = -(1/|d|) * sum_t tf(d, t) * ln(p(t)),   p(t) = ct(t) / T

with raw maximum-likelihood probabilities — every term of every scored
document appears in the counting corpus by construction when the two
are the same frame, so no smoothing is needed (``score_against`` adds
Laplace smoothing for the cross-corpus form, where unseen terms must
not produce ln(0)).

High xent = rare/unusual vocabulary (spam, mojibake, code dumps in a
prose corpus); low xent = stopword-heavy boilerplate. Downstream the
score feeds the same gates as `functions/quality_model.py` (fixed
threshold) or `operators/sampling.py` (stratified keep fractions per
score band).

We report the natural-log cross-entropy, NOT perplexity: ppl = e^xent
would put a transcendental whose last-ulp behavior differs between the
JVM's `Math.exp` and DuckDB's libm on top of the score right before the
6-dp oracle round; ln() alone already matches bit-for-bit in practice
(the `tfidf_topk` oracle pins that), and xent is monotone in ppl so
every downstream gate is equivalent.

Tokenization is byte-identical to the MinHash shingler
(`operators/minhash.tokenize`), so "term" means the same thing here as
in every other text operator; an empty or NULL document normalizes to
the single empty token '' in BOTH engines (the split-of-empty
convention the tfidf oracle also relies on) and therefore gets a score
instead of vanishing.

Scale design (10^9+ docs): tf is ONE partial-agg shuffle over the
exploded token stream (map-side combine absorbs within-partition
repeats); corpus counts reuse the tf table — one more partial agg over
the (term) key, NOT a second scan of text (the (id, term) exchange is
shared between the two consumers, Catalyst's ReuseExchange); the token
total T is a 1-row aggregate broadcast via crossJoin; the per-doc
rollup is one agg back on id. No Python anywhere, no window, no sort.

Reference analogue: the dedup-rate observability prints of rust-gd
(`src/lib.rs:131-135`) — a corpus-level statistical signal computed as
a by-product of the same pass that builds the dictionary; here the
"dictionary" is the unigram count table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .minhash import tokenize


def _tf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(tokenize(F.col(text_col))).alias("term"),
        )
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )


def unigram_xent(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id, n_tokens, xent)`` — per-document unigram cross-entropy in
    nats under the corpus's own maximum-likelihood unigram distribution,
    rounded to 6 dp. Deterministic: pure function of the corpus text."""
    tf = _tf(df, id_col, text_col)
    ct = tf.groupBy("term").agg(F.sum("tf").alias("ct"))
    total = tf.select(F.sum("tf").alias("total"))
    return (
        tf.join(ct, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(
                -F.sum(
                    F.col("tf")
                    * F.log(F.col("ct").cast("double") / F.col("total"))
                )
                / F.sum("tf"),
                6,
            ).alias("xent"),
        )
    )


def score_against(
    df: DataFrame,
    ref: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_id_col: str | None = None,
    ref_text_col: str | None = None,
    alpha: float = 0.5,
) -> DataFrame:
    """Cross-corpus form: score ``df`` under a unigram LM estimated from
    ``ref`` (the trusted corpus), Laplace-smoothed so terms unseen in
    ``ref`` contribute ln((0+alpha)/(T+alpha*V)) instead of ln(0), with
    V = |ref vocabulary| + 1 (one shared unseen type). Same output
    schema as `unigram_xent`."""
    tf = _tf(df, id_col, text_col)
    ref_ct = _tf(
        ref, ref_id_col or id_col, ref_text_col or text_col
    ).groupBy("term").agg(F.sum("tf").alias("ct"))
    denom = ref_ct.select(
        F.sum("ct").alias("total"),
        (F.count("*") + F.lit(1)).alias("vocab"),
    )
    return (
        tf.join(ref_ct, "term", "left")
        .crossJoin(F.broadcast(denom))
        .groupBy("id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(
                -F.sum(
                    F.col("tf")
                    * F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(alpha))
                        / (F.col("total") + F.lit(alpha) * F.col("vocab"))
                    )
                )
                / F.sum("tf"),
                6,
            ).alias("xent"),
        )
    )


def _norm_sql(text_expr: str) -> str:
    return (
        f"trim(regexp_replace(lower(coalesce({text_expr}, '')),"
        f" '[^a-z0-9]+', ' ', 'g'))"
    )


def unigram_xent_sql(table: str, id_expr: str, text_expr: str) -> str:
    """DuckDB twin — same tokenizer, same ML estimate, same 6-dp round."""
    toks = f"string_split_regex({_norm_sql(text_expr)}, '\\s+')"
    return f"""
        with tf as (
          select id, term, count(*) as tf from (
            select {id_expr} as id, unnest({toks}) as term from {table}
          ) group by 1, 2
        ),
        ct as ( select term, sum(tf) as ct from tf group by 1 ),
        tot as ( select sum(tf) as total from tf )
        select tf.id, sum(tf.tf)::bigint as n_tokens,
               round(-sum(tf.tf * ln(ct.ct::double / tot.total))
                     / sum(tf.tf), 6) as xent
        from tf join ct using (term), tot
        group by tf.id
    """


def score_against_sql(
    table: str,
    ref_table: str,
    id_expr: str,
    text_expr: str,
    ref_id_expr: str | None = None,
    ref_text_expr: str | None = None,
    alpha: float = 0.5,
) -> str:
    """DuckDB twin of `score_against`."""
    toks = f"string_split_regex({_norm_sql(text_expr)}, '\\s+')"
    ref_toks = (
        f"string_split_regex({_norm_sql(ref_text_expr or text_expr)},"
        f" '\\s+')"
    )
    rid = ref_id_expr or id_expr
    return f"""
        with tf as (
          select id, term, count(*) as tf from (
            select {id_expr} as id, unnest({toks}) as term from {table}
          ) group by 1, 2
        ),
        ref_ct as (
          select term, sum(tf) as ct from (
            select id, term, count(*) as tf from (
              select {rid} as id, unnest({ref_toks}) as term
              from {ref_table}
            ) group by 1, 2
          ) group by 1
        ),
        denom as (
          select sum(ct) as total, count(*) + 1 as vocab from ref_ct
        )
        select tf.id, sum(tf.tf)::bigint as n_tokens,
               round(-sum(tf.tf * ln(
                   (coalesce(ref_ct.ct, 0) + {alpha})
                   / (denom.total + {alpha} * denom.vocab)))
                     / sum(tf.tf), 6) as xent
        from tf left join ref_ct using (term), denom
        group by tf.id
    """
