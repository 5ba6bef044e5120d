"""Per-document TF-IDF keyword extraction.

The corpus-analysis sibling of `operators/ngrams.py`: instead of the
corpus-global top n-grams, surface each document's most DISTINCTIVE
terms — high term frequency in the document, low document frequency in
the corpus. Standard uses in a training-data pipeline: topical tagging
for mixture planning, keyword features for the quality classifier, and
cheap lexical retrieval keys.

    score(d, t) = tf(d, t) · ln(N / df(t))

with raw counts (no length normalization — keeps the arithmetic
integer·ln(integer/integer), reproducible across engines at the repo's
6-dp rounding doctrine) and ties broken by term ascending so the top-k
set is a deterministic total order.

Normalization is byte-identical to the MinHash tokenizer, so "term"
means the same thing here as in every other text operator.

Scale design (10⁹+ docs): tf is ONE partial-agg shuffle over the
exploded token stream (map-side combine absorbs within-partition
repeats); df reuses the same aggregated (id, term) table — one more
partial agg, NOT a second scan of text; N is a 1-row aggregate
cross-joined (broadcast) onto the term table; the per-doc top-k is
``row_number() ≤ k`` which Spark ≥ 3.5 executes as WindowGroupLimit —
each task keeps k rows per id BEFORE the window shuffle, so the sort
never sees the full per-doc term list. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .minhash import tokenize


def tfidf_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """``(id, term, tf, doc_freq, score)`` — each document's top-``k``
    terms by TF-IDF, score rounded to 6 dp, ties by term ascending."""
    terms = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    )
    tf = terms.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).alias("n_docs")
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("doc_freq")),
                6,
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("id", "term", "tf", "doc_freq", "score")
    )


def tfidf_topk_sql(
    table: str,
    id_expr: str,
    text_expr: str,
    k: int,
) -> str:
    """DuckDB twin — same tokenizer, same score arithmetic (tf ·
    ln(N/df) rounded at 6 dp), same tie-break."""
    norm = f"trim(regexp_replace(lower(coalesce({text_expr}, '')), '[^a-z0-9]+', ' ', 'g'))"
    toks = f"string_split_regex({norm}, '\\s+')"
    return f"""
        with terms as (
          select {id_expr} as id, unnest({toks}) as term from {table}
        ),
        tf as (
          select id, term, count(*) as tf from terms group by 1, 2
        ),
        dfreq as (
          select term, count(*) as doc_freq from tf group by 1
        ),
        n as (
          select count(distinct {id_expr}) as n_docs from {table}
        ),
        scored as (
          select tf.id, tf.term, tf.tf, dfreq.doc_freq,
                 round(tf.tf * ln(n.n_docs::double / dfreq.doc_freq), 6)
                   as score
          from tf join dfreq using (term), n
        )
        select id, term, tf, doc_freq, score
        from scored
        qualify row_number() over (
          partition by id order by score desc, term asc
        ) <= {k}
    """
