"""Language-label agreement audit: the ingestion-claimed language column
vs the engine's own n-gram/stopword-profile detector, as a confusion
matrix with per-claimed-label fractions.

Web-scale corpora carry a ``lang`` column stamped by whoever crawled the
page — and crawler language tags are wrong often enough that training
mixtures planned on them silently drift. This audit cross-tabulates the
claimed label against ``functions.textstats.lang_id`` (the same detector
``doc_quality_lang`` scores with, so the matrix is consistent with the
quality gate): a healthy source shows mass on the diagonal; a claimed
label whose mass lands on ``und`` or another language is a mislabeled
feed to quarantine before mixture planning trusts it.

Output::

    (claimed, detected, n_docs, claimed_total, frac)

``frac`` = n_docs / claimed_total — the row-normalized confusion matrix.

Scale: one partial+final aggregation on (claimed, detected) — language
cardinality is tiny, so the cell table is trivially small — plus one
partial agg on claimed and an equi-join between the two (both sides
post-aggregation, broadcast-sized). The corpus is scanned once; the
detector is pure codegen (no UDF).

Reference analogue: the reference validates its Hamming syndrome tables
against an independently-computed residue table (`src/libecc.rs` table
checks); here the independently-computed value is the detected language
and the "table" is the ingestion metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rust_gd_spark.functions.textstats import lang_id, lang_id_sql


def lang_agreement(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Claimed-vs-detected language confusion matrix (module docstring).

    NULL claimed labels group under ``und`` (the detector's own
    no-confident-profile value), so the matrix is total over the corpus.
    """
    d = df.select(
        F.coalesce(F.col(lang_col), F.lit("und")).alias("claimed"),
        lang_id(F.col(text_col)).alias("detected"),
    )
    cells = d.groupBy("claimed", "detected").agg(F.count("*").alias("n_docs"))
    # claimed totals are derived FROM the cells (sum of the row), never
    # from a second aggregation over d — two different partitionings of
    # the raw projection would make Catalyst re-evaluate the full-text
    # detector regex per branch: two corpus scans for one matrix
    totals = cells.groupBy("claimed").agg(
        F.sum("n_docs").alias("claimed_total")
    )
    return cells.join(totals, "claimed").select(
        "claimed",
        "detected",
        "n_docs",
        "claimed_total",
        F.round(F.col("n_docs") / F.col("claimed_total"), 6).alias("frac"),
    )


def lang_agreement_sql(
    table: str,
    text_col: str = "text",
    lang_col: str = "lang",
) -> str:
    """ANSI-SQL twin of :func:`lang_agreement` (DuckDB-ready) — the same
    stopword-profile detector expression via ``lang_id_sql``."""
    det = lang_id_sql(text_col)
    return f"""
        with d as (
          select coalesce({lang_col}, 'und') as claimed,
                 {det} as detected
          from {table}
        ),
        cells as (
          select claimed, detected, count(*) as n_docs
          from d group by claimed, detected
        ),
        totals as (
          select claimed, sum(n_docs) as claimed_total
          from cells group by claimed
        )
        select c.claimed, c.detected,
               c.n_docs::bigint as n_docs,
               t.claimed_total::bigint as claimed_total,
               round(c.n_docs::double / t.claimed_total, 6) as frac
        from cells c join totals t using (claimed)
    """
