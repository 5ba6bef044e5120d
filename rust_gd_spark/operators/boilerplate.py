"""Corpus-level boilerplate line removal (CCNet Sec. 4.1 paragraph
dedup / RefinedWeb line-level dedup): drop lines that recur across many
*distinct* documents — navigation chrome, cookie banners, signatures,
license footers — while preserving each document's remaining line order
byte-exactly.

This is the cross-document complement of the within-document
``operators/repetition.py`` gates, and the line-granularity analogue of
the GD chunk dictionary: a line recurring across documents is a
corpus-level dictionary hit (reference: `src/dict.rs:38-63` keys chunks
by content and counts recurrence the same way; here the "chunk" is a
line and the dictionary is a distributed aggregation instead of an LRU
map).

Semantics (deterministic, engine-portable — the DuckDB oracle ships
alongside):

* lines = ``split(text, '\\n')``; a line is *content* iff
  ``trim(line) != ''``;
* a content line is boilerplate iff it occurs in >= ``min_docs``
  distinct documents (exact string match, every occurrence removed —
  including in documents where it occurs only once);
* blank / whitespace-only lines are never removed (they carry document
  structure, not boilerplate), and survive reassembly in place;
* ``cleaned_text`` re-joins surviving lines with ``'\\n'`` in original
  order.

Scale design (the 100 TB shape): three shuffles over the line stream,
each the minimal one —

1. ``groupBy(line).agg(count_distinct(id))`` — Catalyst plans the
   distinct as a partial aggregation on ``(line, id)``, so map-side
   combine collapses within-document repeats before anything shuffles;
2. a left join of all lines against the (much smaller) common-line set,
   keyed on the line string. The strategy is left to AQE: at small
   scale it converts to broadcast from runtime statistics; at corpus
   scale the common set (every line recurring across documents) is NOT
   broadcastable and the shuffle-hash join on ``line`` is the right
   plan — per-key right side is exactly one row, so skewed left keys
   ("Subscribe to our newsletter" x 10M docs) are handled by AQE
   skew-partition splitting, never by a hot build side;
3. ``groupBy(id)`` reassembly — one ``array_sort(collect_list(...))``
   per document; bounded by document size, not corpus size.

No Python anywhere: every expression is whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
) -> DataFrame:
    """``(id, n_lines, n_removed, removed_char_frac, cleaned_text)``.

    ``n_lines`` counts content lines (pre-removal); ``n_removed`` the
    removed ones; ``removed_char_frac`` = removed chars / content chars
    (rounded to 6 dp, 0.0 for line-less documents). One output row per
    input row, same ``id`` values.
    """
    if min_docs < 1:
        raise ValueError("min_docs must be >= 1")

    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(F.coalesce(text_col, F.lit("")), "\n")
        ).alias("pos", "line"),
    ).withColumn("is_content", F.trim("line") != "")

    common = (
        lines.filter("is_content")
        .groupBy("line")
        .agg(F.count_distinct("id").alias("doc_count"))
        .filter(F.col("doc_count") >= min_docs)
        .select("line", F.lit(True).alias("is_bp"))
    )

    marked = lines.join(common, "line", "left")
    removed = F.col("is_bp").isNotNull()
    return marked.groupBy("id").agg(
        F.sum(F.col("is_content").cast("long")).alias("n_lines"),
        F.sum(removed.cast("long")).alias("n_removed"),
        F.round(
            F.sum(F.when(removed, F.length("line")).otherwise(0))
            / F.greatest(
                F.sum(F.when(F.col("is_content"), F.length("line")).otherwise(0)),
                F.lit(1),
            ).cast("double"),
            6,
        ).alias("removed_char_frac"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~removed, F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
        ).alias("cleaned_text"),
    )


def boilerplate_lines_sql(
    table: str, id_expr: str, text_expr: str, min_docs: int = 2
) -> str:
    """DuckDB oracle — identical semantics in list form (positions are
    implicit in list order, so no ordinality construct is needed)."""
    return f"""
        with t as (
          select {id_expr} as id,
                 string_split(coalesce({text_expr}, ''), chr(10)) as l
          from {table}
        ),
        content as (
          select distinct id, line
          from (select id, unnest(l) as line from t)
          where trim(line) <> ''
        ),
        common as (
          select line from content group by line
          having count(*) >= {min_docs}
        ),
        cl as (select coalesce(list(line), []) as cl from common)
        select t.id,
               len(list_filter(l, x -> trim(x) <> '')) as n_lines,
               len(list_filter(l, x -> list_contains(cl, x))) as n_removed,
               round(
                 coalesce(list_sum(list_transform(
                   list_filter(l, x -> list_contains(cl, x)),
                   x -> length(x))), 0)::double
                 / greatest(coalesce(list_sum(list_transform(
                     list_filter(l, x -> trim(x) <> ''),
                     x -> length(x))), 0), 1),
                 6) as removed_char_frac,
               coalesce(array_to_string(
                 list_filter(l, x -> not list_contains(cl, x)),
                 chr(10)), '') as cleaned_text
        from t cross join cl
    """
