"""Gopher-style within-document repetition filters (Rae et al. 2021,
"Scaling Language Models", table A1): the quality gates that remove
boilerplate-heavy documents before training.

Per document:

* ``dup_line_frac``       — duplicate lines / total lines;
* ``dup_line_char_frac``  — characters inside duplicate lines / chars in
  all lines (a line occurring c times contributes its length c times to
  the numerator when c > 1 — every occurrence of a duplicated line is
  boilerplate, including the first);
* ``top_bigram_char_frac`` — characters covered by the most frequent
  word 2-gram (occurrences × gram length / total token characters).

Scale design: everything is the relational form — explode lines /
tokens, two partial-aggregated ``groupBy`` shuffles keyed by
``(id, line)`` then ``id`` — because within-doc repetition is a pure
per-document computation, Catalyst map-side-combines the first
aggregation, so shuffle volume is ~distinct lines per doc, not lines.
No Python anywhere; every expression is whole-stage codegen. The
equivalent DuckDB SQL ships alongside each operator (oracle contract of
`functions/textstats.py`).

Relation to the reference engine: ``dup_line_*`` is the degenerate
single-document form of the GD chunk dictionary — a line is a chunk, a
duplicate line is a dictionary hit (`src/dict.rs:38-63`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# identical tokenization to functions/textstats._tokens
_WS = r"\s+"


def dup_line_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(id, n_lines, dup_line_frac, dup_line_char_frac)``.

    Lines are ``split(text, '\\n')`` with blank lines dropped (pure
    whitespace separators carry no boilerplate signal).
    """
    lines = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.coalesce(text_col, F.lit("")), "\n")).alias("line"),
    ).filter(F.trim("line") != "")
    per_line = lines.groupBy("id", "line").agg(F.count("*").alias("c"))
    return per_line.groupBy("id").agg(
        F.sum("c").alias("n_lines"),
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
            / F.greatest(F.sum("c"), F.lit(1)).cast("double"),
            6,
        ).alias("dup_line_frac"),
        F.round(
            F.sum(
                F.when(F.col("c") > 1, F.col("c") * F.length("line")).otherwise(0)
            )
            / F.greatest(F.sum(F.col("c") * F.length("line")), F.lit(1)).cast(
                "double"
            ),
            6,
        ).alias("dup_line_char_frac"),
    )


def dup_line_stats_sql(table: str, id_expr: str, text_expr: str) -> str:
    return f"""
        with lines as (
          select {id_expr} as id, unnest(string_split({text_expr}, chr(10))) as line
          from {table}
        ),
        nb as (select id, line from lines where trim(line) <> ''),
        per_line as (select id, line, count(*) as c from nb group by id, line)
        select id,
               sum(c)::bigint as n_lines,
               round(sum(case when c > 1 then c else 0 end)::double
                     / greatest(sum(c), 1), 6) as dup_line_frac,
               round(sum(case when c > 1 then c * length(line) else 0 end)::double
                     / greatest(sum(c * length(line)), 1), 6) as dup_line_char_frac
        from per_line group by id
    """


def top_bigram_stats_sql(table: str, id_expr: str, text_expr: str) -> str:
    toks = (
        "list_filter(string_split_regex(trim(lower(coalesce("
        f"{text_expr}, ''))), '\\s+'), x -> x <> '')"
    )
    return f"""
        with t as (select {id_expr} as id, {toks} as l from {table}),
        base as (
          select id, len(l) as n_tokens,
                 coalesce(list_sum(list_transform(l, x -> length(x))), 0)
                   as char_total,
                 list_transform(range(1, greatest(len(l), 1)),
                                i -> l[i] || ' ' || l[i + 1]) as grams
          from t
        ),
        pg as (
          select id, gram, count(*) as c
          from (select id, unnest(grams) as gram from base) group by id, gram
        ),
        top as (
          select id, c, gram,
                 row_number() over (partition by id
                                    order by c desc, gram desc) as rn
          from pg
        )
        select b.id, b.n_tokens,
               coalesce(t.c, 0) as top_bigram_count,
               round(coalesce(t.c * (length(t.gram) - 1), 0)::double
                     / greatest(b.char_total, 1), 6) as top_bigram_char_frac
        from base b left join (select * from top where rn = 1) t using (id)
        where b.n_tokens > 0
    """


def top_bigram_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(id, n_tokens, top_bigram_count, top_bigram_char_frac)``.

    Tokens are lowercased whitespace splits (textstats tokenization);
    the 2-gram stream is built with one window ``lead`` over token
    position — a per-document sort, no join. One-token documents get
    count 0 / frac 0.0 (nothing to repeat); zero-token documents emit
    no row (same drop rule as ``dup_line_stats``).
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.filter(
                F.split(F.trim(F.lower(F.coalesce(text_col, F.lit("")))), _WS),
                lambda t: t != "",
            )
        ).alias("pos", "tok"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    grams = toks.select(
        "id",
        F.length("tok").alias("tok_len"),
        F.concat_ws(" ", "tok", F.lead("tok").over(w)).alias("gram"),
        F.lead("tok").over(w).isNotNull().alias("has_next"),
    )
    per_gram = (
        grams.filter("has_next").groupBy("id", "gram").agg(F.count("*").alias("c"))
    )
    # deterministic argmax: max count, ties broken by LARGEST gram — one
    # struct-max agg; both engines compare (int, utf8-bytes) identically
    top = per_gram.groupBy("id").agg(F.max(F.struct("c", "gram")).alias("m"))
    sizes = grams.groupBy("id").agg(
        F.sum("tok_len").alias("char_total"),
        F.count("*").alias("n_tokens"),
    )
    out = sizes.join(top, "id", "left")
    return out.select(
        "id",
        "n_tokens",
        F.coalesce(F.col("m.c"), F.lit(0)).alias("top_bigram_count"),
        F.round(
            # length(gram) - 1 drops the joining space: chars in the tokens
            F.coalesce(F.col("m.c") * (F.length(F.col("m.gram")) - 1), F.lit(0))
            / F.greatest("char_total", F.lit(1)).cast("double"),
            6,
        ).alias("top_bigram_char_frac"),
    )
