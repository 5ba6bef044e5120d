"""C4-style heuristic line filtering (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning", Sec. 2.2 — the cleaning pass behind the C4
corpus, reused by most web-scale training pipelines since):

* keep only lines that end in terminal punctuation (``. ! ? "`` or an
  apostrophe/closing quote) AND contain at least ``min_words``
  whitespace-delimited words;
* flag documents containing a bad marker — ``lorem ipsum``, a curly
  brace ``{`` (code/template leakage), or the word ``javascript``
  (cookie/JS warnings) — case-insensitively;
* a document is kept iff it retains at least ``min_kept_lines`` lines
  and carries no bad marker.

The operator returns the per-document decision columns and the cleaned
text; filtering on ``keep_doc`` is the caller's choice (a training-prep
composite wants the audit trail, not a silent drop).

Scale design: ZERO shuffles — every rule is a per-row expression over
the scan (array HOFs + regexp on the JVM; no Python, no UDFs), so the
pass is trivially 100 TB-parallel and pipelines into whatever shuffle
follows it. The DuckDB SQL twin ships alongside (oracle contract of
`functions/textstats.py`); both engines share the same regex/constants
below.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# terminal punctuation per C4: period, exclamation, question mark,
# double quote, or apostrophe/right-single-quote at end of line
_TERMINAL_RE = "[.!?\"']$"
_BAD_MARKERS = ("lorem ipsum", "{", "javascript")
_WS = r"\s+"


def _kept_lines(text: Column, min_words: int) -> Column:
    lines = F.split(F.coalesce(text, F.lit("")), "\n")
    return F.filter(
        lines,
        lambda l: (F.trim(l) != "")
        & F.trim(l).rlike(_TERMINAL_RE)
        & (F.size(F.split(F.trim(l), _WS)) >= min_words),
    )


def has_bad_marker(text: Column) -> Column:
    low = F.lower(F.coalesce(text, F.lit("")))
    cond = F.lit(False)
    for m in _BAD_MARKERS:
        cond = cond | low.contains(m)
    return cond


def c4_line_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """``(id, n_lines, n_kept, has_bad_marker, keep_doc, cleaned_text)``.

    ``n_lines`` counts non-blank lines; ``n_kept`` the ones surviving
    the line rules; ``cleaned_text`` re-joins survivors with ``'\\n'``
    in original order.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(t, "\n")
    kept = _kept_lines(F.col(text_col), min_words)
    bad = has_bad_marker(F.col(text_col))
    n_kept = F.size(kept)
    return df.select(
        F.col(id_col).alias("id"),
        F.size(F.filter(lines, lambda l: F.trim(l) != "")).alias("n_lines"),
        n_kept.alias("n_kept"),
        bad.alias("has_bad_marker"),
        ((n_kept >= min_kept_lines) & ~bad).alias("keep_doc"),
        F.concat_ws("\n", kept).alias("cleaned_text"),
    )


def c4_line_filter_sql(
    table: str,
    id_expr: str,
    text_expr: str,
    min_words: int = 5,
    min_kept_lines: int = 3,
) -> str:
    """DuckDB twin — same constants, same rules."""
    t = f"coalesce({text_expr}, '')"
    # '' escapes a single quote inside a SQL string literal
    terminal = "'[.!?\"'']$'"
    kept = (
        f"list_filter(string_split({t}, chr(10)), x -> trim(x) <> '' "
        f"and regexp_matches(trim(x), {terminal}) "
        f"and len(string_split_regex(trim(x), '\\s+')) >= {min_words})"
    )
    bad = " or ".join(f"contains(lower({t}), '{m}')" for m in _BAD_MARKERS)
    return f"""
        select {id_expr} as id,
               len(list_filter(string_split({t}, chr(10)),
                               x -> trim(x) <> '')) as n_lines,
               len({kept}) as n_kept,
               ({bad}) as has_bad_marker,
               (len({kept}) >= {min_kept_lines} and not ({bad})) as keep_doc,
               coalesce(array_to_string({kept}, chr(10)), '') as cleaned_text
        from {table}
    """
