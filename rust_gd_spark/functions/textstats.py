"""Text analysis columns: token stats, quality score, language-ID,
document fingerprint. All JVM-side native expressions.

Parity contract: each builder has a ``*_SQL`` template producing the
equivalent ANSI SQL (DuckDB dialect) from the SAME Python constants, so the
driver's oracle cross-check exercises the real formula, not a lookalike.

Regex note: only constructs with identical semantics in Java regex (Spark)
and RE2 (DuckDB) are used — explicit character classes, ``\\s+``; no
lookaround, no \\p classes.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# explicit punct class — identical byte set in Java regex and RE2
PUNCT_CLASS = r"[!-/:-@\[-`{-~]"

# tiny seeded stopword profiles for the language-ID heuristic
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on",
           "with", "as", "this", "that", "are", "was", "be", "at", "or", "an"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den",
           "von", "mit", "auf", "für", "im", "nicht", "sich", "auch", "es"),
    "fr": ("le", "la", "les", "de", "des", "et", "est", "un", "une", "du",
           "en", "que", "qui", "dans", "pour", "pas", "au", "sur", "ce"),
    "es": ("el", "la", "los", "las", "de", "y", "es", "un", "una", "del",
           "en", "que", "no", "por", "con", "para", "se", "su", "al"),
}
LANG_MIN_RATIO = 0.05  # below this for every profile → "und"

STOPWORDS_EN = LANG_PROFILES["en"]

FINGERPRINT_WINDOW = 8  # tokens per fingerprint window


def _tokens(text_col: Column) -> Column:
    toks = F.split(F.trim(F.lower(text_col)), r"\s+")
    return F.filter(toks, lambda t: t != "")


def token_count(text_col: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    return F.size(_tokens(text_col))


def bpe_ish_token_count(text_col: Column) -> Column:
    """BPE-ish proxy: count of letter-runs, digit-runs and punct marks —
    splits 'don't stop123!' into 6 units, closer to subword tokenizers
    than whitespace. Native regexp_count, JVM-side."""
    return F.regexp_count(F.lower(text_col), F.lit(r"[a-z]+|[0-9]+|[!-/:-@\[-`{-~]"))


def punct_ratio(text_col: Column) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    n = F.length(text_col)
    p = n - F.length(F.regexp_replace(text_col, PUNCT_CLASS, ""))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(text_col: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    toks = _tokens(text_col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def mean_word_len(text_col: Column) -> Column:
    toks = _tokens(text_col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    n = F.size(toks)
    return F.when(n > 0, total.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(text_col: Column, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    """Deterministic [0,1] quality heuristic (Gopher/C4-style signals):
    length band + low punctuation + stopword presence + sane word length."""
    nt = token_count(text_col).cast("double")
    len_score = F.least(nt / F.lit(50.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(text_col) * 5.0, F.lit(1.0))
    stop_score = F.least(stopword_ratio(text_col, stopwords) * 5.0, F.lit(1.0))
    mwl = mean_word_len(text_col)
    wl_score = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return (
        0.25 * len_score + 0.25 * punct_score + 0.25 * stop_score + 0.25 * wl_score
    )


def lang_ratio(text_col: Column, lang: str) -> Column:
    return stopword_ratio(text_col, LANG_PROFILES[lang])


def lang_id(text_col: Column) -> Column:
    """argmax over stopword-profile hit ratios; 'und' if all < threshold.
    Deterministic tie-break: profile order en > de > fr > es."""
    ratios = {lg: lang_ratio(text_col, lg) for lg in LANG_PROFILES}
    best = F.greatest(*ratios.values())
    out = F.lit("und")
    # reversed so earlier profiles win ties
    for lg in reversed(list(LANG_PROFILES)):
        out = F.when((ratios[lg] >= LANG_MIN_RATIO) & (ratios[lg] == best), F.lit(lg)).otherwise(out)
    return out


def doc_fingerprint(text_col: Column, window: int = FINGERPRINT_WINDOW) -> Column:
    """Rolling window fingerprint: min md5 over ``window``-token windows
    (whole doc if shorter). Invariant to where a duplicated block sits in
    the document; md5 so the oracle reproduces it bit-exactly."""
    toks = _tokens(text_col)
    n = F.size(toks)
    windows = F.when(
        n >= window,
        F.transform(
            F.sequence(F.lit(0), n - window),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, window)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.array_min(F.transform(windows, lambda s: F.md5(s)))


# ---------------------------------------------------------------------------
# DuckDB-dialect SQL builders (same constants → same values)
# ---------------------------------------------------------------------------

_SQL_TOKENS = "list_filter(string_split_regex(trim(lower({t})), '\\s+'), x -> x <> '')"


def token_count_sql(t: str) -> str:
    return f"len({_SQL_TOKENS.format(t=t)})"


def bpe_ish_token_count_sql(t: str) -> str:
    return (
        "len(regexp_extract_all(lower(" + t + "), '[a-z]+|[0-9]+|[!-/:-@\\[-`{{-~]'))"
    ).replace("{{", "{").replace("}}", "}")


def punct_ratio_sql(t: str) -> str:
    cls = "[!-/:-@\\[-`{-~]"
    return (
        f"case when length({t}) > 0 then "
        f"(length({t}) - length(regexp_replace({t}, '{cls}', '', 'g')))::double / length({t}) "
        f"else 0.0 end"
    )


def _in_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def stopword_ratio_sql(t: str, stopwords: tuple[str, ...] = STOPWORDS_EN) -> str:
    toks = _SQL_TOKENS.format(t=t)
    return (
        f"case when len({toks}) > 0 then "
        f"len(list_filter({toks}, x -> x in ({_in_list(stopwords)})))::double / len({toks}) "
        f"else 0.0 end"
    )


def mean_word_len_sql(t: str) -> str:
    toks = _SQL_TOKENS.format(t=t)
    return (
        f"case when len({toks}) > 0 then "
        f"list_sum(list_transform({toks}, x -> length(x)))::double / len({toks}) "
        f"else 0.0 end"
    )


def quality_score_sql(t: str, stopwords: tuple[str, ...] = STOPWORDS_EN) -> str:
    nt = token_count_sql(t)
    return (
        f"0.25 * least({nt}::double / 50.0, 1.0)"
        f" + 0.25 * (1.0 - least({punct_ratio_sql(t)} * 5.0, 1.0))"
        f" + 0.25 * least({stopword_ratio_sql(t, stopwords)} * 5.0, 1.0)"
        f" + 0.25 * (case when {mean_word_len_sql(t)} between 3.0 and 10.0 then 1.0 else 0.0 end)"
    )


def lang_id_sql(t: str) -> str:
    ratios = {lg: stopword_ratio_sql(t, ws) for lg, ws in LANG_PROFILES.items()}
    best = "greatest(" + ", ".join(ratios.values()) + ")"
    expr = "'und'"
    for lg in reversed(list(LANG_PROFILES)):
        expr = (
            f"case when {ratios[lg]} >= {LANG_MIN_RATIO} and {ratios[lg]} = {best} "
            f"then '{lg}' else {expr} end"
        )
    return expr


def doc_fingerprint_sql(t: str, window: int = FINGERPRINT_WINDOW) -> str:
    toks = _SQL_TOKENS.format(t=t)
    return (
        f"list_min(list_transform("
        f"case when len({toks}) >= {window} then "
        f"list_transform(range(0, len({toks}) - {window} + 1), "
        f"i -> coalesce(array_to_string(list_slice({toks}, i + 1, i + {window}), ' '), '')) "
        f"else [coalesce(array_to_string({toks}, ' '), '')] end, "
        f"w -> md5(w)))"
    )
