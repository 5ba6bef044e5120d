"""URL canonicalization + URL-level exact dedup.

The cheapest dedup tier in a web-scale training pipeline runs BEFORE any
content fetch or text hashing: the same page is crawled many times under
trivially different URLs (scheme case, ``www.``, default ports, tracking
parameters, fragments, trailing slashes). Folding those to one canonical
form and keeping one row per canonical URL removes refetch-duplicates at
the cost of a string kernel — no text ever shuffles.

Reference analogue: the GD dictionary's exact-match tier — identical
content maps to one dictionary entry (`src/dict.rs:38-63`); here the
"content" is the URL after a normalizing precode, the same shape as the
reference's precoding step (`src/lib.rs:73-78`: transform, then dedup on
the transformed form).

Scale notes: the whole canonicalization chain is Catalyst
``regexp_replace``/``regexp_extract`` expressions — whole-stage codegen,
zero Python, zero shuffles. The grouping reuses the `exactdup` shape
(partial+final HashAggregate on the canonical key + AQE-splittable join
back), never a per-key window, so one hot canonical URL (a crawler trap
page crawled 10^9 times) cannot pin a single task.

Every step is expressible in DuckDB's RE2 dialect (no lookaround, no
possessive quantifiers) so the oracle twin (`canonicalize_url_sql`)
reproduces the canonical form bit-for-bit; the regex subset used
(character classes, alternation, anchors, ``(?:...)``, ``$1``/``\\1``
backreferences) behaves identically in Java regex and RE2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tracking parameters dropped by canonicalization. Keep in sync between
# the Column chain and the SQL twin — the list IS the spec.
_TRACKING_PARAM_RE = "utm_[a-zA-Z]+|fbclid|gclid|msclkid|mc_eid|igshid"

# (pattern, replacement) applied in order AFTER the scheme+host lowering.
# Java regexp_replace is global by default; the SQL twin passes 'g'.
_CANON_PASSES: list[tuple[str, str]] = [
    # http -> https (dedup canonicalization folds the scheme)
    (r"^http://", "https://"),
    # strip a leading www. label
    (r"^https://www\.", "https://"),
    # strip default ports; ([/?#].*)? keeps whatever follows the host
    # (an unmatched optional group substitutes "" in both dialects)
    (r"^(https://[^/:?#]+):(?:443|80)([/?#].*)?$", "$1$2"),
    # drop the fragment
    (r"#.*$", ""),
    # drop tracking params, keeping the ?/& delimiter for the cleanup
    (rf"([?&])(?:{_TRACKING_PARAM_RE})=[^&]*", "$1"),
    # collapse "?&&" / "&&" runs left behind by the param strip
    (r"([?&])&+", "$1"),
    # trailing "?"/"&" (all params were tracking) and trailing slashes
    (r"[?&]+$", ""),
    (r"/+$", ""),
]


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` as a pure-codegen Column expression.

    Steps (in order): trim; lowercase the ``scheme://host`` prefix
    (path/query case is significant and preserved); fold ``http`` to
    ``https``; strip a leading ``www.``; strip default ports ``:80`` /
    ``:443``; drop the ``#fragment``; drop tracking query parameters
    (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``, ``mc_eid``,
    ``igshid``) and tidy the separators; strip trailing ``?``/``&`` and
    trailing slashes. NULL is treated as ''. A scheme-less string passes
    through the anchored passes untouched (only fragment/param/slash
    hygiene applies) — garbage rows still group deterministically.

    Idempotent: canonicalize(canonicalize(u)) == canonicalize(u).
    """
    s = F.trim(F.coalesce(url, F.lit("")))
    # lowercase scheme://host, preserve the rest byte-for-byte
    prefix = F.regexp_extract(s, r"^([^/?#]*://[^/?#]*)", 1)
    s = F.concat(
        F.lower(prefix),
        s.substr(F.length(prefix) + F.lit(1), F.length(s)),
    )
    for pat, rep in _CANON_PASSES:
        s = F.regexp_replace(s, pat, rep)
    return s


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`canonicalize_url` (RE2 dialect: ``\\1``
    backreferences, explicit 'g' flag for the global passes)."""
    s = f"trim(coalesce({expr}, ''))"
    prefix = f"regexp_extract({s}, '^([^/?#]*://[^/?#]*)', 1)"
    s = f"(lower({prefix}) || substr({s}, length({prefix}) + 1))"
    for pat, rep in _CANON_PASSES:
        duck_rep = rep.replace("$1", "\\1").replace("$2", "\\2")
        s = f"regexp_replace({s}, '{pat}', '{duck_rep}', 'g')"
    return s


def url_dup_groups(
    df: DataFrame, id_col: str = "id", url_col: str = "url"
) -> DataFrame:
    """``(id, url, canonical_url, canonical_id, group_size)`` per row.

    canonical_id = min(id) among rows sharing a canonical URL — the row a
    keep-one-per-URL pass retains. Plan: the `exactdup` shape — one
    partial+final HashAggregate on canonical_url + one AQE-skew-splittable
    join back; the URL column (tiny vs text) is the only thing shuffled.
    """
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(url_col).alias("url"),
        canonicalize_url(F.col(url_col)).alias("canonical_url"),
    )
    groups = keyed.groupBy("canonical_url").agg(
        F.min("id").alias("canonical_id"), F.count("*").alias("group_size")
    )
    return keyed.join(groups, "canonical_url").select(
        "id", "url", "canonical_url", "canonical_id", "group_size"
    )
