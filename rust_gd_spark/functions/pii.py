"""PII detection + redaction columns: emails, IPv4s, SSN-shaped ids,
phone-shaped digit runs. All JVM-side native ``regexp_*`` expressions —
no Python in the hot path — with ``*_SQL`` parity templates built from
the SAME pattern constants so the DuckDB oracle exercises the real
regexes, not lookalikes (the `functions/textstats.py` contract).

The standard training-data hygiene pass (scrub-before-train): count PII
spans per document and emit a redacted text column where each span is
replaced by a typed placeholder token.

Regex note: only constructs with identical semantics in Java regex
(Spark) and RE2 (DuckDB) are used — explicit character classes, bounded
repetition, alternation; no lookaround, no backreferences, no \\p
classes. Redaction applies the patterns in a FIXED documented order
(email → ssn → ipv4 → phone), each over the previous step's output, so
overlapping families (an SSN is also a phone-shaped digit run) resolve
deterministically and identically in both engines.

Relation to the reference engine: like `src/dict.rs`'s probe, detection
is a pure function of the byte content — same text, same spans, on any
executor — which is what makes the redacted corpus reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# (name, pattern, placeholder) in REDACTION ORDER. Patterns are
# RE2-and-Java-identical; see module docstring.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    # phone: international-ish digit run with separators, >= 9 chars total;
    # matched LAST so SSNs/IPs already became placeholders
    ("phone", r"\+?[0-9][0-9 ()./-]{6,}[0-9][0-9]", "<PHONE>"),
)


def pii_count(text_col: Column, kind: str) -> Column:
    """Occurrences of one PII family in the RAW text (pre-redaction)."""
    pattern = dict((k, p) for k, p, _ in PII_PATTERNS)[kind]
    return F.regexp_count(text_col, F.lit(pattern))


def pii_count_sql(text_expr: str, kind: str) -> str:
    # DuckDB single-quoted strings keep backslashes literal — no doubling
    pattern = dict((k, p) for k, p, _ in PII_PATTERNS)[kind]
    lit = pattern.replace("'", "''")
    return f"len(regexp_extract_all({text_expr}, '{lit}'))"


def redact_pii(text_col: Column) -> Column:
    """Text with every PII span replaced by its typed placeholder,
    applying families in the fixed PII_PATTERNS order."""
    out = text_col
    for _, pattern, placeholder in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, placeholder)
    return out


def redact_pii_sql(text_expr: str) -> str:
    out = text_expr
    for _, pattern, placeholder in PII_PATTERNS:
        lit = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{lit}', '{placeholder}', 'g')"
    return out


def pii_columns(df, id_col: str, text_col: str):
    """``(id, n_email, n_ssn, n_ipv4, n_phone, n_pii, redacted_text)``
    — one narrow projection, all whole-stage-codegen expressions, no
    shuffle: the operator is embarrassingly parallel over the scan."""
    t = F.col(text_col)
    counts = {f"n_{k}": pii_count(t, k) for k, _, _ in PII_PATTERNS}
    out = df.select(
        F.col(id_col).alias("id"),
        *[c.alias(n) for n, c in counts.items()],
        redact_pii(t).alias("redacted_text"),
    )
    total = sum((F.col(f"n_{k}") for k, _, _ in PII_PATTERNS[1:]),
                F.col(f"n_{PII_PATTERNS[0][0]}"))
    return out.withColumn("n_pii", total).select(
        "id", *[f"n_{k}" for k, _, _ in PII_PATTERNS], "n_pii",
        "redacted_text",
    )
