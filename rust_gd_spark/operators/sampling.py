"""Deterministic hash sampling, stratified sampling, and corpus mixing.

The data-mixing stage of a training pipeline: down/up-weight sources or
quality strata to hit a target mixture. Spark's ``df.sample`` is seeded
per-partition, so its output changes with partitioning — useless for a
resumable 100 TB job where a retried task must keep the SAME rows. This
operator samples by content key instead:

    keep row  ⇔  md5(key || ':' || seed)  <  hex_threshold(fraction)

* md5 emits lowercase hex in both Spark and DuckDB, and the comparison is
  a plain string compare on a uniform 128-bit space — so the decision is
  a pure function of (key, seed, fraction): reproducible across retries,
  repartitioning, engines, and cluster sizes, and fully SQL-oracle-able.
* The filter is one whole-stage-codegen expression over the scan — no
  shuffle, no driver work, trivially 100 TB-parallel.
* Monotone in ``fraction``: raising a stratum's weight only ADDS rows
  (the kept set at f1 ⊆ kept set at f2 for f1 ≤ f2) — the property that
  makes iterative mixture tuning cheap (only the delta is new).

Relation to the reference engine: the keep/drop decision is the same
shape as the GD dictionary probe (`src/dict.rs:38-63`) — a deterministic
function of the content key, never of placement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HEX_WIDTH = 32  # md5 digest length in hex chars
_SPACE = 16 ** _HEX_WIDTH


def hash_threshold(fraction: float) -> str:
    """Zero-padded 32-char lowercase hex threshold: a uniformly hashed
    key falls below it with probability ``fraction`` (exact at the
    2^-128 granularity)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    bound = min(int(round(fraction * _SPACE)), _SPACE)
    if bound >= _SPACE:  # fraction == 1.0: every digest compares below
        return "g" * _HEX_WIDTH
    return format(bound, f"0{_HEX_WIDTH}x")


def _digest(key_col: Column, seed: int) -> Column:
    return F.md5(F.concat_ws(":", key_col.cast("string"), F.lit(str(seed))))


def _digest_sql(key_expr: str, seed: int) -> str:
    return f"md5({key_expr}::varchar || ':' || '{seed}')"


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Deterministic Bernoulli(fraction) sample keyed on ``key_col``."""
    return df.filter(_digest(F.col(key_col), seed) < hash_threshold(fraction))


def hash_sample_sql(key_expr: str, fraction: float, seed: int = 0) -> str:
    """The WHERE predicate equivalent to ``hash_sample`` (DuckDB/ANSI)."""
    return f"{_digest_sql(key_expr, seed)} < '{hash_threshold(fraction)}'"


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing primitive.

    ``fractions`` maps stratum value → keep fraction; strata not listed
    get ``default_fraction``. One CASE expression + one digest compare
    over the scan: no shuffle, and a row's fate never depends on which
    task scans it.
    """
    # right-folded CASE whose arm order matches sorted(fractions), so the
    # Spark expression and the SQL template are the same decision tree
    thr = F.lit(hash_threshold(default_fraction))
    for value, frac in sorted(fractions.items(), reverse=True):
        thr = F.when(
            F.col(strata_col).cast("string") == F.lit(str(value)),
            F.lit(hash_threshold(frac)),
        ).otherwise(thr)
    return df.filter(_digest(F.col(key_col), seed) < thr)


def stratified_sample_sql(
    key_expr: str,
    strata_expr: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 0,
) -> str:
    """WHERE predicate equivalent to ``stratified_sample``."""
    arms = " ".join(
        f"when {strata_expr}::varchar = '{v}' then '{hash_threshold(f)}'"
        for v, f in sorted(fractions.items())
    )
    case = f"case {arms} else '{hash_threshold(default_fraction)}' end"
    return f"{_digest_sql(key_expr, seed)} < {case}"
