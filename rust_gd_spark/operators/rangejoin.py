"""Bounded time-range join (band join) via bucketized equi-join.

``left ⋈ right ON key AND |left.ts − right.ts| ≤ delta`` — the
"correlate nearby-in-time events" primitive (error↔activity windows,
sensor alignment, session stitching). Spark's naive plan for an
inequality join is BroadcastNestedLoopJoin — O(|L|·|R|) and a driver
OOM at any real scale. This operator compiles the band predicate into
ONE equi-join:

* bucket every row at ``b = floor(epoch_us / delta_us)``;
* a qualifying pair's buckets differ by at most 1, so explode the LEFT
  side to candidate buckets ``{b−1, b, b+1}`` (3×|L| narrow rows, no
  data duplication beyond the join key payload);
* equi-join on ``(key, bucket)`` — each qualifying pair meets EXACTLY
  once (the right row's bucket equals exactly one of the three);
* re-check the exact ``|Δts| ≤ delta`` band as a post-join filter.

Scale: shuffle volume is 3·|L| + |R| rows hashed on ``(key, bucket)``
— Catalyst plans a plain shuffled hash / sort-merge join, AQE splits
hot ``(key, bucket)`` cells (a user with a burst of events), and both
scans keep column pruning + predicate pushdown. No window, no Python,
no nested loop. The same decomposition is how Databricks' range-join
hints and KDB's window joins execute.

Reference analogue: the GD dictionary probes an EXACT key
(`src/dict.rs:38-46`); this is the probe under a tolerance — the
time-domain sibling of the Hamming-ball probe that
`simhash.bucket_pairs` does in fingerprint space (band = bucket,
exact verify after).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _epoch_us(col: str):
    # timestamp_ltz cast first — the repo-wide epoch convention for
    # oracle parity (see asof.py / the asof_join_events driver query)
    return F.unix_micros(F.col(col).cast("timestamp_ltz"))


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    delta_us: int,
    right_cols: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """Inner band join: every left row paired with every right row of the
    same ``key`` whose ``ts`` lies within ``delta_us`` microseconds.
    ``right_cols`` are projected from the right side with ``suffix``.
    Left columns pass through unchanged.

    Internal column names (``_us``/``_bucket``/``_rkey``/``_rus``) and the
    suffixed right projections are validated against the caller's schemas
    up front: a left frame already carrying ``_bucket``, or a left column
    named like a suffixed right column, would otherwise surface as an
    ambiguous-reference error mid-plan — or silently vanish in the final
    ``drop``."""
    if delta_us < 1:
        raise ValueError(f"delta_us must be >= 1, got {delta_us}")
    internal = {"_us", "_bucket", "_rkey", "_rus"}
    clash = internal & set(left.columns) | internal & set(right.columns)
    if clash:
        raise ValueError(
            f"range_join: column(s) {sorted(clash)} collide with internal "
            "names; rename them before joining"
        )
    out_clash = {f"{c}{suffix}" for c in right_cols} & set(left.columns)
    if out_clash:
        raise ValueError(
            f"range_join: suffixed right column(s) {sorted(out_clash)} "
            f"collide with left columns; pass a different suffix"
        )
    l_us = _epoch_us(ts)
    r_us = _epoch_us(ts)
    lb = F.floor(l_us / delta_us).cast("long")

    lhs = left.withColumn("_us", l_us).select(
        "*", F.explode(F.array(lb - 1, lb, lb + 1)).alias("_bucket")
    )
    rhs = right.select(
        F.col(key).alias("_rkey"),
        r_us.alias("_rus"),
        F.floor(r_us / delta_us).cast("long").alias("_bucket"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    joined = lhs.join(
        rhs,
        (F.col(key) == F.col("_rkey")) & (lhs["_bucket"] == rhs["_bucket"]),
        "inner",
    )
    return (
        joined.filter(F.abs(F.col("_us") - F.col("_rus")) <= delta_us)
        .drop("_us", "_rus", "_rkey", "_bucket")
    )


def range_join_sql(
    left_sql: str,
    right_sql: str,
    key: str,
    ts: str,
    delta_us: int,
    left_cols: str,
    right_cols: str,
) -> str:
    """DuckDB twin — the direct inequality join (tractable at oracle
    scale; the Spark side's bucketization is the scale rewrite of this
    exact predicate)."""
    return f"""
        select {left_cols}, {right_cols}
        from ({left_sql}) l join ({right_sql}) r
          on l.{key} = r.{key}
         and abs(epoch_us(l.{ts}) - epoch_us(r.{ts})) <= {delta_us}
    """
