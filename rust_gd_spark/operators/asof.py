"""As-of (point-in-time) join — the time-series join Spark has no
built-in operator for, expressed as a composition of built-ins.

For every left row, attach the most recent right row of the same key
with ``r.ts <= l.ts`` (backward direction; equality matches). The
classic use in a training-data pipeline: stamp each interaction with
the latest prior consent/config/model-version record, or each click
with the last preceding purchase.

Plan shape (the reason this beats the naive approaches):
- NOT a range join (``l.key = r.key AND r.ts <= l.ts`` + window):
  that builds the full per-key cross product before pruning —
  O(n·m) per key.
- NOT a driver loop or UDF. The implementation is union-tag + ordered
  window: tag right rows 0 and left rows 1, sort each key's timeline
  once, and carry the last non-null right payload forward
  (``F.last(ignorenulls=True)`` over rows UNBOUNDED PRECEDING..CURRENT).
  ONE shuffle (by key), one sort — the sort-merge as-of, exactly what
  kdb/QuestDB/DuckDB do natively, Catalyst-shaped.
- Tie order inside a timestamp: right rows sort BEFORE left rows
  (``is_left`` ascending), so an equal-timestamp right row is visible
  to the left row — the standard backward-inclusive contract
  (DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` agrees, which is what the
  driver oracle checks).

Scale notes (100 TB): shuffle volume is |left| + |right| rows, each
carrying only the key, timestamp, order tag, and the right payload
struct. Per-key timelines sort within their partition (spillable
ExternalSort, no per-key memory bound); a mega-key is one sort run —
for pathological single-key skew, range-bucket the timeline (salt by
time range, carry the last right row of the previous bucket forward),
which composes from this same primitive. Tolerance filtering happens
AFTER the match (a narrow filter), never by widening the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    tolerance_sec: float | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join: every ``left`` row, plus the
    payload of the latest ``right`` row with the same ``key`` and
    ``right.ts <= left.ts`` (NULLs when no such row, or when it is
    older than ``tolerance_sec``).

    ``right_cols`` are the right-side payload columns to attach
    (default: everything except ``key``); they come back suffixed. The
    matched right timestamp is ``{ts}{suffix}``.

    Duplicate right rows at an identical ``(key, ts)`` are resolved
    arbitrarily (the window's order is total only up to the timestamp);
    pre-dedup the right side (e.g. keep max id per (key, ts)) when that
    matters — the driver query does exactly that in both engines.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c != key]
    if ts not in right_cols:
        right_cols = [ts, *right_cols]

    payload = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(
        F.col(key), F.col(ts).alias("_ts"), F.lit(0).alias("_is_left"),
        payload.alias("_payload"),
    )
    l = left.select(
        F.col(key), F.col(ts).alias("_ts"), F.lit(1).alias("_is_left"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
    )
    r = r.withColumn("_row", F.lit(None).cast(l.schema["_row"].dataType))

    w = (
        Window.partitionBy(key)
        .orderBy(F.asc("_ts"), F.asc("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
    )
    if tolerance_sec is not None:
        # NTZ timestamps (parquet default) have no numeric cast; hop
        # through ltz (session tz is UTC engine-wide)
        def _epoch(c):
            return F.col(c).cast("timestamp_ltz").cast("double")

        matched = matched.withColumn(
            "_match",
            F.when(
                _epoch(f"_match.{ts}")
                >= _epoch("_ts") - F.lit(float(tolerance_sec)),
                F.col("_match"),
            ),
        )
    out_left = [F.col(f"_row.{c}").alias(c) for c in left.columns]
    out_right = [
        F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_cols
    ]
    return matched.select(*out_left, *out_right)
