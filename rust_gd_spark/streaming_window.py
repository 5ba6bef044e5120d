"""Event-time windowed aggregation: tumbling, session, and the
watermarked Structured-Streaming form.

The reference engine is a batch CLI over byte streams
(`examples/main.rs:15-40`); it has no event-time surface at all. A
production corpus pipeline does need one — ingest telemetry, dedup rate
per hour, per-user session activity — so this module provides the
missing Structured-Streaming third leg next to `streaming.py` (foreachBatch
incremental near-dup) and `streaming_state.py` (applyInPandasWithState
exact dedup): Spark's OWN windowed-aggregation state machine, with
watermark-driven finalization and eviction.

Everything here is built-in expressions only: ``F.window`` /
``F.session_window`` compile to Catalyst ``TimeWindow`` /
``SessionWindow`` nodes inside whole-stage codegen — no UDF, no Python
on the hot path.

Scale notes (100 TB):
- Tumbling aggregation is ONE partial-agg shuffle keyed by
  (window, event_type); map-side combine absorbs per-partition mass, so
  shuffle volume is O(windows × types), not O(events).
- Session windows shuffle once by the session key (user_id) and merge
  sort-locally per key; skewed users are bounded by AQE skew-split.
- In streaming form, state size is bounded by the watermark horizon:
  a window older than max(event_time) − delay is emitted once (append
  mode) and its state evicted; late rows beyond the horizon are dropped,
  never buffered. State grows with windows-in-flight, not with history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def tumbling_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per (epoch-aligned tumbling window, event_type) activity stats.

    Batch form of the streaming aggregation below — same window
    semantics (``F.window`` starts are epoch-aligned), plus the exact
    distinct-user count that streaming append mode cannot provide.
    Columns: window_start, window_end, event_type, n_events, n_users,
    sum_value (6 dp).
    """
    w = F.window(F.col(ts_col), window)
    return (
        events.groupBy(w.alias("w"), F.col(type_col).alias("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "n_users",
            "sum_value",
        )
    )


def session_event_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Per-user session windows (gap-merged event-time intervals).

    ``F.session_window`` semantics: every event spans [ts, ts+gap);
    overlapping-or-touching spans for the same key merge, so an event at
    exactly ``prev_ts + gap`` EXTENDS the session (verified against the
    gaps-and-islands SQL oracle, which breaks on ``ts - lag(ts) > gap``).
    session_end = last event + gap. Columns: user_id, session_start,
    session_end, n_events, sum_value (6 dp).
    """
    sw = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(F.col(key_col).alias("user_id"), sw.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def streaming_tumbling_stats(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Watermarked streaming form of :func:`tumbling_event_stats`.

    Append-mode contract: a (window, type) row is emitted exactly once,
    when the watermark (max event time seen − ``watermark``) passes the
    window end; rows arriving later than the horizon are dropped from
    already-finalized windows (never double-counted, never re-emitted).
    No distinct aggregate (unsupported in streaming append) — n_events
    and sum_value only, both of which must equal the batch run over the
    union of all finalized inputs (asserted in tests).
    """
    w = F.window(F.col(ts_col), window)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), F.col(type_col).alias("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_session_windows(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Watermarked streaming form of :func:`session_event_windows`.

    Append-mode contract: a session row is emitted exactly once, when the
    watermark passes ``session_end`` (the session can no longer grow —
    any event that could extend it would be late beyond the horizon and
    dropped). State per key is the open sessions only; closed sessions
    are evicted on emission. Same gap-merge semantics as the batch form
    (asserted equal on finalized sessions in tests)."""
    sw = F.session_window(F.col(ts_col), gap)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col).alias("user_id"), sw.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source event stream with the pinned schema (streaming file
    sources require an explicit schema; new files in ``path`` become new
    micro-batches)."""
    return spark.readStream.schema(EVENT_SCHEMA).parquet(path)
