"""Event-time windowed aggregation: batch semantics, session-gap
boundary behavior, and the watermarked streaming contract (append-mode
finalization + late-row drop)."""

import datetime as dt
import uuid

import pytest
from pyspark.sql import functions as F

from rust_gd_spark.streaming_window import (
    EVENT_SCHEMA,
    read_event_stream,
    session_event_windows,
    streaming_tumbling_stats,
    tumbling_event_stats,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, ts, user, etype="click", value=1.0):
    return (eid, ts, user, etype, value, "{}")


def _mk(spark, rows):
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def test_tumbling_stats_counts(spark):
    rows = [
        _ev(1, T0 + dt.timedelta(minutes=5), 10),
        _ev(2, T0 + dt.timedelta(minutes=55), 10),
        _ev(3, T0 + dt.timedelta(minutes=59, seconds=59), 11, "view"),
        _ev(4, T0 + dt.timedelta(hours=1), 10),  # next window, half-open
        _ev(5, T0 + dt.timedelta(hours=1, minutes=30), 12, value=2.5),
    ]
    out = tumbling_event_stats(_mk(spark, rows), window="1 hour")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["n_users"], r["sum_value"])
        for r in out.collect()
    }
    assert got[(T0, "click")] == (2, 1, 2.0)
    assert got[(T0, "view")] == (1, 1, 1.0)
    assert got[(T0 + dt.timedelta(hours=1), "click")] == (2, 2, 3.5)


def test_session_gap_boundary(spark):
    """Pins Spark's SessionWindow boundary: an event at EXACTLY
    last_ts + gap extends the session (intervals [ts, ts+gap) merge when
    touching) — the semantics the DuckDB gaps-and-islands oracle encodes
    with its strict `> gap` break condition."""
    gap = dt.timedelta(minutes=30)
    rows = [
        # user 1: second event exactly at t0+gap -> ONE session
        _ev(1, T0, 1),
        _ev(2, T0 + gap, 1),
        # user 2: second event 1 microsecond past the gap -> TWO sessions
        _ev(3, T0, 2),
        _ev(4, T0 + gap + dt.timedelta(microseconds=1), 2),
    ]
    out = session_event_windows(_mk(spark, rows), gap="30 minutes")
    per_user = {
        u: sorted(
            [r for r in out.collect() if r["user_id"] == u],
            key=lambda r: r["session_start"],
        )
        for u in (1, 2)
    }
    assert len(per_user[1]) == 1
    assert per_user[1][0]["n_events"] == 2
    assert per_user[1][0]["session_start"] == T0
    assert per_user[1][0]["session_end"] == T0 + gap + gap
    assert len(per_user[2]) == 2
    assert [r["n_events"] for r in per_user[2]] == [1, 1]


@pytest.fixture()
def stream_dirs(tmp_path):
    src = tmp_path / "events_in"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    return str(src), str(ckpt)


def _run_available_now(spark, src, ckpt, qname):
    stream = streaming_tumbling_stats(
        read_event_stream(spark, src), window="1 hour", watermark="2 hours"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


def _write_batch(spark, rows, src):
    _mk(spark, rows).coalesce(1).write.mode("append").parquet(src)


def test_streaming_matches_batch_on_finalized_windows(spark, stream_dirs):
    src, ckpt = stream_dirs
    rows = [
        _ev(i, T0 + dt.timedelta(minutes=7 * i), 100 + (i % 3), value=float(i))
        for i in range(60)  # spans ~7 hours of event time
    ]
    _write_batch(spark, rows, src)
    qname = f"win_{uuid.uuid4().hex[:8]}"
    got = _run_available_now(spark, src, ckpt, qname)

    max_ts = max(r[1] for r in rows)
    horizon = max_ts - dt.timedelta(hours=2)
    expected = (
        tumbling_event_stats(_mk(spark, rows), window="1 hour")
        .filter(F.col("window_end") <= F.lit(horizon))
        .select("window_start", "window_end", "event_type", "n_events", "sum_value")
    )
    g = {tuple(r) for r in got.select(*expected.columns).collect()}
    e = {tuple(r) for r in expected.collect()}
    assert g == e
    assert len(e) > 0  # the watermark finalized something


def test_watermark_drops_late_rows(spark, stream_dirs, tmp_path):
    # Memory sinks cannot recover from a checkpoint, so the two-run
    # sequence uses a parquet sink: the output dir ACCUMULATES exactly
    # the rows each run finalized — re-emission or late-row leakage
    # would show up as duplicate/extra rows in the union.
    src, ckpt = stream_dirs
    out = str(tmp_path / "win_out")

    def run_once():
        stream = streaming_tumbling_stats(
            read_event_stream(spark, src), window="1 hour", watermark="2 hours"
        )
        q = (
            stream.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).collect()

    # batch 1: events in hour-0 window, then a ts=6h event that pushes the
    # watermark to 4h, finalizing (and evicting) every window ending <= 4h.
    _write_batch(
        spark,
        [
            _ev(1, T0 + dt.timedelta(minutes=10), 1),
            _ev(2, T0 + dt.timedelta(minutes=20), 2),
            _ev(3, T0 + dt.timedelta(hours=6), 3),
        ],
        src,
    )
    first = run_once()
    hour0 = [r for r in first if r["window_start"] == T0]
    assert len(hour0) == 1 and hour0[0]["n_events"] == 2

    # batch 2: one LATE row inside the finalized hour-0 window (beyond the
    # 2h watermark) plus a fresh ts=9h event to advance the watermark past
    # the 6h window. The late row must be dropped: hour-0 keeps exactly its
    # run-1 row (no re-emission, no recount) and the 6h window emits with
    # its own single event.
    _write_batch(
        spark,
        [
            _ev(4, T0 + dt.timedelta(minutes=30), 4),  # LATE: dropped
            _ev(5, T0 + dt.timedelta(hours=9), 5),
        ],
        src,
    )
    rows2 = run_once()
    hour0b = [r for r in rows2 if r["window_start"] == T0]
    assert len(hour0b) == 1 and hour0b[0]["n_events"] == 2  # unchanged
    six = [r for r in rows2 if r["window_start"] == T0 + dt.timedelta(hours=6)]
    assert len(six) == 1 and six[0]["n_events"] == 1


def test_streaming_sessions_match_batch_on_finalized(spark, stream_dirs):
    src, ckpt = stream_dirs
    rows = []
    # user 100: three bursts separated by > gap; user 101: one long session
    for u, base_minutes in ((100, 0), (100, 120), (100, 300), (101, 30)):
        for j in range(4):
            rows.append(
                _ev(len(rows), T0 + dt.timedelta(minutes=base_minutes + 5 * j),
                    u, value=1.0)
            )
    # sentinel far in the future: watermark = 30h - 2h finalizes everything
    rows.append(_ev(999, T0 + dt.timedelta(hours=30), 999))
    _write_batch(spark, rows, src)

    from rust_gd_spark.streaming_window import (
        session_event_windows,
        streaming_session_windows,
    )

    stream = streaming_session_windows(
        read_event_stream(spark, src), gap="30 minutes", watermark="2 hours"
    )
    qname = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.table(qname).collect()}

    max_ts = max(r[1] for r in rows)
    horizon = max_ts - dt.timedelta(hours=2)
    expected = {
        tuple(r)
        for r in session_event_windows(_mk(spark, rows), gap="30 minutes")
        .filter(F.col("session_end") <= F.lit(horizon))
        .collect()
    }
    assert got == expected
    # the three bursts stayed three distinct sessions; the sentinel's own
    # session is still open (its end is past the horizon) and NOT emitted
    assert sum(1 for g in got if g[0] == 100) == 3
    assert all(g[0] != 999 for g in got)
