"""Transcript-native TURN-level dedup operators: retry collapse, loop
detection, and cross-conversation prefix-duplicate detection.

Agent/conversation logs carry duplication modes that document-level
dedup never sees:

* **retries / stutters** — the same (role, text) turn logged twice in a
  row (client retry, tool re-invocation, double-submit);
* **loops** — an agent stuck re-emitting the same turn many times in a
  row (the classic runaway-tool-call pathology); a per-conversation
  quality gate, like the within-document Gopher gates
  (``operators/repetition.py``) but at turn granularity;
* **forked / re-logged sessions** — a conversation whose entire turn
  sequence is the PREFIX of another (a session resumed from checkpoint,
  a retried rollout, a truncated re-upload). Set-overlap dedup
  (``operators/convdedup.py``) finds these only above its Jaccard
  threshold; prefix detection is exact at any shared length.

Reference analogue: a repeated chunk hitting the LRU dictionary is
replaced by its id (`src/dict.rs:38-63`, `src/gd_byte_unit.rs` dedup
loop); here the "chunk" is a turn and the dictionary is (a) the
immediately preceding turn (retry collapse), (b) the run-length island
(loop stats), (c) the chained prefix hash (prefix dedup).

Scale notes (the 100 TB shape):

* retry collapse and loop stats are ONE window shuffle on ``conv_id``
  (the change-flag/running-sum island encoding — no second window
  partitioning) plus run-level aggregations that partial-agg map-side;
  per-task state is one lag value, not the conversation;
* prefix detection chains per-turn md5 hashes with a window
  ``collect_list`` — per-conversation cost is O(L² · 32) bytes where L
  is turns-per-conversation (bounded by session length, NOT corpus
  size), then one equi-join on ``(prefix_hash, depth)``. A viral shared
  prefix (many forks of one session) is key skew on the join — AQE
  skew-split handles it, and the join is never a nested loop (pinned in
  ``tests/test_turns.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_US = "\x1f"  # unit separator between role and text in the turn key


def _turn_key(text_col: str, role_col: str | None) -> Column:
    """Null-safe (role, text) identity key. DuckDB twin:
    ``coalesce(role,'') || chr(31) || coalesce(text,'')``."""
    parts = []
    if role_col is not None:
        parts.append(F.coalesce(F.col(role_col), F.lit("")))
    parts.append(F.coalesce(F.col(text_col), F.lit("")))
    if role_col is None:
        return parts[0]
    return F.concat_ws(_US, *parts)


def collapse_retry_turns(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    role_col: str | None = "role",
) -> DataFrame:
    """Drop each turn identical to its immediate predecessor.

    A turn survives iff it is the conversation's first turn or its
    (role, text) differs from the previous turn's; survivors are
    re-indexed densely as ``new_turn_idx`` (0-based, original order).
    Output: ``(conv_col, order_col, new_turn_idx, [role_col,] text_col)``
    — one row per SURVIVING turn, original column values intact.

    Plan: one shuffle (window on ``conv_col``); the post-filter
    re-index window reuses the same partitioning, so Catalyst plans it
    in the same exchange.
    """
    w = Window.partitionBy(conv_col).orderBy(order_col)
    key = _turn_key(text_col, role_col)
    kept = (
        df.withColumn("_ck", key)
        .withColumn("_pk", F.lag("_ck").over(w))
        .filter(F.col("_pk").isNull() | (F.col("_ck") != F.col("_pk")))
    )
    out_cols = [conv_col, order_col, "new_turn_idx"]
    if role_col is not None:
        out_cols.append(role_col)
    out_cols.append(text_col)
    return kept.withColumn(
        "new_turn_idx", (F.row_number().over(w) - 1).cast("int")
    ).select(*out_cols)


def turn_loop_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    role_col: str | None = "role",
    min_run: int = 2,
) -> DataFrame:
    """Per-conversation consecutive-repeat (loop) statistics.

    Runs are maximal streaks of consecutive turns with identical
    (role, text); a run of length >= ``min_run`` is a *loop run*.
    Output one row per conversation: ``(conv_col, n_turns, max_run,
    n_loop_runs, n_loop_turns, loop_turn_frac, is_looping)`` where
    ``n_loop_turns`` counts every turn inside a loop run and
    ``loop_turn_frac = round(n_loop_turns / n_turns, 6)``.

    Islands are encoded as the running sum of change flags (one lag per
    row) so the only window shuffle is on ``conv_col``; the run-length
    and per-conversation aggregations both partial-agg map-side.
    """
    if min_run < 2:
        raise ValueError("min_run must be >= 2")
    w = Window.partitionBy(conv_col).orderBy(order_col)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    key = _turn_key(text_col, role_col)
    flagged = (
        df.withColumn("_ck", key)
        .withColumn("_pk", F.lag("_ck").over(w))
        .withColumn(
            "_island",
            F.sum(
                (F.col("_pk").isNull() | (F.col("_ck") != F.col("_pk"))).cast(
                    "long"
                )
            ).over(wrun),
        )
    )
    runs = flagged.groupBy(conv_col, "_island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    loop_run = F.col("run_len") >= min_run
    return runs.groupBy(conv_col).agg(
        F.sum("run_len").alias("n_turns"),
        F.max("run_len").alias("max_run"),
        F.sum(loop_run.cast("long")).alias("n_loop_runs"),
        F.sum(F.when(loop_run, F.col("run_len")).otherwise(0)).alias(
            "n_loop_turns"
        ),
        F.round(
            F.sum(F.when(loop_run, F.col("run_len")).otherwise(0))
            / F.sum("run_len").cast("double"),
            6,
        ).alias("loop_turn_frac"),
        (F.max("run_len") >= min_run).alias("is_looping"),
    )


def prefix_dup_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    role_col: str | None = "role",
) -> DataFrame:
    """Conversations whose ENTIRE turn sequence prefixes another's.

    ``dup_conv`` is a prefix-duplicate of ``host_conv`` iff dup's full
    ordered (role, text) sequence equals host's first ``shared_turns``
    turns, and either dup is strictly shorter or (equal sequences) dup's
    id sorts after host's — so exact re-logs emit exactly one direction.
    Output: ``(dup_conv, host_conv, shared_turns, host_turns,
    full_equal)``.

    Mechanism: per-turn hash ``h = md5(key)``; prefix chain at depth d =
    ``md5(concat(h_1..h_d))`` via an ordered window ``collect_list``,
    with the conversation length and full-sequence hash attached in the
    SAME exchange (a second window over the same partitioning) — ONE
    pass over the text. The resulting (conv, depth, chain) sketch
    (~70 bytes/turn, text dropped) is materialized once
    (``localCheckpoint``, the `_buckets.py:114` / `minhash.py:576`
    convention for self-joined intermediates) so the self-join does not
    rescan the corpus, then one equi-join on ``(hash, depth)`` finds
    every hosting prefix. Equality is md5-chain equality (128-bit;
    collisions negligible and identical in the DuckDB oracle, which
    computes the same chain).
    """
    wp = Window.partitionBy(conv_col).orderBy(order_col)
    wcum = wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h = F.md5(_turn_key(text_col, role_col))
    pref = df.select(
        F.col(conv_col).alias("conv"),
        F.row_number().over(wp).alias("depth"),
        F.md5(F.concat_ws("", F.collect_list(h).over(wcum))).alias("chain"),
    )
    # Same partitioning (conv aliases conv_col), full-partition frame —
    # planned in the same exchange as the chain window.
    wall = (
        Window.partitionBy("conv")
        .orderBy("depth")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    frame = (
        pref.withColumn("conv_turns", F.max("depth").over(wall).cast("int"))
        .withColumn("full_hash", F.last("chain").over(wall))
        .localCheckpoint(eager=True)
    )
    dup = frame.filter(F.col("depth") == F.col("conv_turns")).select(
        F.col("conv").alias("dup_conv"),
        F.col("conv_turns").alias("shared_turns"),
        "full_hash",
    )
    host = frame.select(
        F.col("conv").alias("host_conv"),
        "depth",
        "chain",
        F.col("conv_turns").alias("host_turns"),
    )
    return (
        dup.join(
            host,
            (F.col("full_hash") == F.col("chain"))
            & (F.col("shared_turns") == F.col("depth"))
            & (F.col("dup_conv") != F.col("host_conv")),
        )
        .filter(
            (F.col("shared_turns") < F.col("host_turns"))
            | (
                (F.col("shared_turns") == F.col("host_turns"))
                & (F.col("dup_conv") > F.col("host_conv"))
            )
        )
        .select(
            "dup_conv",
            "host_conv",
            "shared_turns",
            "host_turns",
            (F.col("shared_turns") == F.col("host_turns")).alias("full_equal"),
        )
    )


def split_sessions(
    df: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    order_col: str = "turn_idx",
    gap_sec: int = 1800,
) -> DataFrame:
    """Split conversations into sessions at inactivity gaps.

    Long-running agent/conversation logs arrive under ONE conv_id even
    when they span genuinely separate interactions (a support thread
    reopened a week later, an agent resumed after a crash). Every
    downstream per-conversation operator — turn-set dedup, prefix
    detection, loop gates, the GD per-conversation round-trip — then
    mixes unrelated interactions. This operator re-keys: a new session
    starts at the conversation's first turn and at every turn whose gap
    from the previous turn EXCEEDS ``gap_sec`` (strict: a gap of
    exactly ``gap_sec`` stays in-session). Output adds::

        session_id   = conv_id || '#' || session_idx   (0-based)
        session_turn = 0-based turn index WITHIN the session

    to every input row (original columns intact, original row order by
    ``order_col`` preserved as the within-partition sort).

    This is the transcript-native sibling of the event-stream session
    window (``streaming_window.py`` session windows): same gap
    semantics, but re-KEYING rows rather than aggregating them.

    Plan: one shuffle (window on ``conv_col``); the session index is
    the running sum of gap flags and the within-session re-index is a
    second window on the same partitioning — Catalyst plans all of it
    in a single exchange (the ``collapse_retry_turns`` island-encoding
    convention; pinned in ``tests/test_turns.py``).
    """
    w = Window.partitionBy(conv_col).orderBy(order_col)
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(
        F.lag(ts_col).over(w)
    )
    flagged = df.withColumn(
        "_new_session",
        F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "_session_idx",
        F.sum("_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )
    ws = Window.partitionBy(conv_col, "_session_idx").orderBy(order_col)
    return (
        sess.withColumn(
            "session_id",
            F.concat_ws("#", F.col(conv_col), F.col("_session_idx")),
        )
        .withColumn(
            "session_turn", (F.row_number().over(ws) - 1).cast("int")
        )
        .drop("_new_session", "_session_idx")
    )
