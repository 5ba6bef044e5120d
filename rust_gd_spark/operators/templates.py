"""Multi-turn TEMPLATE detection and canned-response detection.

Two transcript-native duplication modes between turn granularity
(``operators/turns.py``) and whole-conversation granularity
(``operators/convdedup.py``):

* **k-turn template spans** — the same k CONSECUTIVE turns appearing in
  many different conversations: scripted openings ("Hi! How can I help
  you today?" → greeting → consent boilerplate), wizard flows, canned
  escalation sequences. Document-level dedup never fires (the
  surrounding conversations differ); turn-level dedup sees each turn in
  isolation and misses that the *sequence* is the repeated unit. The
  k-turn sliding window hash is the transcript analogue of the w-byte
  shingle (`operators/minhash.py` ``shingle_df``) one level up: the
  "character" is a whole turn.
* **canned responses** — a single assistant turn whose (normalized)
  text recurs across many conversations: template answers, refusal
  boilerplate, autoresponder output. A per-turn quality gate for
  training data (a model trained on 10⁶ copies of the same apology
  memorizes it), and the role-conditional sibling of URL-level dedup
  (`operators/urldedup.py`): cheapest tier, exact key, one aggregation.

Reference analogue: a window of chunks repeatedly hitting the LRU
dictionary as one unit (`src/dict.rs:38-63`) — here the dictionary key
is the md5 chain over k turn hashes rather than one chunk.

Scale notes (the 100 TB shape):

* template spans cost ONE window shuffle on ``conv_id`` (the k-1
  ``lead`` columns share the single window spec, so Catalyst plans one
  Window operator in one exchange) plus ONE partial-agg shuffle on the
  64-hex template hash. ``count(distinct conv_id)`` plans as Spark's
  two-phase distinct aggregate — no row explosion beyond the (hash,
  conv) pairs, which partial-agg map-side.
* canned responses are one partial+final HashAggregate on the md5 of
  the normalized text — the `exactdup` shape; a mega-key (a canned
  reply logged 10⁹ times) stays AQE-splittable because the plan never
  uses a per-key window.
* exemplar columns are group MINIMA (smallest conv_id, smallest start
  index), not arg-min pairs — order-independent, bit-stable across
  partitionings, and exactly reproducible in the DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .turns import _turn_key

_US = "\x1f"


def turn_template_spans(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    role_col: str | None = "role",
    k: int = 3,
    min_convs: int = 2,
) -> DataFrame:
    """Find k-turn spans shared verbatim across ≥ ``min_convs`` conversations.

    Every window of k consecutive turns (by ``order_col`` within a
    conversation) is keyed by ``md5(h_0 || … || h_{k-1})`` where ``h_i``
    is the per-turn ``md5(role ␟ text)``; windows running past the
    conversation tail are dropped. Output, one row per template::

        (template_hash, n_convs, n_occurrences,
         exemplar_conv, first_turn_idx)

    ``n_occurrences`` counts windows (a template may recur within one
    conversation); ``exemplar_conv`` / ``first_turn_idx`` are group
    minima (smallest conv id / smallest window-start index anywhere),
    chosen for partition-order independence rather than being a
    (conv, idx) pair from one single occurrence.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(conv_col).orderBy(order_col)
    th = F.md5(_turn_key(text_col, role_col))
    hs = [th] + [F.lead(th, i).over(w) for i in range(1, k)]
    windows = df.select(
        F.col(conv_col).alias("conv"),
        F.col(order_col).alias("start_idx"),
        F.md5(F.concat(*hs)).alias("template_hash"),
        # concat() is null if ANY lead is null → tail windows drop here
    ).filter(F.col("template_hash").isNotNull())
    return (
        windows.groupBy("template_hash")
        .agg(
            F.count_distinct("conv").alias("n_convs"),
            F.count("*").alias("n_occurrences"),
            F.min("conv").alias("exemplar_conv"),
            F.min("start_idx").alias("first_turn_idx"),
        )
        .filter(F.col("n_convs") >= min_convs)
    )


def turn_template_spans_sql(
    table: str,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    role_col: str | None = "role",
    k: int = 3,
    min_convs: int = 2,
) -> str:
    """ANSI-SQL twin of :func:`turn_template_spans` (DuckDB-ready).

    Both engines hash ``coalesce(role,'') || chr(31) || coalesce(text,'')``
    per turn and md5-chain k of them, so the hashes match bit-for-bit.
    """
    if role_col is None:
        key = f"coalesce({text_col}, '')"
    else:
        key = f"coalesce({role_col}, '') || chr(31) || coalesce({text_col}, '')"
    leads = " || ".join(
        "h" if i == 0
        else f"lead(h, {i}) over (partition by conv order by start_idx)"
        for i in range(k)
    )
    return f"""
        with th as (
          select {conv_col} as conv, {order_col} as start_idx,
                 md5({key}) as h
          from {table}
        ),
        win as (
          select conv, start_idx, md5({leads}) as template_hash
          from th
        )
        select template_hash,
               count(distinct conv)::bigint as n_convs,
               count(*)::bigint as n_occurrences,
               min(conv) as exemplar_conv,
               min(start_idx)::int as first_turn_idx
        from win
        where template_hash is not null
        group by template_hash
        having count(distinct conv) >= {min_convs}
    """


def canned_response_dups(
    df: DataFrame,
    conv_col: str = "conv_id",
    text_col: str = "text",
    role_col: str = "role",
    role: str = "assistant",
    min_count: int = 2,
) -> DataFrame:
    """Detect canned responses: one role's turn text recurring across turns.

    Texts are compared modulo case and whitespace runs
    (``lower`` + collapse ``\\s+`` to one space + trim — deliberately
    lighter than ``minhash.normalize_text``: punctuation is meaningful
    in canned-reply detection, stray spacing is not). Output, one row
    per duplicated response::

        (response_key, n_uses, n_convs, exemplar_conv, response_len)

    ``response_key`` = md5 of the normalized text; ``response_len`` is
    its length (functionally determined by the key — ``max`` only to
    satisfy the aggregation); ``n_uses`` counts turns, ``n_convs``
    distinct conversations. Rows with ``n_uses < min_count`` are
    dropped — the survivors are the block/downweight list.
    """
    norm = F.trim(
        F.regexp_replace(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " ")
    )
    return (
        df.filter(F.col(role_col) == role)
        .select(
            F.col(conv_col).alias("conv"),
            F.md5(norm).alias("response_key"),
            F.length(norm).alias("rlen"),
        )
        .groupBy("response_key")
        .agg(
            F.count("*").alias("n_uses"),
            F.count_distinct("conv").alias("n_convs"),
            F.min("conv").alias("exemplar_conv"),
            F.max("rlen").alias("response_len"),
        )
        .filter(F.col("n_uses") >= min_count)
    )


def canned_response_dups_sql(
    table: str,
    conv_col: str = "conv_id",
    text_col: str = "text",
    role_col: str = "role",
    role: str = "assistant",
    min_count: int = 2,
) -> str:
    """ANSI-SQL twin of :func:`canned_response_dups` (DuckDB-ready)."""
    norm = (
        f"trim(regexp_replace(lower(coalesce({text_col}, '')), "
        f"'\\s+', ' ', 'g'))"
    )
    return f"""
        with r as (
          select {conv_col} as conv, md5({norm}) as response_key,
                 length({norm}) as rlen
          from {table}
          where {role_col} = '{role}'
        )
        select response_key,
               count(*)::bigint as n_uses,
               count(distinct conv)::bigint as n_convs,
               min(conv) as exemplar_conv,
               max(rlen)::int as response_len
        from r
        group by response_key
        having count(*) >= {min_count}
    """


def remove_template_turns(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    role_col: str | None = "role",
    k: int = 3,
    min_convs: int = 2,
) -> DataFrame:
    """REWRITE step for :func:`turn_template_spans`: cut template spans.

    Every turn covered by a qualifying k-turn template window (a window
    whose hash appears in ≥ ``min_convs`` conversations) is removed from
    every conversation EXCEPT the template's exemplar (the smallest
    conv id carrying it) — the per-turn sibling of
    ``cdc.cdc_dedup_rewrite``'s keep-first-occurrence rule: the corpus
    keeps exactly one copy of each scripted opening/wizard flow, and
    every other conversation loses the boilerplate turns while its
    unique content survives. Survivors are re-indexed densely as
    ``new_turn_idx`` (original order preserved, original columns
    intact).

    Windows are positional (k consecutive ROWS by ``order_col``), so
    coverage is computed on row positions: window at position p covers
    positions p..p+k-1; a turn is cut iff ANY qualifying non-exemplar
    window covers it. Positions explode k-fold only on MATCHED windows
    (bounded by template occurrences, not corpus size).

    Plan: the same one-Window pass as detection, one partial-agg
    shuffle on the template hash, one join back of qualifying windows
    (AQE-broadcastable — the template table is tiny), a k-element
    ``sequence`` explode on matches only, and one left-anti join on
    (conv, position).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(conv_col).orderBy(order_col)
    th = F.md5(_turn_key(text_col, role_col))
    hs = [th] + [F.lead(th, i).over(w) for i in range(1, k)]
    # Three consumers read `pos` (template agg, coverage join, anti-join);
    # unpinned, each re-ran the caller's upstream plan plus the window —
    # the pipeline's `base`-stage rule: pin a multiply-consumed corpus
    # projection once instead of recomputing it per consumer.
    pos = df.select(
        F.col(conv_col).alias("conv"),
        F.struct(*[F.col(c) for c in df.columns]).alias("_row"),
        (F.row_number().over(w) - 1).alias("p"),
        F.md5(F.concat(*hs)).alias("template_hash"),
    ).localCheckpoint(eager=True)
    templates = (
        pos.filter(F.col("template_hash").isNotNull())
        .groupBy("template_hash")
        .agg(
            F.count_distinct("conv").alias("n_convs"),
            F.min("conv").alias("exemplar_conv"),
        )
        .filter(F.col("n_convs") >= min_convs)
        .select("template_hash", "exemplar_conv")
    )
    covered = (
        pos.join(templates, "template_hash")
        .filter(F.col("conv") != F.col("exemplar_conv"))
        .select(
            "conv", F.explode(F.sequence("p", F.col("p") + (k - 1))).alias("p")
        )
        .distinct()
    )
    kept = pos.join(covered, ["conv", "p"], "left_anti")
    wk = Window.partitionBy("conv").orderBy("p")
    return kept.select(
        F.col("_row.*"), (F.row_number().over(wk) - 1).cast("int").alias("new_turn_idx")
    )
