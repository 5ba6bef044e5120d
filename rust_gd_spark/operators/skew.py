"""Key-skew profiling — the diagnostic behind every salting decision.

At 100 TB the difference between a plan that finishes and one that
stalls is usually ONE hot key: a crawler-trap URL host, a boilerplate
LSH band, an empty-string content hash. Every skew mitigation in this
engine (`_buckets.py` salt-and-keep caps, AQE skew-join pins,
`boilerplate` mega-line splits) starts from the same question — *how
concentrated is this key?* — and this operator answers it as a tiny,
exact, oracle-checkable table instead of an eyeballed `groupBy.count`.

Reference analogue: the dictionary's LRU bookkeeping is per-base usage
accounting (`src/dict.rs:93-112`); this is the same accounting turned
into a report over any key column.

Scale notes: ONE partial+final hash aggregation on the key (map-side
combine, so a 10^9-row hot key shuffles one row per input partition),
then ``TakeOrderedAndProject`` for the top-N (no global sort), a 1-row
totals aggregate joined by broadcast, and a window over the N retained
rows only (single tiny partition by construction — N ≤ a few hundred).
Shares are exact integer floor-division parts-per-million so the DuckDB
twin matches bit-for-bit regardless of partition order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def key_skew_profile(
    df: DataFrame, key_col: str, top_n: int = 20
) -> DataFrame:
    """Top-``top_n`` keys by row count with exact concentration shares.

    Returns ``(rank, key, cnt, total_rows, distinct_keys, share_ppm,
    cum_share_ppm)`` — ``share_ppm = cnt * 1_000_000 div total_rows``
    (integer floor), ``cum_share_ppm`` the running sum of ``share_ppm``
    over ranks (so it is itself exact). Ties break on the key value
    ascending for a deterministic total order. NULL keys count as a key
    (rendered as NULL), matching ``groupBy`` semantics in both engines.
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1: {top_n}")
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").cast("long").alias("total_rows"),
        F.count("*").cast("long").alias("distinct_keys"),
    )
    top = counts.orderBy(F.desc("cnt"), F.asc_nulls_first("key")).limit(top_n)
    w = Window.orderBy(F.desc("cnt"), F.asc_nulls_first("key"))
    ranked = (
        top.join(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "share_ppm", F.expr("cnt * 1000000L div total_rows")
        )
        .withColumn(
            "cum_share_ppm",
            F.sum("share_ppm").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return ranked.select(
        "rank", "key", F.col("cnt").cast("long").alias("cnt"),
        "total_rows", "distinct_keys", "share_ppm", "cum_share_ppm",
    )


def key_skew_profile_sql(
    source_sql: str, key_expr: str, top_n: int = 20
) -> str:
    """DuckDB twin: same counts, same floor-div ppm, same tie order."""
    return f"""
with src as ({source_sql}),
counts as (
  select {key_expr} as key, count(*) as cnt from src group by 1
),
totals as (
  select sum(cnt)::bigint as total_rows, count(*)::bigint as distinct_keys
  from counts
),
top as (
  select key, cnt from counts order by cnt desc, key asc nulls first limit {top_n}
),
ranked as (
  select row_number() over (order by cnt desc, key asc nulls first)::bigint as rank,
         key, cnt::bigint as cnt, t.total_rows, t.distinct_keys,
         (cnt * 1000000 // t.total_rows)::bigint as share_ppm
  from top, totals t
)
select rank, key, cnt, total_rows, distinct_keys, share_ppm,
       (sum(share_ppm) over (order by rank))::bigint as cum_share_ppm
from ranked
"""
