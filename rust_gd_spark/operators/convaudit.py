"""Conversation well-formedness audit: role-alternation violations.

Transcript corpora are supposed to alternate speakers; consecutive
same-role turns are an ingestion symptom (a client that double-logged,
an exporter that split one message into two rows, a merge that
interleaved two sessions) and they poison turn-level operators that key
on (role, text) adjacency (``operators/turns.py`` retry collapse reads
a same-role adjacent pair as a retry). This audit measures the symptom
corpus-wide BEFORE those operators run::

    (n_convs, n_turns, n_adjacent_same_role, n_convs_affected,
     turn_violation_frac, conv_violation_frac)

A violation is a turn whose role equals the PREVIOUS turn's role within
the conversation (by ``turn_idx`` order) — the lag/island discipline of
``split_sessions``: one window exchange on ``conv_id``, per-task state
of one lag value, then a single partial+final global aggregate.

Scale: one shuffle (the conversation window — bounded by turns per
conversation, not corpus size) + a 1-row aggregate. Fractions are
display roundings of exact integer ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def role_alternation_audit(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
) -> DataFrame:
    """Corpus-wide role-alternation violation report (module docstring).

    NULL roles compare under the empty-string key (the repo-wide
    null-coalescing convention), so two adjacent NULL-role turns count
    as a violation.
    """
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    r = F.coalesce(F.col(role_col), F.lit(""))
    flagged = df.select(
        F.col(conv_col).alias("_conv"),
        F.when(F.lag(r).over(w).isNotNull() & (r == F.lag(r).over(w)), 1)
        .otherwise(0)
        .alias("_viol"),
    )
    per_conv = flagged.groupBy("_conv").agg(
        F.count(F.lit(1)).alias("_n_turns"),
        F.sum("_viol").alias("_n_viol"),
    )
    return per_conv.agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.sum("_n_turns").cast("long").alias("n_turns"),
        F.sum("_n_viol").cast("long").alias("n_adjacent_same_role"),
        F.sum(F.when(F.col("_n_viol") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_convs_affected"),
    ).select(
        "n_convs",
        "n_turns",
        "n_adjacent_same_role",
        "n_convs_affected",
        F.round(
            F.col("n_adjacent_same_role")
            / F.greatest(F.col("n_turns"), F.lit(1)),
            6,
        ).alias("turn_violation_frac"),
        F.round(
            F.col("n_convs_affected") / F.greatest(F.col("n_convs"), F.lit(1)),
            6,
        ).alias("conv_violation_frac"),
    )


def role_alternation_audit_sql(
    table: str,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
) -> str:
    """ANSI-SQL twin of :func:`role_alternation_audit` (DuckDB-ready)."""
    return f"""
        with flagged as (
          select {conv_col} as conv,
                 case when lag(coalesce({role_col}, '')) over
                        (partition by {conv_col} order by {idx_col})
                      = coalesce({role_col}, '')
                      then 1 else 0 end as viol
          from {table}
        ),
        per_conv as (
          select conv, count(*) as n_turns, sum(viol) as n_viol
          from flagged group by conv
        )
        select count(*)::bigint as n_convs,
               sum(n_turns)::bigint as n_turns,
               sum(n_viol)::bigint as n_adjacent_same_role,
               sum(case when n_viol > 0 then 1 else 0 end)::bigint
                 as n_convs_affected,
               round(sum(n_viol)::double
                     / greatest(sum(n_turns), 1), 6)
                 as turn_violation_frac,
               round(sum(case when n_viol > 0 then 1 else 0 end)::double
                     / greatest(count(*), 1), 6)
                 as conv_violation_frac
        from per_conv
    """
