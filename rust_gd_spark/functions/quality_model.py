"""Model-based quality filtering: a linear classifier serving path.

Production pipelines gate web documents with a trained quality classifier
(fastText-style logistic regression over cheap text features — the
CCNet / GPT-3 "quality filtering" stage). This module is the SERVING
path for such a model on Spark: the feature vector and the dot product
are pure Catalyst expressions, so scoring runs inside whole-stage
codegen at scan speed — no Python, no UDF, no shuffle. Training happens
offline; the learned weights arrive here as plain constants
(``QM_WEIGHTS`` / ``QM_BIAS`` are deterministic stand-ins with the
documented signs: punctuation-heavy → junk, stopword-bearing prose →
keep).

Parity contract (same as ``textstats``): every builder has a SQL twin
generated from the SAME constants. The keep decision is made on the
LOGIT (``logit >= 0  ⇔  p >= 0.5``) — pure +/* arithmetic, bit-exact
across engines; the sigmoid probability is reported for ranking but
never compared unrounded.

Relation to the reference engine: a quality gate decides keep/drop per
row the way the reference's threshold `delta` decides base-match vs new
base (`DESIGN.md` deviation bound) — a scalar decision function over the
row, applied streaming.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from . import textstats as ts

# Feature weights (offline-trained stand-ins; replace with a real model's
# coefficients — the serving path is unchanged). Signs are the
# documented heuristics: length and stopword prose help, punctuation
# soup hurts, out-of-band mean word length hurts.
QM_BIAS = -1.0
QM_W_LEN = 2.0          # · least(token_count/100, 1)
QM_W_PUNCT = -4.0       # · punct_ratio
QM_W_STOP = 3.0         # · stopword_ratio
QM_W_WLEN = 1.5         # · 1[3 <= mean_word_len <= 10]


def quality_logit(text_col: Column) -> Column:
    """w·x + b over the four codegen features — exact arithmetic.

    NULL text is scored as '' (all features 0 → logit = bias → drop):
    without the coalesce, ``least(NULL/100, 1)`` would resolve to 1.0
    (both Spark and DuckDB least() skip NULLs) and a NULL row would be
    KEPT with the default weights.
    """
    text_col = F.coalesce(text_col, F.lit(""))
    len_feat = F.least(
        ts.token_count(text_col).cast("double") / F.lit(100.0), F.lit(1.0)
    )
    mwl = ts.mean_word_len(text_col)
    wlen_feat = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    return (
        F.lit(QM_BIAS)
        + F.lit(QM_W_LEN) * len_feat
        + F.lit(QM_W_PUNCT) * ts.punct_ratio(text_col)
        + F.lit(QM_W_STOP) * ts.stopword_ratio(text_col)
        + F.lit(QM_W_WLEN) * wlen_feat
    )


def quality_prob(text_col: Column) -> Column:
    """sigmoid(logit) — for ranking/report; the gate uses the logit."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-quality_logit(text_col)))


def quality_keep(text_col: Column) -> Column:
    """The filter gate: ``logit >= 0`` (p >= 0.5), exact arithmetic."""
    return quality_logit(text_col) >= F.lit(0.0)


# ---------------------------------------------------------------------------
# DuckDB-dialect SQL twins (same constants → same values)
# ---------------------------------------------------------------------------


def quality_logit_sql(t: str) -> str:
    t = f"coalesce({t}, '')"
    nt = ts.token_count_sql(t)
    mwl = ts.mean_word_len_sql(t)
    return (
        f"({QM_BIAS}"
        f" + {QM_W_LEN} * least({nt} / 100.0, 1.0)"
        f" + {QM_W_PUNCT} * {ts.punct_ratio_sql(t)}"
        f" + {QM_W_STOP} * {ts.stopword_ratio_sql(t)}"
        f" + {QM_W_WLEN} * (case when {mwl} between 3.0 and 10.0"
        f" then 1.0 else 0.0 end))"
    )


def quality_prob_sql(t: str) -> str:
    return f"(1.0 / (1.0 + exp(-{quality_logit_sql(t)})))"


def quality_keep_sql(t: str) -> str:
    return f"({quality_logit_sql(t)} >= 0.0)"
