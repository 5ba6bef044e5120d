"""Model-based quality classifier (linear serving path) tests."""

import math
import re

from pyspark.sql import functions as F, types as T

from rust_gd_spark.functions import quality_model as qm

CORPUS = [
    (1, "the cat and the dog are in the garden with a ball and it is fun "
        "for all of them on a sunny day in the park with friends around"),
    (2, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( ))) @@@"),  # punct soup
    (3, "pneumonoultramicroscopicsilicovolcanoconiosis "
        "antidisestablishmentarianism floccinaucinihilipilification"),
    (4, ""),
    (5, None),
    (6, "short but the words are fine and it is readable text"),
]

_STOP = set(qm.ts.STOPWORDS_EN)


def _py_logit(text):
    toks = [t for t in re.split(r"\s+", (text or "").strip().lower()) if t]
    n = len(toks)
    len_feat = min(n / 100.0, 1.0)
    nchar = len(text or "")
    npunct = len(re.findall(r"[!-/:-@\[-`{-~]", text or ""))
    punct = npunct / nchar if nchar else 0.0
    stop = sum(1 for t in toks if t in _STOP) / n if n else 0.0
    mwl = sum(len(t) for t in toks) / n if n else 0.0
    wlen = 1.0 if 3.0 <= mwl <= 10.0 else 0.0
    return (qm.QM_BIAS + qm.QM_W_LEN * len_feat + qm.QM_W_PUNCT * punct
            + qm.QM_W_STOP * stop + qm.QM_W_WLEN * wlen)


def _df(spark):
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    return spark.createDataFrame(CORPUS, schema)


def test_logit_matches_bruteforce_and_gate_is_logit_sign(spark):
    got = {
        r.doc_id: r
        for r in _df(spark).select(
            "doc_id",
            qm.quality_logit(F.col("text")).alias("logit"),
            qm.quality_prob(F.col("text")).alias("prob"),
            qm.quality_keep(F.col("text")).alias("keep"),
        ).collect()
    }
    for doc_id, text in CORPUS:
        exp = _py_logit(text)
        r = got[doc_id]
        assert abs(r.logit - exp) < 1e-9, (doc_id, r.logit, exp)
        assert abs(r.prob - 1.0 / (1.0 + math.exp(-exp))) < 1e-9
        assert r.keep == (exp >= 0.0)
    # prose keeps, punctuation soup and empty/NULL rows drop
    assert got[1].keep and got[6].keep
    assert not got[2].keep and not got[4].keep and not got[5].keep


def test_sql_twin_agrees(spark):
    """The DuckDB twin formula evaluates to the same logits."""
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame(CORPUS, columns=["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", pdf)
    rows = con.execute(
        f"select doc_id, {qm.quality_logit_sql('text')} as logit,"
        f" {qm.quality_keep_sql('text')} as keep from documents"
    ).fetchall()
    for doc_id, logit, keep in rows:
        exp = _py_logit(dict(CORPUS)[doc_id])
        assert abs(logit - exp) < 1e-9, (doc_id, logit, exp)
        assert keep == (exp >= 0.0)
