"""source_length_outliers (per-source exact Tukey fences),
lang_agreement (claimed-vs-detected confusion matrix), and
snm_recall_audit (blocking recall vs exact ground truth): hand-checked
rank/fence arithmetic, DuckDB twin parity, and the audit invariants."""

from __future__ import annotations

import duckdb
import pandas as pd


def _length_rows():
    # source A: five docs at 10 chars + one 100-char concatenation blob
    # -> q1 = q3 = 10, zero IQR, fences collapse to [10, 10], one high
    # outlier. source B: lengths 1..8 -> q1 = 2 (rank ceil(8/4) = 2),
    # q3 = 6 (rank ceil(24/4) = 6), fences [-10, 18], no outliers.
    rows = [("A", 10)] * 5 + [("A", 100)]
    rows += [("B", v) for v in range(1, 9)]
    return [(i, s, v) for i, (s, v) in enumerate(rows)]


def test_source_length_outliers(spark):
    from rust_gd_spark.operators.lengthgate import source_length_outliers

    df = spark.createDataFrame(
        _length_rows(), "doc_id long, source string, n_chars long"
    )
    out = {
        r.source: (
            r.n_docs, r.q1, r.q3, r.low_fence, r.high_fence, r.n_low, r.n_high
        )
        for r in source_length_outliers(df, "source", "n_chars", k=3).collect()
    }
    assert out["A"] == (6, 10, 10, 10, 10, 0, 1)
    assert out["B"] == (8, 2, 6, -10, 18, 0, 0)


def test_source_length_outliers_null_lengths_excluded(spark):
    # regression (code-review finding): NULL lengths would rank NULLS
    # FIRST in Spark but NULLS LAST in DuckDB, silently skewing the
    # quartiles — both engines must exclude them before ranking
    from rust_gd_spark.operators.lengthgate import (
        source_length_outliers,
        source_length_outliers_sql,
    )

    rows = [(1, "A", None), (2, "A", None), (3, "A", 10), (4, "A", 20),
            (5, "A", 30), (6, "A", 40)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    r = source_length_outliers(df, "source", "n_chars").collect()[0]
    assert r.n_docs == 4          # NULLs are not ranked rows
    assert (r.q1, r.q3) == (10, 30)
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "n_chars"])
    con = duckdb.connect()
    con.register("dn", pdf)
    duck = con.execute(
        source_length_outliers_sql("dn", "source", "n_chars")
    ).fetchall()
    assert [tuple(x) for x in duck] == [tuple(r)]


def test_source_length_outliers_twin_parity(spark):
    from rust_gd_spark.operators.lengthgate import (
        source_length_outliers,
        source_length_outliers_sql,
    )

    df = spark.createDataFrame(
        _length_rows(), "doc_id long, source string, n_chars long"
    )
    spark_rows = sorted(
        tuple(r) for r in source_length_outliers(df, "source", "n_chars").collect()
    )
    pdf = pd.DataFrame(_length_rows(), columns=["doc_id", "source", "n_chars"])
    con = duckdb.connect()
    con.register("d", pdf)
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(
            source_length_outliers_sql("d", "source", "n_chars")
        ).fetchall()
    )
    assert spark_rows == duck_rows


def _lang_rows():
    en = "the of and to in is was for on with the and of to is"
    return [
        (1, en, "en"),          # diagonal
        (2, en, "en"),
        (3, en, "de"),          # mislabeled feed: claimed de, english text
        (4, en, None),          # null claim groups under und
        (5, "zz yy xx ww vv uu tt ss rr qq", "en"),  # detector says und
    ]


def test_lang_agreement_structure(spark):
    from rust_gd_spark.operators.langaudit import lang_agreement

    df = spark.createDataFrame(_lang_rows(), "doc_id long, text string, lang string")
    rows = lang_agreement(df, "text", "lang").collect()
    by_claim: dict = {}
    for r in rows:
        by_claim.setdefault(r.claimed, []).append(r)
    # per-claim cell counts sum to the claimed total, fracs to 1
    for claimed, cells in by_claim.items():
        tot = cells[0].claimed_total
        assert sum(c.n_docs for c in cells) == tot
        assert abs(sum(c.frac for c in cells) - 1.0) < 1e-6
    # the mislabeled feed shows as claimed=de detected=en
    de = {(r.detected): r.n_docs for r in by_claim["de"]}
    assert de == {"en": 1}
    # null claim landed under und
    assert "und" in by_claim
    # gibberish text detected as und despite claimed en
    en_cells = {r.detected: r.n_docs for r in by_claim["en"]}
    assert en_cells.get("und") == 1 and en_cells.get("en") == 2


def test_lang_agreement_twin_parity(spark):
    from rust_gd_spark.operators.langaudit import (
        lang_agreement,
        lang_agreement_sql,
    )

    df = spark.createDataFrame(_lang_rows(), "doc_id long, text string, lang string")
    spark_rows = sorted(tuple(r) for r in lang_agreement(df).collect())
    pdf = pd.DataFrame(_lang_rows(), columns=["doc_id", "text", "lang"])
    con = duckdb.connect()
    con.register("langdocs", pdf)
    duck_rows = sorted(
        tuple(r) for r in con.execute(lang_agreement_sql("langdocs")).fetchall()
    )
    assert spark_rows == duck_rows


def test_snm_recall_audit_invariants(spark):
    from rust_gd_spark.operators.snm import snm_recall_audit

    # three near-dup pairs with shared 64-char prefixes (SNM-adjacent)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base + " one"),
        (2, base + " two"),
        (3, "completely different text with no overlap at all here ok"),
        (4, base + " one extra"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # window >= corpus size -> every pair is a candidate -> recall 1.0
    r = snm_recall_audit(
        df, "doc_id", "text", window=10, w_shingle=2, threshold=0.5
    ).collect()[0]
    assert r.n_spurious == 0
    assert r.n_hit == r.n_snm
    assert r.n_snm <= r.n_exact
    assert r.n_exact > 0
    assert r.recall == 1.0
