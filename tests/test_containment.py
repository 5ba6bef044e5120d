"""Containment pairs: subset-doc detection Jaccard misses, direction
math, max_df guard, dialect parity."""

from __future__ import annotations

import duckdb
import pytest

from rust_gd_spark.operators.containment import (
    exact_containment_pairs,
    exact_containment_pairs_sql,
)


@pytest.fixture(scope="module")
def docs(spark):
    long = " ".join(f"tok{i}" for i in range(100))
    short = " ".join(f"tok{i}" for i in range(20))  # strict prefix subset
    other = " ".join(f"alt{i}" for i in range(30))
    return spark.createDataFrame(
        [(1, long), (2, short), (3, other)], "uid long, text string"
    )


def test_subset_found_jaccard_blind(spark, docs):
    out = {
        (r.id_l, r.id_r): r
        for r in exact_containment_pairs(
            docs, "uid", "text", w=5, threshold=0.9
        ).collect()
    }
    assert set(out) == {(1, 2)}
    p = out[(1, 2)]
    # doc 2's 16 shingles are all prefix shingles of doc 1's 96
    assert p.containment_r == 1.0 and p.containment == 1.0
    assert p.containment_l == pytest.approx(16 / 96, abs=1e-6)
    assert p.jaccard == pytest.approx(16 / 96, abs=1e-6)  # far below 0.9


def test_direction_and_threshold(spark, docs):
    # at threshold above 1.0-epsilon nothing but exact-direction 1.0 passes
    out = exact_containment_pairs(docs, "uid", "text", w=5, threshold=1.0).collect()
    assert [(r.id_l, r.id_r) for r in out] == [(1, 2)]
    with pytest.raises(ValueError, match="threshold"):
        exact_containment_pairs(docs, "uid", "text", threshold=0.0)


def test_max_df_guard(spark):
    # a shingle present in every doc is dropped at max_df=2 -> no pairs
    t = "common words shared by every document here"
    df = spark.createDataFrame(
        [(i, t) for i in range(3)], "uid long, text string"
    )
    full = exact_containment_pairs(df, "uid", "text", w=5, threshold=0.5)
    assert full.count() == 3
    capped = exact_containment_pairs(
        df, "uid", "text", w=5, threshold=0.5, max_df=2
    )
    assert capped.count() == 0


def test_sql_twin(spark, docs):
    got = {
        (r.id_l, r.id_r): (
            r.n_common, r.containment_l, r.containment_r, r.containment, r.jaccard
        )
        for r in exact_containment_pairs(
            docs, "uid", "text", w=5, threshold=0.1
        ).collect()
    }
    norm = "trim(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9]+', ' ', 'g'))"
    toks = f"string_split_regex({norm}, '\\s+')"
    sh = (
        f"case when len({toks}) >= 5 then "
        f"list_transform(range(0, len({toks}) - 4), "
        f"i -> array_to_string(list_slice({toks}, i + 1, i + 5), ' ')) "
        f"else [coalesce(array_to_string({toks}, ' '), '')] end"
    )
    con = duckdb.connect()
    con.register("t", docs.toPandas())
    twin = {
        (r[0], r[1]): tuple(r[2:])
        for r in con.execute(
            exact_containment_pairs_sql("t", "uid", sh, threshold=0.1)
        ).fetchall()
    }
    assert got == twin
