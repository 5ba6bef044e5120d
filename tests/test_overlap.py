"""Cross-source overlap matrix: hand-checked cell math (cross products,
diagonal C(n,2)), no-pair-explosion plan shape, generic pair-list form,
and dialect parity."""

from __future__ import annotations

import duckdb
import pytest

from rust_gd_spark.operators.overlap import (
    pair_overlap_matrix,
    source_overlap_matrix,
    source_overlap_matrix_sql,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # "boiler" appears 3x in A, 2x in B, 1x in C
        (1, "boiler", "A"), (2, "boiler", "A"), (3, "boiler", "A"),
        (4, "boiler", "B"), (5, "boiler", "B"),
        (6, "boiler", "C"),
        # "page" appears once in A and once in B
        (7, "page", "A"), (8, "page", "B"),
        # unique docs contribute nothing
        (9, "solo a", "A"), (10, "solo c", "C"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_matrix_cells(spark, docs):
    got = {
        (r.source_a, r.source_b): (r.n_dup_pairs, r.n_shared_keys)
        for r in source_overlap_matrix(docs).collect()
    }
    assert got[("A", "B")] == (3 * 2 + 1 * 1, 2)   # boiler + page
    assert got[("A", "C")] == (3 * 1, 1)
    assert got[("B", "C")] == (2 * 1, 1)
    assert got[("A", "A")] == (3, 1)               # C(3,2) boiler
    assert got[("B", "B")] == (1, 1)               # C(2,2)
    assert ("C", "C") not in got                   # no within-C dup
    assert len(got) == 5


def test_no_pair_explosion(spark, docs):
    """The plan must aggregate group COUNTS, never explode members into
    pairs: no Generate/explode and no self-join of the raw doc table."""
    plan = (
        source_overlap_matrix(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Generate" not in plan


def test_pair_list_form(spark, docs):
    pairs = spark.createDataFrame(
        [(1, 4), (1, 6), (7, 8), (2, 3)], "id_l long, id_r long"
    )
    got = {
        (r.source_a, r.source_b): r.n_dup_pairs
        for r in pair_overlap_matrix(
            pairs, docs.select("doc_id", "source"), id_col="doc_id"
        ).collect()
    }
    assert got == {("A", "B"): 2, ("A", "C"): 1, ("A", "A"): 1}


def test_sql_twin(spark, docs):
    got = {
        (r.source_a, r.source_b): (r.n_dup_pairs, r.n_shared_keys)
        for r in source_overlap_matrix(docs).collect()
    }
    con = duckdb.connect()
    con.register("t", docs.toPandas())
    twin = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(source_overlap_matrix_sql("t")).fetchall()
    }
    assert got == twin
