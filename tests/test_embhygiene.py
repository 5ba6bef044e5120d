"""embedding_hygiene (vector schema-integrity) and value_histogram (the
generalized log2 bucketing): hand-checked counts and DuckDB twin parity."""

from __future__ import annotations

import duckdb


def _vec_rows():
    return [
        (1, [1.0, 2.0, 3.0]),          # clean
        (2, None),                      # null vector
        (3, [1.0, 2.0]),                # wrong dim (expect 3)
        (4, [1.0, float("nan"), 3.0]),  # NaN-poisoned (dim ok)
        (5, [0.0, 0.0, 0.0]),           # all-zero
        (6, [1.0, float("inf"), 3.0]),  # Inf-poisoned
    ]


def test_embedding_hygiene(spark):
    from rust_gd_spark.operators.embhygiene import embedding_hygiene

    df = spark.createDataFrame(
        _vec_rows(), "vec_id long, embedding array<float>"
    )
    r = embedding_hygiene(df, "embedding", expected_dim=3).collect()[0]
    assert (r.n_vecs, r.n_null_vec, r.n_dim_mismatch, r.n_nonfinite,
            r.n_zero_vec) == (6, 1, 1, 2, 1)


def test_embedding_hygiene_twin_parity(spark):
    from rust_gd_spark.operators.embhygiene import (
        embedding_hygiene,
        embedding_hygiene_sql,
    )

    df = spark.createDataFrame(
        _vec_rows(), "vec_id long, embedding array<float>"
    )
    spark_rows = sorted(
        tuple(r) for r in embedding_hygiene(df, "embedding", 3).collect()
    )
    # NOTE: pandas->DuckDB registration maps NaN list elements to NULL,
    # so the twin side is built from SQL literals (the driver oracle
    # does the same: defects are constructed in-query)
    con = duckdb.connect()
    con.execute(
        """
        create view emb_tbl as select * from (values
          (1, [1.0, 2.0, 3.0]::float[]),
          (2, null::float[]),
          (3, [1.0, 2.0]::float[]),
          (4, [1.0, 'nan'::float, 3.0]::float[]),
          (5, [0.0, 0.0, 0.0]::float[]),
          (6, [1.0, 'inf'::float, 3.0]::float[])
        ) v(vec_id, embedding)
        """
    )
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(
            embedding_hygiene_sql("emb_tbl", "embedding", 3)
        ).fetchall()
    )
    assert spark_rows == duck_rows


def test_value_histogram(spark):
    from rust_gd_spark.operators.histogram import value_histogram

    df = spark.createDataFrame(
        [(1, 1), (2, 3), (3, 9), (4, 9)], "id long, v long"
    )
    out = {
        r.bucket: (r.lo_tokens, r.n_docs, r.total_tokens)
        for r in value_histogram(df, "v").collect()
    }
    assert out[0] == (1, 1, 1)
    assert out[1] == (2, 1, 3)
    assert out[3] == (8, 2, 18)
