"""LSH band-parameter planning: choose (bands, rows) from a target
Jaccard threshold by minimizing the S-curve's false-positive +
false-negative mass (the standard construction in Leskovec/Rajaraman/
Ullman, "Mining of Massive Datasets" ch. 3; the datasketch library
ships the same optimizer).

For ``num_perm = bands × rows`` the probability a pair with Jaccard
``s`` shares ≥ 1 band is ``P(s) = 1 − (1 − s^rows)^bands``. The planner
scores every divisor split by the Riemann-midpoint areas::

    fp = Σ_{s_i < t} P(s_i) / grid          (candidates that shouldn't be)
    fn = Σ_{s_i ≥ t} (1 − P(s_i)) / grid    (misses that should be)

and picks the (bands, rows) minimizing ``w_fp·fp + w_fn·fn`` (ties →
fewer bands, i.e. the cheaper index). ``s50 = (1 − 2^(−1/bands))^(1/rows)``
— the threshold where the S-curve crosses 0.5 — is emitted per row so
an operator can sanity-check its config against its threshold.

Why this is an engine operator and not a notebook scribble: at corpus
scale the (bands, rows) choice IS the cost model — bands multiply the
posting-table shuffle volume and rows set the miss rate; the pipeline's
defaults (32×4 at t=0.5) should be auditable, and re-planning for a
different threshold should be a query, not a code change. The grid is
a few thousand rows total (divisor pairs × grid points) — trivially
parallel, pure codegen arithmetic, no UDF.

Determinism/oracle: fixed midpoint grid, fixed tie-break; the only
cross-engine risk is last-ulp ``pow`` drift under the 6-dp rounding —
the engine-wide float-oracle convention (`SURVEY.md §10`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def lsh_parameter_plan(
    spark: SparkSession,
    num_perm: int = 128,
    threshold: float = 0.5,
    grid: int = 1000,
    w_fp: float = 1.0,
    w_fn: float = 1.0,
) -> DataFrame:
    """One row per divisor split: ``(bands, rows, s50, fp_area, fn_area,
    cost, chosen)`` — ``chosen`` marks the minimizer (ties → fewer
    bands)."""
    if num_perm < 1 or grid < 10:
        raise ValueError("num_perm >= 1 and grid >= 10 required")
    if not (0.0 < threshold < 1.0):
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    splits = [(b, num_perm // b) for b in range(1, num_perm + 1) if num_perm % b == 0]
    base = spark.createDataFrame(splits, "bands int, rows int")
    s = (F.col("i") + 0.5) / F.lit(float(grid))
    p = 1.0 - F.pow(1.0 - F.pow(s, F.col("rows")), F.col("bands"))
    cell = (
        base.select(
            "bands",
            "rows",
            F.explode(F.sequence(F.lit(0), F.lit(grid - 1))).alias("i"),
        )
        .select(
            "bands",
            "rows",
            F.when(s < threshold, p).otherwise(0.0).alias("_fp"),
            F.when(s >= threshold, 1.0 - p).otherwise(0.0).alias("_fn"),
        )
    )
    scored = cell.groupBy("bands", "rows").agg(
        (F.sum("_fp") / grid).alias("fp_area"),
        (F.sum("_fn") / grid).alias("fn_area"),
    ).withColumn(
        "cost", w_fp * F.col("fp_area") + w_fn * F.col("fn_area")
    ).withColumn(
        "s50",
        F.pow(1.0 - F.pow(F.lit(0.5), 1.0 / F.col("bands")), 1.0 / F.col("rows")),
    )
    best = scored.agg(F.min(F.struct("cost", "bands")).alias("_b")).select(
        F.col("_b.cost").alias("_bc"), F.col("_b.bands").alias("_bb")
    )
    return (
        scored.crossJoin(F.broadcast(best))
        .select(
            "bands",
            "rows",
            F.round("s50", 6).alias("s50"),
            F.round("fp_area", 6).alias("fp_area"),
            F.round("fn_area", 6).alias("fn_area"),
            F.round("cost", 6).alias("cost"),
            ((F.col("cost") == F.col("_bc")) & (F.col("bands") == F.col("_bb"))).alias(
                "chosen"
            ),
        )
    )


def lsh_parameter_plan_sql(
    num_perm: int = 128,
    threshold: float = 0.5,
    grid: int = 1000,
    w_fp: float = 1.0,
    w_fn: float = 1.0,
) -> str:
    """DuckDB twin of ``lsh_parameter_plan`` (no input table — the plan
    is a pure function of its parameters)."""
    return f"""
        with splits as (
          select b::int as bands, ({num_perm} // b)::int as rows
          from range(1, {num_perm} + 1) t(b)
          where {num_perm} % b = 0
        ),
        cells as (
          select bands, rows,
                 (i + 0.5) / {float(grid)} as s,
                 1.0 - pow(1.0 - pow((i + 0.5) / {float(grid)}, rows), bands) as p
          from splits, range(0, {grid}) g(i)
        ),
        scored as (
          select bands, rows,
                 sum(case when s < {threshold} then p else 0.0 end) / {grid}
                   as fp_area,
                 sum(case when s >= {threshold} then 1.0 - p else 0.0 end) / {grid}
                   as fn_area
          from cells group by 1, 2
        ),
        costed as (
          select bands, rows, fp_area, fn_area,
                 {w_fp} * fp_area + {w_fn} * fn_area as cost,
                 pow(1.0 - pow(0.5, 1.0 / bands), 1.0 / rows) as s50
          from scored
        ),
        best as (
          select cost as bc, bands as bb from costed
          order by cost, bands limit 1
        )
        select c.bands, c.rows,
               round(c.s50, 6) as s50,
               round(c.fp_area, 6) as fp_area,
               round(c.fn_area, 6) as fn_area,
               round(c.cost, 6) as cost,
               (c.cost = b.bc and c.bands = b.bb) as chosen
        from costed c, best b
    """
