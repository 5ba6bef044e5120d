"""LSH parameter planner + compaction planner: hand-checked math,
bin invariants, determinism across partition counts, dialect parity."""

from __future__ import annotations

import duckdb
import pytest

from rust_gd_spark.operators.compaction import compaction_plan, compaction_plan_sql
from rust_gd_spark.operators.lshplan import lsh_parameter_plan, lsh_parameter_plan_sql


# ---------------------------------------------------------------------------
# LSH parameter plan
# ---------------------------------------------------------------------------

def test_lsh_plan_divisors_and_s50(spark):
    rows = {(r.bands, r.rows): r for r in lsh_parameter_plan(
        spark, num_perm=16, threshold=0.5, grid=200
    ).collect()}
    assert set(rows) == {(1, 16), (2, 8), (4, 4), (8, 2), (16, 1)}
    # closed form: s50 = (1 - 2^(-1/b))^(1/r)
    r44 = rows[(4, 4)]
    assert r44.s50 == pytest.approx((1 - 0.5 ** 0.25) ** 0.25, abs=1e-6)
    # exactly one chosen, and it's the argmin cost
    chosen = [k for k, v in rows.items() if v.chosen]
    assert len(chosen) == 1
    assert rows[chosen[0]].cost == min(v.cost for v in rows.values())


def test_lsh_plan_threshold_moves_choice(spark):
    """Higher threshold favors more rows per band (steeper curve,
    later crossover)."""
    def chosen(t):
        return next(
            (r.bands, r.rows)
            for r in lsh_parameter_plan(spark, 128, threshold=t, grid=500).collect()
            if r.chosen
        )
    b_low, r_low = chosen(0.3)
    b_high, r_high = chosen(0.85)
    assert r_high > r_low
    # the chosen config's s50 should sit near its threshold
    plan = {(r.bands, r.rows): r.s50 for r in lsh_parameter_plan(
        spark, 128, threshold=0.85, grid=500
    ).collect()}
    assert abs(plan[(b_high, r_high)] - 0.85) < 0.2


def test_lsh_plan_validation(spark):
    with pytest.raises(ValueError, match="threshold"):
        lsh_parameter_plan(spark, 16, threshold=1.0)
    with pytest.raises(ValueError, match="grid"):
        lsh_parameter_plan(spark, 16, grid=5)


def test_lsh_plan_sql_twin(spark):
    got = {
        (r.bands, r.rows): (r.s50, r.fp_area, r.fn_area, r.cost, r.chosen)
        for r in lsh_parameter_plan(spark, 32, threshold=0.6, grid=400).collect()
    }
    con = duckdb.connect()
    twin = {
        (r[0], r[1]): tuple(r[2:])
        for r in con.execute(
            lsh_parameter_plan_sql(32, threshold=0.6, grid=400)
        ).fetchall()
    }
    assert got == twin


# ---------------------------------------------------------------------------
# compaction plan
# ---------------------------------------------------------------------------

def _files(spark, sizes):
    return spark.createDataFrame(
        [(f"f{i:03d}", s) for i, s in enumerate(sizes)], "path string, bytes long"
    )


def test_compaction_bin_invariants(spark):
    out = compaction_plan(_files(spark, [60] * 10), target_bytes=100).collect()
    by_bin: dict = {}
    for r in out:
        by_bin.setdefault(r.bin, []).append(r)
    # equal sizes, target 100: prefix starts 0,60,...,540 → //100
    assert {r.path: r.bin for r in out} == {
        f"f{i:03d}": (i * 60) // 100 for i in range(10)
    }
    for rows in by_bin.values():
        # totals consistent; bounded by target + max member size
        assert rows[0].bin_bytes == sum(x.bytes for x in rows)
        assert rows[0].bin_files == len(rows)
        assert rows[0].bin_bytes < 100 + max(x.bytes for x in rows)
    # bins cover the whole byte line: mean bin size ≈ target
    assert sum(r.bytes for r in out) == 600
    assert len(by_bin) == 6  # ceil(600/100)


def test_compaction_oversized_alone(spark):
    out = {r.path: r for r in compaction_plan(
        _files(spark, [500, 10, 10, 10]), target_bytes=100
    ).collect()}
    big = out["f000"]
    assert big.oversized and big.bin_files >= 1
    # the oversized file's bin contains only itself (desc order: it
    # opens bin 0 and closes past target immediately)
    assert big.bin_files == 1
    assert not out["f001"].oversized


def test_compaction_deterministic_across_partitioning(spark):
    sizes = [((i * 37) % 90) + 10 for i in range(200)]
    a = {
        r.path: (r.bin, r.bin_bytes)
        for r in compaction_plan(
            _files(spark, sizes), 256, num_partitions=2
        ).collect()
    }
    b = {
        r.path: (r.bin, r.bin_bytes)
        for r in compaction_plan(
            _files(spark, sizes), 256, num_partitions=13
        ).collect()
    }
    assert a == b


def test_compaction_validation(spark):
    with pytest.raises(ValueError, match="target_bytes"):
        compaction_plan(_files(spark, [1]), 0)


def test_compaction_sql_twin(spark):
    sizes = [((i * 53) % 400) + 1 for i in range(60)]
    df = _files(spark, sizes)
    got = {
        r.path: (r.bytes, r.bin, r.bin_bytes, r.bin_files, r.oversized)
        for r in compaction_plan(df, 300, num_partitions=4).collect()
    }
    con = duckdb.connect()
    con.register("fstats", df.toPandas())
    twin = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            compaction_plan_sql("fstats", "path", "bytes", 300)
        ).fetchall()
    }
    assert got == twin
