"""Local replica of the driver's Spark-vs-DuckDB correctness harness.

Runs every ``queries()`` entry at sf0.01; where ``oracle_sql()`` has a
matching key, compares row count + sorted-column value hash against DuckDB.
Usage: python tools/check_oracles.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from rust_gd_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm_cell(v) -> str:
    """Render a cell; integral-valued floats print as ints ("1.0" -> "1").

    Guards against the nullable-int pandas trap: an outer join (or DuckDB
    HUGEINT sum) turns an int column into float64 in ``fetchdf``, so a
    value-identical frame would hash-mismatch on representation alone.
    The driver's hash is stricter, so oracle SQL must STILL cast integer
    aggregates (``sum(x)::bigint``) — this normalization only makes the
    local harness report value differences, not representation ones.
    """
    if isinstance(v, float):
        if v == v and abs(v) < 2**53 and float(v).is_integer():
            return str(int(v))
    return str(v)


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    rows = sorted(
        df.apply(lambda r: "|".join(_norm_cell(v) for v in r), axis=1).tolist()
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    import time as _time
    for name, fn in qs.items():
        if only and name not in only:
            continue
        _t0 = _time.monotonic()
        sdf = fn(spark, sf_dir).toPandas()
        _el = _time.monotonic() - _t0
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(sdf)} rows, cols={list(sdf.columns)}  [{_el:.2f}s]")
            continue
        ddf = con.execute(oracles[name]).fetchdf()
        ok_rows = len(sdf) == len(ddf)
        ok_cols = sorted(sdf.columns) == sorted(ddf.columns)
        if ok_cols:
            # The driver's hash does NOT normalize int-vs-float64, so a
            # dtype split here (bare sum() reaching the projection) would
            # pass locally but fail the driver — surface it loudly.
            for c in sdf.columns:
                s_int = pd.api.types.is_integer_dtype(sdf[c])
                d_int = pd.api.types.is_integer_dtype(ddf[c])
                s_f = pd.api.types.is_float_dtype(sdf[c])
                d_f = pd.api.types.is_float_dtype(ddf[c])
                if (s_int and d_f) or (s_f and d_int):
                    print(
                        f"{name:24s} DTYPE-WARN col={c}: spark={sdf[c].dtype} "
                        f"duckdb={ddf[c].dtype} — add ::bigint (or matching "
                        "cast) in the oracle; the driver hash will mismatch"
                    )
        ok_hash = ok_rows and ok_cols and value_hash(sdf) == value_hash(ddf)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(
            f"{name:24s} {status}  rows {len(sdf)}/{len(ddf)}"
            + ("" if ok_cols else f"  COLS {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
            + ("" if ok_hash else "  HASH-MISMATCH")
            + f"  [{_el:.2f}s]"
        )
        if status == "FAIL":
            failures += 1
            if ok_rows and ok_cols:
                m = sdf[sorted(sdf.columns)].copy()
                d = ddf[sorted(ddf.columns)].copy()
                key = sorted(sdf.columns)[0]
                m = m.sort_values(list(m.columns)).reset_index(drop=True)
                d = d.sort_values(list(d.columns)).reset_index(drop=True)
                neq = (m.astype(str) != d.astype(str)).any(axis=1)
                print(m[neq].head(3))
                print(d[neq].head(3))
    print(f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
