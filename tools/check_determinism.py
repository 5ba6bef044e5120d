"""Determinism sweep: every driver query executed under two DIFFERENT
session shapes (core count + shuffle partitioning) must produce the
SAME value hash. Catches partition-order-dependent outputs — floating
aggregation order, undeterministic tie-breaks, first()-style picks —
the bug class the repo's bit-stability discipline (6-dp rounding,
min-of-struct canonical picks, total-order ranks) exists to prevent.

Usage: python tools/check_determinism.py [sf_dir] [name ...]

Two separate Spark sessions run sequentially (stop() between them) so
the second shape is real, not a conf no-op on a live context.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_oracles import value_hash  # noqa: E402


def _run_all(sf_dir: str, only: set[str], cores: int, parts: int) -> dict:
    from rust_gd_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name=f"determinism_{cores}_{parts}",
        cores=cores,
        extra_conf={"spark.sql.shuffle.partitions": str(parts)},
    )
    out = {}
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        out[name] = value_hash(fn(spark, sf_dir).toPandas())
    spark.stop()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    a = _run_all(sf_dir, only, cores=8, parts=16)
    b = _run_all(sf_dir, only, cores=3, parts=7)
    bad = 0
    for name in a:
        ok = a[name] == b[name]
        print(f"{name:28s} {'STABLE' if ok else 'SHAPE-DEPENDENT'}")
        bad += 0 if ok else 1
    print(f"{bad} shape-dependent of {len(a)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
