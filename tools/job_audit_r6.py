"""List every Spark job one query run submits (name, tasks, duration).

Usage: python tools/job_audit_r6.py <query_name> [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_gd_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="job_audit")
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    # warm run (codegen etc.)
    q[name](spark, sf_dir).count()

    store = spark.sparkContext._jsc.sc().statusStore()
    j0 = store.jobsList(None).size()
    t0 = time.monotonic()
    q[name](spark, sf_dir).count()
    wall = time.monotonic() - t0
    jl = store.jobsList(None)
    n = jl.size() - j0
    rows = []
    for k in range(n):
        j = jl.apply(k)
        dur = (j.completionTime().get().getTime() - j.submissionTime().get().getTime()) / 1000.0 \
            if j.completionTime().isDefined() else -1
        rows.append((j.jobId(), j.name()[:110], j.numTasks(), dur))
    rows.sort()
    tot = 0.0
    for jid, jname, ntasks, dur in rows:
        tot += max(dur, 0)
        print(f"{jid:5d} {dur:7.3f}s tasks={ntasks:4d}  {jname}")
    print(f"== {name}: wall {wall:.2f}s, {n} jobs, sum(job dur) {tot:.2f}s")


if __name__ == "__main__":
    main()
