"""Round-6 optimization profiler (guide §1: measure first).

Times individual queries() entries with the bench's session + warmup
methodology (min-of-2, noop-style count force), captures
.explain("formatted") into plans/r06/, and can print per-stage wall times
for the near-dup pipeline via the StageRunner metrics.

Usage:
    python tools/profile_r6.py --queries transcript_clusters,dedup_funnel
    python tools/profile_r6.py --stages              # pipeline stage profile
    python tools/profile_r6.py --queries X --plans before|after
"""

from __future__ import annotations

import argparse
import atexit
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tmpfs_local_dir():
    base = "/dev/shm"
    try:
        if not os.path.isdir(base):
            return None
        st = os.statvfs(base)
        if st.f_bavail * st.f_frsize < 8 << 30:
            return None
        d = tempfile.mkdtemp(prefix="spark_prof_", dir=base)
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        return d
    except OSError:
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--plans", default="", help="suffix: before/after — write plans/r06/<q>_<suffix>.txt")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from rust_gd_spark.session import get_spark

    local_dir = _tmpfs_local_dir()
    spark = get_spark(
        app_name="profile_r6",
        extra_conf={"spark.local.dir": local_dir} if local_dir else None,
    )
    sf_dir = args.sf_dir

    import __spark_entry__ as entrymod

    if not args.no_warmup:
        from rust_gd_spark.pipeline import DedupConfig, near_dup_pipeline, with_turn_uid

        tr = with_turn_uid(entrymod._transcripts_from_docs(spark, sf_dir))
        res = near_dup_pipeline(
            tr.sample(0.1, seed=7), "uid", "text",
            DedupConfig(jaccard_threshold=0.5, min_substring_len=120),
            collect_stats=False,
        )
        res.clusters.count()

    if args.stages:
        from rust_gd_spark.pipeline import DedupConfig, near_dup_pipeline, with_turn_uid

        for label, kwargs in [
            ("oracle-shape (no simhash, exact pairs, stats=True)",
             dict(cfg=DedupConfig(jaccard_threshold=0.5, min_substring_len=120,
                                  enable_simhash=False, neighbor_window=None),
                  collect_stats=True)),
            ("oracle-shape (no simhash, exact pairs, stats=False)",
             dict(cfg=DedupConfig(jaccard_threshold=0.5, min_substring_len=120,
                                  enable_simhash=False, neighbor_window=None),
                  collect_stats=False)),
            ("full 4-path (stats=False)",
             dict(cfg=DedupConfig(jaccard_threshold=0.5, min_substring_len=120),
                  collect_stats=False)),
        ]:
            tr = with_turn_uid(entrymod._transcripts_from_docs(spark, sf_dir))
            t0 = time.monotonic()
            res = near_dup_pipeline(tr, "uid", "text", kwargs["cfg"],
                                    collect_stats=kwargs["collect_stats"])
            n = res.clusters.count()
            wall = time.monotonic() - t0
            print(f"\n== {label}: wall {wall:.2f}s clusters={n}")
            for run_id, stage, rows, wall_ms, resumed in res.metrics.collect():
                print(f"   {stage:28s} {wall_ms/1000.0:7.3f}s rows={rows}")
        return

    q = entrymod.queries()
    names = [n for n in args.queries.split(",") if n]
    out = {}
    for name in names:
        fn = q[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        if args.plans:
            os.makedirs(os.path.join(_REPO, "plans", "r06"), exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(_REPO, "plans", "r06", f"{name}_{args.plans}.txt"), "w") as fh:
                fh.write(plan)
        samples = []
        store = spark.sparkContext._jsc.sc().statusStore()
        jobs0 = tasks0 = None
        for i in range(args.repeats):
            j0 = store.jobsList(None).size()
            t0 = time.monotonic()
            fn(spark, sf_dir).count()
            samples.append(round(time.monotonic() - t0, 3))
            if i == args.repeats - 1:
                jl = store.jobsList(None)
                njobs = jl.size() - j0
                ntasks = sum(
                    jl.apply(k).numCompletedTasks()
                    for k in range(njobs)
                )
                jobs0, tasks0 = njobs, ntasks
        out[name] = {"min": min(samples), "samples": samples,
                     "jobs": jobs0, "tasks": tasks0}
        print(f"{name:35s} min {min(samples):7.3f}  {samples}  jobs={jobs0} tasks={tasks0}")
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
