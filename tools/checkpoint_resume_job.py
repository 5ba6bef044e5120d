"""Executor-loss resume check for connected_components (north_rule:
"resumes from checkpoint after executor loss").

Submitted by tools/test_checkpoint_resume.sh against a real standalone
cluster. The job builds a two-path graph (known components by
construction: every node's component is its path's minimum node id), runs
the DISTRIBUTED large-star/small-star fixpoint, and SIGKILLs one executor
JVM mid-iteration from a driver-side thread.

* --mode reliable: checkpoint_dir is set, every lineage truncation is a
  df.checkpoint() into the shared dir — the scheduler re-reads checkpoint
  files for the dead executor's partitions and the job must complete with
  EXACT cluster assignments (prints RESUME_OK).
* --mode local: the pre-round-5 behavior (localCheckpoint — executor
  memory blocks). The same kill must NOT produce RESUME_OK: either the
  job dies (checkpoint blocks lost) or — if Spark recovers by lineage —
  the harness records that localCheckpoint got lucky; the reliable leg is
  the criterion.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import threading
import time

from pyspark.sql import SparkSession, functions as F

from rust_gd_spark.operators.components import connected_components


def _kill_one_executor(delay: float) -> None:
    time.sleep(delay)
    out = subprocess.run(
        ["pgrep", "-f", "CoarseGrainedExecutorBackend"],
        capture_output=True,
        text=True,
    )
    pids = [int(p) for p in out.stdout.split()]
    if not pids:
        print("KILLER: no executor process found", flush=True)
        return
    victim = pids[-1]
    os.kill(victim, 9)
    print(f"KILLER: SIGKILLed executor pid {victim}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=500_000)
    ap.add_argument("--kill-after", type=float, default=10.0)
    ap.add_argument("--mode", choices=["reliable", "local"], required=True)
    ap.add_argument("--checkpoint-dir", default=None)
    args = ap.parse_args()

    spark = SparkSession.builder.appName(
        f"cc_resume_{args.mode}"
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    n = args.nodes
    mid = n // 2
    # two disjoint paths: 0..mid and (mid+1)..(n-1); expected component =
    # 0 for the first, mid+1 for the second. Path graphs maximize the
    # star-round count (diameter n), so the fixpoint runs long enough for
    # a mid-flight kill.
    edges = (
        spark.range(n - 1)
        .filter(F.col("id") != mid)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        .repartition(16)
    )

    threading.Thread(
        target=_kill_one_executor, args=(args.kill_after,), daemon=True
    ).start()

    ckpt = args.checkpoint_dir if args.mode == "reliable" else None
    comp = connected_components(edges, small_graph_rows=0, checkpoint_dir=ckpt)
    bad = comp.filter(
        ~(
            ((F.col("node") <= mid) & (F.col("component") == 0))
            | ((F.col("node") > mid) & (F.col("component") == mid + 1))
        )
    ).count()
    n_nodes = comp.count()
    assert bad == 0, f"{bad} nodes with wrong component"
    assert n_nodes == n, f"expected {n} nodes, got {n_nodes}"
    print(f"RESUME_OK mode={args.mode} nodes={n_nodes} bad={bad}", flush=True)


if __name__ == "__main__":
    main()
