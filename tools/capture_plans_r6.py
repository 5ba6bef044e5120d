"""Capture .explain('formatted') for the round-6-touched queries.

Usage: python tools/capture_plans_r6.py <repo_root> <suffix> [out_dir]
Runs against the entry module found in <repo_root>; writes
<out_dir (default /root/repo)>/plans/r06/<query>_<suffix>.txt.
"""
from __future__ import annotations

import os
import sys

root = os.path.abspath(sys.argv[1])
suffix = sys.argv[2]
out_root = os.path.abspath(sys.argv[3]) if len(sys.argv) > 3 else "/root/repo"
sys.path.insert(0, root)

QUERIES = [
    "transcript_clusters", "cluster_representatives", "cluster_deltas",
    "cluster_quality_audit", "soft_dedup_weights", "leakage_safe_split",
    "dedup_funnel", "training_data_prep",
    "minhash_lsh_pairs", "ngram_jaccard_pairs", "bag_jaccard_pairs",
    "jaccard_topk_neighbors", "snm_recall_audit", "snm_candidates",
    "cdc_chunks", "cdc_dedup_rewrite", "ngram_topk", "bbit_estimate_audit",
    "incremental_clusters",
]

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from rust_gd_spark.session import get_spark

    spark = get_spark(app_name=f"plans_{suffix}")
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    out_dir = os.path.join(out_root, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in QUERIES:
        try:
            df = q[name](spark, SF_DIR)
            plan = df.sparkSession._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - capture what we can
            plan = f"(capture failed: {exc})"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print("captured", name, suffix)


if __name__ == "__main__":
    main()
