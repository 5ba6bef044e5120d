#!/usr/bin/env bash
# Two-cluster-size scaling evidence in EXECUTOR mode (BASELINE.json
# north_rule: "spark-submit --py-files on a multi-executor cluster at two
# cluster sizes, N and 4N executors").
#
# Unlike tools/run_scaling.sh (local[N] — one JVM, one Python worker pool,
# one in-process shuffle), this stands up a real Spark STANDALONE cluster
# on this box: one master + N single-core Worker JVMs, each taskset-pinned
# to its own core, each forking its own executor JVM with its own heap,
# netty shuffle client, and Python UDF worker pool. This is the
# multi-executor regime the criterion targets — the only thing still
# shared is the box itself (memory bandwidth, LLC), which is exactly the
# residual the local-mode analysis could not isolate.
#
# Usage: bash tools/run_cluster_scaling.sh [n_conv] [turns] [N] [4N]
#          [granularity] [repeats]
set -euo pipefail
cd "$(dirname "$0")/.."

N_CONV="${1:-5000}"
TURNS="${2:-20}"
N_SMALL="${3:-4}"
N_BIG="${4:-16}"
GRAN="${5:-conv}"
REPEATS="${6:-2}"
SPARK_DIST=/opt/spark
SCRATCH=.scratch/scaling_${N_CONV}x${TURNS}
CL=.scratch/cluster
RESULTS="$SCRATCH/results_cluster.jsonl"
MASTER_URL="spark://127.0.0.1:7077"

mkdir -p dist "$SCRATCH" "$CL/logs"
rm -f "$RESULTS" dist/rust_gd_spark.zip
(cd . && zip -qr dist/rust_gd_spark.zip rust_gd_spark -x '*__pycache__*')

if [ ! -f "$SCRATCH/transcripts.parquet" ]; then
  python tools/gen_transcripts.py --n-conv "$N_CONV" --turns "$TURNS" --out "$SCRATCH"
fi

export SPARK_HOME=$SPARK_DIST
export SPARK_LOG_DIR=$PWD/$CL/logs SPARK_PID_DIR=$PWD/$CL/pids
export PYSPARK_PYTHON=$(which python) PYSPARK_DRIVER_PYTHON=$(which python)
# heap-reuse for numpy temps in every executor's python workers (see
# rust_gd_spark/session.py) — on a real cluster: spark.executorEnv.*
export MALLOC_MMAP_THRESHOLD_=268435456 MALLOC_TRIM_THRESHOLD_=268435456

# Shuffle/spill to tmpfs: the sandbox virtio disk writes ~20 MB/s — a VM
# property, not an engine one (real executors have local NVMe).
SPARK_SHM="/dev/shm/spark_cluster_$$"
mkdir -p "$SPARK_SHM"

cleanup() {
  pkill -f "deploy.worker.Worker" 2>/dev/null || true
  "$SPARK_DIST/sbin/stop-master.sh" >/dev/null 2>&1 || true
  rm -rf "$SPARK_SHM"
}
trap cleanup EXIT

# Pre-fault guest memory once (Firecracker lazy host paging: first touch
# of a host-cold page is ~40x slower; one pass warms the whole run).
python - <<'EOF'
import numpy as np, time
t0 = time.time()
for i in range(36):
    a = np.empty(1 << 30, dtype=np.uint8)
    a[::4096] = 1
    del a
print(f"prefault 36 GiB in {time.time()-t0:.0f}s")
EOF

# Master + driver live on the TOP cores (28-31) in BOTH legs — the driver
# is a constant, only the executor count scales.
CTRL_CORES="28-31"
taskset -c "$CTRL_CORES" "$SPARK_DIST/sbin/start-master.sh" \
  --host 127.0.0.1 --port 7077 --webui-port 8081 >/dev/null
sleep 3

start_workers() {
  local N="$1"
  for i in $(seq 0 $((N - 1))); do
    SPARK_LOCAL_DIRS="$SPARK_SHM/w$i" \
    taskset -c "$i" "$SPARK_DIST/bin/spark-class" \
      org.apache.spark.deploy.worker.Worker "$MASTER_URL" \
      --cores 1 --memory 5g --port $((40000 + i)) --webui-port $((41000 + i)) \
      --work-dir "$CL/work$i" > "$CL/logs/worker$i.log" 2>&1 &
  done
  # wait until all N registered with the master (grep exits 1 on no
  # match — keep it out of set -e/pipefail's reach)
  for _ in $(seq 1 60); do
    local reg
    reg=$( (grep -l "Successfully registered" "$CL"/logs/worker*.log 2>/dev/null || true) | wc -l)
    if [ "$reg" -ge "$N" ]; then return 0; fi
    sleep 1
  done
  echo "workers failed to register" >&2; exit 1
}

stop_workers() {
  pkill -f "deploy.worker.Worker" 2>/dev/null || true
  sleep 2
  rm -f "$CL"/logs/worker*.log
}

run_leg() {
  local N="$1"
  start_workers "$N"
  # driver pinned to the control cores; executors run under the pinned
  # workers (CPU affinity inherits through fork).
  taskset -c "$CTRL_CORES" "$SPARK_DIST/bin/spark-submit" \
    --master "$MASTER_URL" \
    --driver-memory 16g \
    --conf spark.executor.cores=1 \
    --conf spark.executor.memory=4g \
    --conf "spark.cores.max=$N" \
    --conf spark.ui.enabled=false \
    --conf spark.executorEnv.MALLOC_MMAP_THRESHOLD_=268435456 \
    --conf spark.executorEnv.MALLOC_TRIM_THRESHOLD_=268435456 \
    ${EXTRA_SPARK_CONF:-} \
    --py-files dist/rust_gd_spark.zip \
    tools/scaling_bench.py \
    --data "$SCRATCH" --cores "$N" --granularity "$GRAN" --out "$RESULTS" \
    --mode cluster ${SCALING_FLAGS:-} 2>/dev/null
  stop_workers
}

for R in $(seq 1 "$REPEATS"); do
  for N in "$N_SMALL" "$N_BIG"; do
    echo "=== standalone cluster: $N x 1-core executors (repeat $R/$REPEATS) ==="
    run_leg "$N"
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
    "mode": "standalone-cluster",
    f"throughput_{n}": tn, f"throughput_{m}": tm,
    f"wall_{n}": best[n]["wall_sec"], f"wall_{m}": best[m]["wall_sec"],
    f"scaling_efficiency_{n}_to_{m}": round(eff, 3),
    "runs_per_leg": sum(1 for r in rows if r["cores"] == n),
    "pass": eff >= 0.8,
}))
EOF
