#!/usr/bin/env bash
# Quiet-gated executor-mode scaling pairs (see BASELINE.md "Measurement
# noise"): this VM's co-tenant load arrives in bursts that invalidate
# whichever leg it lands on. Instead of hoping a batch stays quiet, this
# harness (a) waits for a quiet window before EACH leg (pre-leg steal
# sample), (b) re-runs any leg whose in-leg steal exceeded the threshold,
# and (c) appends every completed leg to a git-tracked JSONL
# (BENCH_scaling_r3.jsonl) so a quiet pair obtained late still lands in
# the repo. Legs alternate N,4N back-to-back so accepted pairs are
# same-batch (cross-batch comparison is invalid here).
#
# Usage: bash tools/run_scaling_quiet.sh [n_conv] [turns] [N] [4N] [gran]
#          [max_pairs] [deadline_min]
set -uo pipefail
cd "$(dirname "$0")/.."

N_CONV="${1:-100000}"
TURNS="${2:-20}"
N_SMALL="${3:-4}"
N_BIG="${4:-16}"
GRAN="${5:-turn}"
MAX_PAIRS="${6:-3}"
DEADLINE_MIN="${7:-150}"
PRE_STEAL_MAX="${PRE_STEAL_MAX:-0.20}"   # %: gate to open a leg
LEG_STEAL_MAX="${LEG_STEAL_MAX:-0.50}"   # %: accept a finished leg
# Mid-pair re-check threshold. Defaults to the open gate; set lower on
# oscillating-ambient days: the mid probe is a POINT sample between legs
# (the legs themselves are certified by their in-leg steal checks and
# recorded throughputs), so a ±1 GB/s ambient wobble should not knife an
# otherwise-clean pair — while a genuine collapse still must. The
# accepted row always records the measured midpair_triad_gbs.
MID_BW_MIN_GBS="${MID_BW_MIN_GBS:-}"
# DRAM-interference gate: co-tenant memory-bandwidth pressure does NOT
# register as steal time (steal only counts CPU the hypervisor withheld),
# but it depresses every leg — measured 2026-08-17: a day with 1-core
# triad at 11.2 GB/s (vs the 13.6 quiet-day baseline) halved pipeline
# throughput at 4 executors while steal stayed ~1%. Gate on a quick
# 1-core triad probe alongside the steal gate.
BW_MIN_GBS="${BW_MIN_GBS:-12.8}"
SPARK_DIST=/opt/spark
SCRATCH=.scratch/scaling_${N_CONV}x${TURNS}
CL=.scratch/cluster_quiet
RESULTS="$SCRATCH/results_quiet.jsonl"
LEDGER="BENCH_scaling_r3.jsonl"
MASTER_URL="spark://127.0.0.1:7077"
DEADLINE=$(( $(date +%s) + DEADLINE_MIN * 60 ))

mkdir -p dist "$SCRATCH" "$CL/logs"
rm -f "$RESULTS" dist/rust_gd_spark.zip
(cd . && zip -qr dist/rust_gd_spark.zip rust_gd_spark -x '*__pycache__*')

if [ ! -f "$SCRATCH/transcripts.parquet" ]; then
  python tools/gen_transcripts.py --n-conv "$N_CONV" --turns "$TURNS" --out "$SCRATCH"
fi

export SPARK_HOME=$SPARK_DIST
export SPARK_LOG_DIR=$PWD/$CL/logs SPARK_PID_DIR=$PWD/$CL/pids
export PYSPARK_PYTHON=$(which python) PYSPARK_DRIVER_PYTHON=$(which python)
export MALLOC_MMAP_THRESHOLD_=268435456 MALLOC_TRIM_THRESHOLD_=268435456

SPARK_SHM="/dev/shm/spark_quiet_$$"
mkdir -p "$SPARK_SHM"

cleanup() {
  pkill -f "deploy.worker.Worker" 2>/dev/null || true
  "$SPARK_DIST/sbin/stop-master.sh" >/dev/null 2>&1 || true
  rm -rf "$SPARK_SHM"
}
trap cleanup EXIT

# pre-fault (Firecracker lazy host paging — see run_cluster_scaling.sh)
python - <<'EOF'
import numpy as np, time
t0 = time.time()
for i in range(36):
    a = np.empty(1 << 30, dtype=np.uint8)
    a[::4096] = 1
    del a
print(f"prefault 36 GiB in {time.time()-t0:.0f}s", flush=True)
EOF

steal_now() {
  python - <<'EOF'
import time
def cpu():
    with open('/proc/stat') as f:
        return list(map(int, f.readline().split()[1:]))
a = cpu(); time.sleep(10); b = cpu()
d = [y - x for x, y in zip(a, b)]
print(f"{100*d[7]/max(1,sum(d)):.3f}")
EOF
}

wait_quiet() {
  while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    s=$(steal_now)
    ok=$(python -c "print(1 if $s <= $PRE_STEAL_MAX else 0)")
    if [ "$ok" = "1" ]; then
      bw=$(taskset -c 0 python tools/bw_probe.py --quick)
      bwok=$(python -c "print(1 if $bw >= $BW_MIN_GBS else 0)")
      if [ "$bwok" = "1" ]; then
        GATE_BW="$bw"
        echo "gate open (steal ${s}%, triad ${bw} GB/s)"; return 0
      fi
      echo "gate closed (steal ${s}% ok, triad ${bw} < ${BW_MIN_GBS} GB/s), waiting 120s"
      sleep 120
      continue
    fi
    echo "gate closed (steal ${s}%), waiting 45s"
    sleep 45
  done
  return 1
}

CTRL_CORES="28-31"
taskset -c "$CTRL_CORES" "$SPARK_DIST/sbin/start-master.sh" \
  --host 127.0.0.1 --port 7077 --webui-port 8082 >/dev/null
sleep 3

start_workers() {
  local N="$1"
  for i in $(seq 0 $((N - 1))); do
    SPARK_LOCAL_DIRS="$SPARK_SHM/w$i" \
    taskset -c "$i" "$SPARK_DIST/bin/spark-class" \
      org.apache.spark.deploy.worker.Worker "$MASTER_URL" \
      --cores 1 --memory 5g --port $((42000 + i)) --webui-port $((43000 + i)) \
      --work-dir "$CL/work$i" > "$CL/logs/worker$i.log" 2>&1 &
  done
  for _ in $(seq 1 60); do
    local reg
    reg=$( (grep -l "Successfully registered" "$CL"/logs/worker*.log 2>/dev/null || true) | wc -l)
    if [ "$reg" -ge "$N" ]; then return 0; fi
    sleep 1
  done
  echo "workers failed to register" >&2; return 1
}

stop_workers() {
  pkill -f "deploy.worker.Worker" 2>/dev/null || true
  sleep 2
  rm -f "$CL"/logs/worker*.log
}

# Runs one leg; echoes "<throughput> <steal>" on success, empty on failure.
run_leg() {
  local N="$1"
  start_workers "$N" || return 1
  local before after
  before=0
  [ -f "$RESULTS" ] && before=$(wc -l < "$RESULTS")
  taskset -c "$CTRL_CORES" "$SPARK_DIST/bin/spark-submit" \
    --master "$MASTER_URL" \
    --driver-memory 16g \
    --conf spark.executor.cores=1 \
    --conf spark.executor.memory=4g \
    --conf "spark.cores.max=$N" \
    --conf spark.ui.enabled=false \
    --conf spark.executorEnv.MALLOC_MMAP_THRESHOLD_=268435456 \
    --conf spark.executorEnv.MALLOC_TRIM_THRESHOLD_=268435456 \
    --py-files dist/rust_gd_spark.zip \
    tools/scaling_bench.py \
    --data "$SCRATCH" --cores "$N" --granularity "$GRAN" --out "$RESULTS" \
    --mode cluster ${SCALING_FLAGS:-} >> "$CL/logs/submit.log" 2>/dev/null
  stop_workers
  after=$(wc -l < "$RESULTS" 2>/dev/null || echo 0)
  if [ "$after" -le "$before" ]; then return 1; fi
  tail -1 "$RESULTS" >> "$LEDGER"
  tail -1 "$RESULTS" | python -c 'import json,sys; r=json.loads(sys.stdin.read()); print(r["value"], r["steal_pct"])'
}

PAIRS_DONE=0
while [ "$PAIRS_DONE" -lt "$MAX_PAIRS" ] && [ "$(date +%s)" -lt "$DEADLINE" ]; do
  wait_quiet || break
  echo "=== pair attempt: leg N=$N_SMALL ==="
  SMALL=$(run_leg "$N_SMALL") || { echo "small leg failed"; continue; }
  read -r T_S S_S <<< "$SMALL"
  ok=$(python -c "print(1 if $S_S <= $LEG_STEAL_MAX else 0)")
  [ "$ok" = "1" ] || { echo "small leg polluted (steal ${S_S}%), retrying"; continue; }
  # mid-pair DRAM re-check: a bandwidth drop between legs invalidates the pair
  MIDBW=$(taskset -c 0 python tools/bw_probe.py --quick)
  MIDGATE="${MID_BW_MIN_GBS:-$BW_MIN_GBS}"
  midok=$(python -c "print(1 if $MIDBW >= $MIDGATE else 0)")
  [ "$midok" = "1" ] || { echo "mid-pair triad ${MIDBW} < ${MIDGATE} GB/s, retrying pair"; continue; }
  echo "=== pair attempt: leg N=$N_BIG ==="
  BIG=$(run_leg "$N_BIG") || { echo "big leg failed"; continue; }
  read -r T_B S_B <<< "$BIG"
  ok=$(python -c "print(1 if $S_B <= $LEG_STEAL_MAX else 0)")
  [ "$ok" = "1" ] || { echo "big leg polluted (steal ${S_B}%), retrying pair"; continue; }
  E=$(python -c "print(round($T_B / (($N_BIG / $N_SMALL) * $T_S), 3))")
  # Same-minute DRAM ceiling at both widths: a pure-streaming job's own
  # N->4N efficiency on this box RIGHT NOW. E/Eceil divides out the
  # one-box memory-system sharing a real multi-node cluster doesn't have
  # (each node brings its own DRAM) — measured at pair time, not quoted
  # from a different day.
  read -r BW_S BW_B <<< "$(python tools/bw_probe.py --widths "$N_SMALL,$N_BIG" --repeats 2 2>/dev/null \
    | python -c 'import json,sys; rows=[json.loads(l) for l in sys.stdin]; print(rows[0]["value"], rows[1]["value"])')" || true
  # A failed ceiling probe must not interpolate empty strings into the
  # ledger (malformed JSON breaks every downstream json.loads): validate
  # numerics, else record the pair with null ceiling fields.
  if python -c "float('${BW_S:-x}'); float('${BW_B:-x}')" 2>/dev/null; then
    ECEIL=$(python -c "print(round($BW_B / (($N_BIG / $N_SMALL) * $BW_S), 3))")
    ENORM=$(python -c "print(round($E / max($ECEIL, 1e-9), 3))")
  else
    echo "WARNING: ceiling bw_probe failed; recording pair with null ceiling fields"
    BW_S=null; BW_B=null; ECEIL=null; ENORM=null
  fi
  echo "{\"quiet_pair\": true, \"mode\": \"cluster\", \"n_small\": $N_SMALL, \"n_big\": $N_BIG, \"t_small\": $T_S, \"t_big\": $T_B, \"steal_small\": $S_S, \"steal_big\": $S_B, \"gate_triad_gbs\": ${GATE_BW:-null}, \"midpair_triad_gbs\": $MIDBW, \"scaling_efficiency\": $E, \"triad_gbs_small\": $BW_S, \"triad_gbs_big\": $BW_B, \"dram_ceiling_efficiency\": $ECEIL, \"ceiling_normalized_efficiency\": $ENORM}" >> "$LEDGER"
  echo "QUIET PAIR: T$N_SMALL=$T_S T$N_BIG=$T_B E=$E Eceil=$ECEIL Enorm=$ENORM"
  PAIRS_DONE=$((PAIRS_DONE + 1))
done
echo "done: $PAIRS_DONE quiet pair(s)"
