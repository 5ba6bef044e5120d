#!/usr/bin/env bash
# Two-cluster-size scaling evidence (BASELINE.md protocol):
# same job, same input, spark-submit --py-files, local[8] vs local[32].
# Usage: bash tools/run_scaling.sh [n_conv] [turns_per_conv]
set -euo pipefail
cd "$(dirname "$0")/.."

N_CONV="${1:-5000}"
TURNS="${2:-20}"
N_SMALL="${3:-4}"
N_BIG="${4:-16}"
GRAN="${5:-conv}"
SCRATCH=.scratch/scaling_${N_CONV}x${TURNS}
RESULTS="$SCRATCH/results.jsonl"

mkdir -p dist "$SCRATCH"
rm -f "$RESULTS" dist/rust_gd_spark.zip
(cd . && zip -qr dist/rust_gd_spark.zip rust_gd_spark -x '*__pycache__*')

if [ ! -f "$SCRATCH/transcripts.parquet" ]; then
  python tools/gen_transcripts.py --n-conv "$N_CONV" --turns "$TURNS" --out "$SCRATCH"
fi

for CORES in "$N_SMALL" "$N_BIG"; do
  echo "=== spark-submit local[$CORES] (pinned to $CORES cpus) ==="
  # taskset pins the WHOLE process tree (JVM + python UDF workers) to the
  # leg's core budget — in unpinned local mode the python workers of the
  # "8-core" leg silently borrow extra machine cores, inflating T_N and
  # understating the true N→4N efficiency.
  taskset -c "0-$((CORES - 1))" spark-submit \
    --master "local[$CORES]" \
    --driver-memory 24g \
    --py-files dist/rust_gd_spark.zip \
    tools/scaling_bench.py \
    --data "$SCRATCH" --cores "$CORES" --granularity "$GRAN" --out "$RESULTS" \
    ${SCALING_FLAGS:-} 2>/dev/null
done

python - "$RESULTS" "$N_SMALL" "$N_BIG" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
by = {r["cores"]: r for r in rows}
n, m = int(sys.argv[2]), int(sys.argv[3])
tn, tm = by[n]["value"], by[m]["value"]
eff = tn and tm / ((m / n) * tn)
print(json.dumps({
    f"throughput_{n}": tn, f"throughput_{m}": tm,
    f"scaling_efficiency_{n}_to_{m}": round(eff, 3),
    "pass": eff >= 0.8,
}))
EOF
