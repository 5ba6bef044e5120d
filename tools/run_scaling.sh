#!/usr/bin/env bash
# Two-cluster-size scaling evidence (BASELINE.md protocol):
# same job, same input, spark-submit --py-files, local[8] vs local[32].
# Usage: bash tools/run_scaling.sh [n_conv] [turns_per_conv]
set -euo pipefail
cd "$(dirname "$0")/.."

N_CONV="${1:-5000}"
TURNS="${2:-20}"
SCRATCH=.scratch/scaling_${N_CONV}x${TURNS}
RESULTS="$SCRATCH/results.jsonl"

mkdir -p dist "$SCRATCH"
rm -f "$RESULTS" dist/rust_gd_spark.zip
(cd . && zip -qr dist/rust_gd_spark.zip rust_gd_spark -x '*__pycache__*')

if [ ! -f "$SCRATCH/transcripts.parquet" ]; then
  python tools/gen_transcripts.py --n-conv "$N_CONV" --turns "$TURNS" --out "$SCRATCH"
fi

for CORES in 8 32; do
  echo "=== spark-submit local[$CORES] ==="
  spark-submit \
    --master "local[$CORES]" \
    --driver-memory 24g \
    --py-files dist/rust_gd_spark.zip \
    tools/scaling_bench.py \
    --data "$SCRATCH" --cores "$CORES" --out "$RESULTS" 2>/dev/null
done

python - "$RESULTS" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
by = {r["cores"]: r for r in rows}
t8, t32 = by[8]["value"], by[32]["value"]
eff = t32 / (4 * t8)
print(json.dumps({
    "throughput_8": t8, "throughput_32": t32,
    "scaling_efficiency_8_to_32": round(eff, 3),
    "pass": eff >= 0.8,
}))
EOF
