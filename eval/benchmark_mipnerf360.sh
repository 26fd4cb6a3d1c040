#!/bin/bash
# MipNeRF360 benchmark protocol (mirrors reference eval/benchmark_mipnerf360.sh):
# 7 scenes, 30k iterations, --eval --test-every 8, indoor scenes at factor 2,
# outdoor at factor 4; collects per-scene metrics.csv into a summary table.
set -e
DATA_DIR="${1:?usage: benchmark_mipnerf360.sh <mipnerf360_dir> [out_dir]}"
OUT_DIR="${2:-benchmark_out}"
STRATEGY="${STRATEGY:-mcmc}"

OUTDOOR="garden bicycle stump"
INDOOR="bonsai counter kitchen room"

run_scene() {
  scene=$1; factor=$2
  echo "=== $scene (factor $factor, $STRATEGY) ==="
  start=$(date +%s)
  python -m lichtfeld_studio_tpu \
    -d "$DATA_DIR/$scene" -o "$OUT_DIR/$scene" \
    --headless --eval --test-every 8 -r "$factor" \
    --strategy "$STRATEGY"
  end=$(date +%s)
  echo "$scene,$((end-start))" >> "$OUT_DIR/timing.csv"
}

mkdir -p "$OUT_DIR"
echo "scene,seconds" > "$OUT_DIR/timing.csv"
for s in $OUTDOOR; do run_scene "$s" 4; done
for s in $INDOOR; do run_scene "$s" 2; done

python eval/summarize.py "$OUT_DIR"
