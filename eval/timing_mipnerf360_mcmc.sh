#!/bin/bash
# Wall-clock protocol (mirrors reference eval/timing_mipnerf360_mcmc.sh):
# per-scene whole-run seconds with date +%s wrappers, MCMC strategy.
set -e
DATA_DIR="${1:?usage: timing_mipnerf360_mcmc.sh <mipnerf360_dir> [out_dir]}"
OUT_DIR="${2:-timing_out}"
STRATEGY=mcmc exec bash "$(dirname "$0")/benchmark_mipnerf360.sh" "$DATA_DIR" "$OUT_DIR"
