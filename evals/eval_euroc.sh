#!/usr/bin/env bash
# EuRoC MAV sweep (counterpart of reference evals/eval_euroc.sh):
# 11 sequences on rectified cam0 (run tools/undistort euroc first).
set -euo pipefail
DATASET_ROOT=${1:?usage: eval_euroc.sh <dataset_root> [trials] [checkpoint]}
TRIALS=${2:-5}
CKPT=${3:-}
SEQS="MH_01_easy MH_02_easy MH_03_medium MH_04_difficult MH_05_difficult \
V1_01_easy V1_02_medium V1_03_difficult V2_01_easy V2_02_medium V2_03_difficult"
EXTRA=()
[ -n "$CKPT" ] && EXTRA+=(--checkpoint "$CKPT")
python -m vggt_slam_tpu.evals.run_eval \
  --dataset_root "$DATASET_ROOT" --sequences $SEQS --trials "$TRIALS" \
  --submap_size 16 --max_loops 1 --min_disparity 50 --conf_threshold 25 \
  --out euroc_results.csv "${EXTRA[@]}"
python -m vggt_slam_tpu.evals.process_logs euroc_results.csv
