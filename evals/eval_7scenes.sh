#!/usr/bin/env bash
# 7-Scenes sweep (counterpart of reference evals/eval_7scenes.sh):
# trajectory ATE + dense chamfer-RMSE geometry metrics.
set -euo pipefail
DATASET_ROOT=${1:?usage: eval_7scenes.sh <dataset_root> [trials] [checkpoint]}
TRIALS=${2:-5}
CKPT=${3:-}
SEQS="chess fire heads office pumpkin redkitchen stairs"
EXTRA=()
[ -n "$CKPT" ] && EXTRA+=(--checkpoint "$CKPT")
python -m vggt_slam_tpu.evals.run_eval \
  --dataset_root "$DATASET_ROOT" --sequences $SEQS --trials "$TRIALS" \
  --submap_size 16 --max_loops 1 --min_disparity 50 --conf_threshold 25 \
  --out 7scenes_results.csv "${EXTRA[@]}"
python -m vggt_slam_tpu.evals.process_logs 7scenes_results.csv
