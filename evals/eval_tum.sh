#!/usr/bin/env bash
# TUM RGB-D freiburg1 sweep (counterpart of reference evals/eval_tum.sh):
# 9 sequences x TRIALS runs at submap sizes 16 and 32, Sim3-aligned ATE RMSE
# via the in-repo evo_ape equivalent, CSV-logged.
set -euo pipefail
DATASET_ROOT=${1:?usage: eval_tum.sh <dataset_root> [trials] [checkpoint]}
TRIALS=${2:-5}
CKPT=${3:-}
SEQS="rgbd_dataset_freiburg1_360 rgbd_dataset_freiburg1_desk \
rgbd_dataset_freiburg1_desk2 rgbd_dataset_freiburg1_floor \
rgbd_dataset_freiburg1_plant rgbd_dataset_freiburg1_room \
rgbd_dataset_freiburg1_rpy rgbd_dataset_freiburg1_teddy \
rgbd_dataset_freiburg1_xyz"
EXTRA=()
[ -n "$CKPT" ] && EXTRA+=(--checkpoint "$CKPT")
for SUBMAP in 16 32; do
  python -m vggt_slam_tpu.evals.run_eval \
    --dataset_root "$DATASET_ROOT" --sequences $SEQS --trials "$TRIALS" \
    --submap_size "$SUBMAP" --max_loops 1 --min_disparity 50 \
    --conf_threshold 25 --out "tum_results_submap${SUBMAP}.csv" "${EXTRA[@]}"
  python -m vggt_slam_tpu.evals.process_logs "tum_results_submap${SUBMAP}.csv"
done
