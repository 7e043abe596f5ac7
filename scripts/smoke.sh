#!/usr/bin/env bash
# Full-pipeline smoke test (counterpart of the reference's office_loop
# manual acceptance run, its README.md:132-143): generate a synthetic loop
# sequence, run the CLI end-to-end with the tiny model, and check that all
# artifacts exist. Runs on CPU or TPU; ~3-5 min on the TPU tunnel.
set -euo pipefail
WORK=${1:-/tmp/vggt_slam_smoke}
rm -rf "$WORK"
mkdir -p "$WORK"

python -m vggt_slam_tpu.tools.synth_sequence --out_dir "$WORK/images" \
  --n_frames 40

python -m vggt_slam_tpu.main \
  --image_folder "$WORK/images" --model_size tiny \
  --submap_size 4 --min_disparity 10 --max_loops 1 \
  --log_results --log_path "$WORK/poses.txt" --skip_dense_log \
  --save_path "$WORK/out"

test -s "$WORK/poses.txt" || { echo "FAIL: poses.txt missing"; exit 1; }
test -s "$WORK/out/result.pcd" || { echo "FAIL: result.pcd missing"; exit 1; }
ls "$WORK/out/frame_output/"*.npz >/dev/null || { echo "FAIL: frame_output empty"; exit 1; }
echo "SMOKE PASS: $(wc -l < "$WORK/poses.txt") poses, $(ls "$WORK/out/frame_output" | wc -l) frame outputs"
