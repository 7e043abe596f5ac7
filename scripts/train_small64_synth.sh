#!/bin/bash
# Train the D=64-head small VGGT (VGGTConfig.small64) on synthetic scenes
# with automatic resume, mirroring train_small_synth.sh: the TPU tunnel
# occasionally drops a remote_compile response mid-run, so rerun from the
# last checkpoint until train_tiny exits cleanly. --seed makes independent
# retrains (the cross-retrain noise row of the merged-vs-exact A/B).
set -u
OUT=${1:-warmcache/small64_synth}
STEPS=${2:-3000}
SEED=${3:-0}
mkdir -p "$OUT"
for attempt in $(seq 1 40); do
  RESUME=""
  if [ -f "$OUT/last.npz" ]; then
    RESUME="--resume $OUT/last.npz"
  fi
  echo "=== attempt $attempt $(date -u +%H:%M:%S) resume=${RESUME:-none}" \
    >> "$OUT/train.out"
  python -m vggt_slam_tpu.tools.train_tiny --out "$OUT" --steps "$STEPS" \
    --frames 10 --model_size small64 --seed "$SEED" $RESUME \
    >> "$OUT/train.out" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "=== done rc=0" >> "$OUT/train.out"
    exit 0
  fi
  echo "=== attempt $attempt failed rc=$rc; retrying in 30s" \
    >> "$OUT/train.out"
  sleep 30
done
exit 1
