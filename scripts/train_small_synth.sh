#!/bin/bash
# Train the small synthetic-scene VGGT with automatic resume: the dev
# environment's TPU tunnel occasionally drops a remote_compile response
# mid-run (transient INTERNAL errors), so rerun from the last checkpoint
# until train_tiny exits cleanly. Total optimization length is bounded by
# --steps per attempt; the LR schedule restarts on resume (acceptable for
# this synthetic-convergence use).
set -u
OUT=${1:-warmcache/small_synth}
STEPS=${2:-6000}
mkdir -p "$OUT"
for attempt in $(seq 1 20); do
  RESUME=""
  if [ -f "$OUT/last.npz" ]; then
    RESUME="--resume $OUT/last.npz"
  fi
  echo "=== attempt $attempt $(date -u +%H:%M:%S) resume=${RESUME:-none}" \
    >> "$OUT/train_r3.out"
  python -m vggt_slam_tpu.tools.train_tiny --out "$OUT" --steps "$STEPS" \
    --frames 10 $RESUME >> "$OUT/train_r3.out" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "=== done rc=0" >> "$OUT/train_r3.out"
    exit 0
  fi
  echo "=== attempt $attempt failed rc=$rc; retrying in 20s" \
    >> "$OUT/train_r3.out"
  sleep 20
done
exit 1
