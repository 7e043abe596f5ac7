#!/bin/bash
# Train the D=64-head small VGGT (VGGTConfig.small64) on synthetic scenes
# with automatic resume, mirroring train_small_synth.sh. Hardened for the
# axon worker's post-crash restart-loop behavior (r4: the worker cycles
# up/down for minutes after a kernel fault and a client that connects
# mid-restart hangs forever):
#   * each attempt is gated on a cheap device liveness probe (re-tried
#     until the chip answers), so attempts never start against a dead
#     worker;
#   * the training process runs under `timeout` as a hang backstop;
#   * --ckpt_every 150 bounds work lost to a mid-run crash.
# --seed makes independent retrains (the cross-retrain noise row of the
# merged-vs-exact A/B).
set -u
OUT=${1:-warmcache/small64_synth}
STEPS=${2:-3000}
SEED=${3:-0}
ATTEMPT_TIMEOUT=${ATTEMPT_TIMEOUT:-5400}
# ATTN_IMPL=chunked sidesteps the Pallas flash_grad backward kernels,
# which at small64 width crash the axon worker every ~200 steps (r4).
EXTRA_ARGS=${ATTN_IMPL:+--attn_impl $ATTN_IMPL}
mkdir -p "$OUT"
for attempt in $(seq 1 40); do
  for probe in $(seq 1 30); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((2,2)))))" >/dev/null 2>&1; then
      break
    fi
    echo "=== device probe $probe failed $(date -u +%H:%M:%S); wait 45s" \
      >> "$OUT/train.out"
    sleep 45
  done
  RESUME=""
  if [ -f "$OUT/last.npz" ]; then
    RESUME="--resume $OUT/last.npz"
  fi
  echo "=== attempt $attempt $(date -u +%H:%M:%S) resume=${RESUME:-none}" \
    >> "$OUT/train.out"
  timeout "$ATTEMPT_TIMEOUT" \
    python -m vggt_slam_tpu.tools.train_tiny --out "$OUT" --steps "$STEPS" \
    --frames 10 --model_size small64 --seed "$SEED" --ckpt_every 150 \
    $RESUME $EXTRA_ARGS >> "$OUT/train.out" 2>&1
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
