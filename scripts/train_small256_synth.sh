#!/bin/bash
# Train the agg_dim-256 / D=64-head small VGGT (VGGTConfig.small256) on
# synthetic scenes with automatic resume (same hardening as
# train_small64_synth.sh: liveness-gated attempts, timeout backstop,
# frequent checkpoints). small256 exists to A/B the SHIPPED composite
# operating point (flash + sim-merge stride 8 + static-max) end-to-end at
# the flagship head-dim: width 256 is outside the worker-fatal sim-merge
# family (probed clean at stride 8 AND 16, evals/results/fence_probe.csv),
# unlike the fenced small64 width.
# --scale_weight 1.0 adds the r5 metric-scale consistency term so the
# checkpoint's eval trajectories land at ate_scale ~= 1 (VERDICT r4 #8).
set -u
OUT=${1:-warmcache/small256_synth}
STEPS=${2:-2400}
SEED=${3:-0}
ATTEMPT_TIMEOUT=${ATTEMPT_TIMEOUT:-10800}
# chunked XLA backward: flash_grad is measured worker-fatal at width 128
# under sustained training and unprobed at 256 — not worth gambling the
# round's longest job on (ARCHITECTURE section 9).
ATTN_IMPL=${ATTN_IMPL:-chunked}
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
    --frames 10 --model_size small256 --seed "$SEED" --ckpt_every 150 \
    --scale_weight 1.0 --attn_impl "$ATTN_IMPL" \
    $RESUME >> "$OUT/train.out" 2>&1
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
