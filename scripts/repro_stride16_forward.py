"""Stride-16 fault bisect, stage 2: the MODEL FORWARD alone.

Round-4 stage-1 result (scripts/repro_stride16_fault.py): the isolated
flash kernel at the exact fatal one-shot geometry (block_q=864/
block_k=1792, Nq=10410, Nk=1671, D=32, hp=4, rope+qk-norm+bias, 4 jit
iters) runs CLEAN on the same runtime where the full small-model
stride-16 eval pipeline still crashes the TPU worker (3/3 in r3, 1/1 in
r4). The fatal trigger is therefore NOT the Pallas tile geometry — it is
something else in the stride-16 program.

This script bisects the next level: the bare VGGT-small forward (no SLAM
harness, no checkpoint, random init) at global_kv_stride=16, run twice in
sequence within ONE process:

  1. global_merge="stride"  (plain subsampling — no ToMe similarity
     assignment, no merge-matrix matmuls, no kv_bias), then
  2. global_merge="sim"     (the production merge path).

If (1) survives and the process dies at (2), the fault lives in the
sim-merge glue (assignment computation / merge-matrix contraction /
kv_bias plumbing) at the stride-16 shapes. If (1) already crashes, the
fault is in the merged-attention program independent of the merge
formulation. Either way one wedge buys two data points.

CAUTION: expect this to crash the axon TPU worker into its 15-40 min
restart loop at whichever stage reproduces the fault.
"""
from __future__ import annotations

import time


def run_one(merge: str, softmax: str):
    import jax
    import jax.numpy as jnp

    from vggt_slam_tpu.models.vggt.config import VGGTConfig
    from vggt_slam_tpu.models.vggt.model import VGGT, make_bucketed_model_fn

    cfg = VGGTConfig.small(attn_impl="flash", global_kv_stride=16,
                           global_merge=merge, global_softmax=softmax,
                           enable_point_head=False)
    model = VGGT(cfg)
    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 3, 392, 518)))
    jax.block_until_ready(params)
    print(f"[{merge}/{softmax}] init {time.time()-t0:.1f}s", flush=True)
    fn = make_bucketed_model_fn(model, params, bucket_size=10)
    import numpy as np
    imgs = np.random.default_rng(0).uniform(
        size=(10, 3, 392, 518)).astype(np.float32)
    t0 = time.time()
    out = fn(imgs)
    s = float(np.sum(out["pose_enc"])) + float(np.sum(out["depth"][:2]))
    print(f"[{merge}/{softmax}] forward OK checksum={s:.5g} "
          f"wall={time.time()-t0:.1f}s", flush=True)


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--softmax", default="online",
                   choices=["online", "static"],
                   help="r3's first crash was the online config")
    p.add_argument("--stages", nargs="+", default=["stride", "sim"])
    args = p.parse_args()
    from vggt_slam_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    for merge in args.stages:
        run_one(merge, args.softmax)
    print("ALL STAGES CLEAN", flush=True)


if __name__ == "__main__":
    main()
