"""Minimal repro for the stride-16 TPU-worker fault (ARCHITECTURE.md §9).

Round-3 observation: the small-model (D=32, H=4 -> packed hp=4) eval
pipeline at global_kv_stride=16 reliably (3/3) crashed the axon TPU worker
into a 15-40 min restart loop at the first post-init readback, while the
identical pipeline at stride 8 and the flagship D=64 shapes run clean. The
merged K/V set at stride 16 is Nk = 1041 + 9*(5 + ceil(1036/16)) = 1671
tokens against Nq = 10*1041 = 10410 queries, which lands the ONE-SHOT
flash kernel (ops/attention.py, Nk fits one k-block) at
block_q=864 / block_k=1792 with a masked K edge (1671 < 1792) and a
masked Q edge (864 does not divide 10410).

This script isolates that call: ONE flash_attention invocation at exactly
the production geometry and feature set (packed layout, in-kernel rope +
qk-norm, per-key bias, static or online softmax), random data, looped
inside a single jit with input perturbation, followed by a scalar
readback. If the fault is in the Mosaic/axon lowering or runtime for this
tile geometry (the kernel passes interpret-mode parity at these shapes),
this program is the smallest thing that should reproduce it.

Usage (CAUTION - the default shape wedged the worker for 15-40 min per
run in round 3):

  python scripts/repro_stride16_fault.py                 # fatal family
  python scripts/repro_stride16_fault.py --nk 2256       # stride-8 control
  python scripts/repro_stride16_fault.py --heads 2 --d 64  # D=64 control
  python scripts/repro_stride16_fault.py --block_q 512   # geometry bisect

Each run prints the resolved tile geometry, then OK + checksum, or dies
with the worker. Exit code 0 = clean.
"""
from __future__ import annotations

import argparse
import math
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nq", type=int, default=10410)
    p.add_argument("--nk", type=int, default=1671)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--d", type=int, default=32)
    p.add_argument("--block_q", type=int, default=None,
                   help="override the auto-picked q block")
    p.add_argument("--block_k", type=int, default=None,
                   help="override the auto-picked k block")
    p.add_argument("--softmax", default="static", choices=["static", "online"])
    p.add_argument("--no_rope", action="store_true")
    p.add_argument("--no_ln", action="store_true")
    p.add_argument("--no_bias", action="store_true")
    p.add_argument("--no_mask", action="store_true",
                   help="pass valid_len=None (still a masked K edge if "
                        "nk % 128 != 0)")
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--interpret", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from vggt_slam_tpu.ops import attention as A
    from vggt_slam_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    H, D, Nq, Nk = args.heads, args.d, args.nq, args.nk

    # Mirror flash_attention's block auto-pick so the printed geometry is
    # what actually runs (ops/attention.py flash_attention).
    def roundup(x, m):
        return -(-x // m) * m
    bq, bk = 1024, 2048
    if roundup(Nk, 128) <= min(bk, 2304):
        bk = max(128, roundup(Nk, 128))
        bq_cap = max(256, (6 * 1024 * 1024) // (4 * bk) // 16 * 16)
        bq = min(roundup(Nq, 16), bq_cap, 2048)
        path = "one-shot"
    else:
        nk_b = -(-Nk // bk)
        bk = min(bk, max(256, roundup(-(-Nk // nk_b), 256)))
        if Nq < 4 * bq:
            bq = max(128, min(bq, 256))
        bq = min(bq, max(128, 1 << (Nq - 1).bit_length()))
        path = "multi-block"
    if args.block_q:
        bq = args.block_q
    if args.block_k:
        bk = args.block_k
    print(f"geometry: {path} block_q={bq} block_k={bk} Nq={Nq} Nk={Nk} "
          f"H={H} D={D} hp={min(128 // D, H)} softmax={args.softmax} "
          f"rope={not args.no_rope} ln={not args.no_ln} "
          f"bias={not args.no_bias}", flush=True)

    key = jax.random.PRNGKey(0)
    kq, kk, kv, kb = jax.random.split(key, 4)
    q = jax.random.normal(kq, (1, Nq, H * D), jnp.bfloat16)
    k = jax.random.normal(kk, (1, Nk, H * D), jnp.bfloat16)
    v = jax.random.normal(kv, (1, Nk, H * D), jnp.bfloat16)
    rope_q = rope_k = None
    if not args.no_rope:
        ang_q = jnp.arange(Nq)[:, None] * jnp.exp(
            -jnp.arange(D // 2) / (D // 2))[None, :]
        ang_k = jnp.arange(Nk)[:, None] * jnp.exp(
            -jnp.arange(D // 2) / (D // 2))[None, :]
        rope_q = (jnp.cos(ang_q), jnp.sin(ang_q))
        rope_k = (jnp.cos(ang_k), jnp.sin(ang_k))
    qk_ln = None
    if not args.no_ln:
        qk_ln = (jnp.ones((D,)), jnp.zeros((D,)),
                 jnp.ones((D,)), jnp.zeros((D,)))
    kv_bias = None
    if not args.no_bias:
        # sim-merge proportional-attention bias: log of merge-group sizes.
        sizes = jnp.maximum(jax.random.poisson(kb, 8.0, (Nk,)), 1)
        kv_bias = jnp.log(sizes.astype(jnp.float32))
    vl = None if args.no_mask else jnp.int32(Nk)

    def call(q, k, v):
        return A._flash_call(
            q, k, v, vl, bq, bk, args.interpret,
            rope_q=rope_q, rope_k=rope_k, layout="packed", kv_bias=kv_bias,
            softmax=args.softmax, qk_ln=qk_ln,
            qk_ln_eps=1e-5 if qk_ln is not None else None, num_heads=H)

    @jax.jit
    def loop(q, k, v):
        def body(i, carry):
            q, acc = carry
            out = call(q, k, v)
            # Perturb q from the output so XLA cannot hoist the call.
            return (q + 1e-3 * out.astype(q.dtype),
                    acc + jnp.sum(out.astype(jnp.float32)))
        _, acc = jax.lax.fori_loop(0, args.iters, body,
                                   (q, jnp.float32(0)))
        return acc

    t0 = time.time()
    print("compiling + first readback (the round-3 fault hit HERE)...",
          flush=True)
    acc = float(loop(q, k, v))
    dt = time.time() - t0
    assert math.isfinite(acc), f"non-finite checksum {acc}"
    print(f"OK checksum={acc:.6g} wall={dt:.1f}s "
          f"({args.iters} iters)", flush=True)


if __name__ == "__main__":
    main()
