"""Stride-16 fault bisect, stage 3: the sim-merge GLUE alone.

Stage-1 (repro_stride16_fault.py): isolated flash kernel at the fatal
geometry (with kv_bias/rope/qk-norm) — CLEAN.
Stage-2 (repro_stride16_forward.py): small-model forward, merge="stride"
— CLEAN (same kernel shapes, no similarity glue); merge="sim" — CRASHES
the TPU worker. The fault therefore lives in the sim-merge glue (the
ToMe assignment + merge-matrix contraction, aggregator.py
_compute_assignment/_kv_map) at the small-model stride-16 shapes, or in
its fusion context.

This stage isolates exactly those ops OUTSIDE the model: the cosine
argmax, one-hot merge-matrix build (eye + scatter), and the per-block
einsum contraction at the production shapes (S=10, P=1036, Pd=65,
C=128), looped in one jit with input perturbation and read back. If THIS
crashes the worker, it is a minimal XLA-only (no Pallas) repro for the
runtime owners; if it stays clean, the fault needs the surrounding
forward's fusion context and the fence in aggregator.py
(_check_fatal_merge_family) remains the mitigation.

CAUTION: may wedge the axon TPU worker for 15-40 min (set
VGGT_ALLOW_FATAL_MERGE=1 posture: run deliberately, not in CI).
"""
from __future__ import annotations

import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--S", type=int, default=10)
    p.add_argument("--P", type=int, default=1036)
    p.add_argument("--C", type=int, default=128)
    p.add_argument("--stride", type=int, default=16)
    p.add_argument("--ns", type=int, default=5)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--blocks", type=int, default=24,
                   help="kv_map einsum applications per iter (the model "
                        "runs one per global block)")
    args = p.parse_args()

    import numpy as onp

    import jax
    import jax.numpy as jnp

    from vggt_slam_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    S, P, C, ns, r = args.S, args.P, args.C, args.ns, args.stride
    N = ns + P
    dst_patch = onp.arange(0, P, r)
    src_patch = onp.setdiff1d(onp.arange(P), dst_patch)
    Pd = len(dst_patch)
    dst_idx = jnp.asarray(ns + dst_patch, jnp.int32)
    src_idx = jnp.asarray(ns + src_patch, jnp.int32)
    print(f"S={S} P={P} C={C} stride={r} Pd={Pd} Ps={len(src_patch)}",
          flush=True)

    def assignment(x):
        xf = x[1:].astype(jnp.float32)
        dst = xf[:, dst_idx]
        src = xf[:, src_idx]
        dn = dst / (jnp.linalg.norm(dst, axis=-1, keepdims=True) + 1e-6)
        sn = src / (jnp.linalg.norm(src, axis=-1, keepdims=True) + 1e-6)
        sim = jnp.einsum("fsc,fdc->fsd", sn, dn)
        a = jnp.argmax(sim, axis=-1)
        A_t = (a[:, None, :] == jnp.arange(Pd, dtype=a.dtype)[None, :, None]
               ).astype(jnp.float32)
        cnt = jnp.sum(A_t, axis=2) + 1.0
        M = jnp.zeros((S - 1, Pd, P), jnp.float32)
        M = M.at[:, :, dst_patch].set(jnp.eye(Pd, dtype=jnp.float32))
        M = M.at[:, :, src_patch].set(A_t)
        M = (M * (1.0 / cnt)[..., None]).astype(jnp.bfloat16)
        bias = jnp.concatenate([jnp.zeros((N,), jnp.float32),
                                jnp.concatenate([jnp.zeros((S - 1, ns)),
                                                 jnp.log(cnt)],
                                                axis=1).reshape(-1)])
        return M, bias

    def kv_map(x, M):
        patches = x[1:, ns:]
        merged = jnp.einsum("fdp,fpc->fdc", M.astype(x.dtype), patches)
        rest = jnp.concatenate([x[1:, :ns], merged], axis=1)
        return jnp.concatenate([x[0], rest.reshape((S - 1) * (ns + Pd),
                                                   x.shape[-1])])

    @jax.jit
    def loop(x):
        def body(i, carry):
            x, acc = carry
            M, bias = assignment(x)
            kv = x
            for _ in range(args.blocks):
                kv_set = kv_map(x, M)
                acc = acc + jnp.sum(kv_set.astype(jnp.float32)) \
                    + jnp.sum(bias)
            x = x + 1e-3 * acc.astype(x.dtype)
            return x, acc
        _, acc = jax.lax.fori_loop(0, args.iters, body,
                                   (x, jnp.float32(0)))
        return acc

    x = jax.random.normal(jax.random.PRNGKey(0), (S, N, C), jnp.bfloat16)
    t0 = time.time()
    print("compiling + first readback...", flush=True)
    acc = float(loop(x))
    print(f"OK checksum={acc:.6g} wall={time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
