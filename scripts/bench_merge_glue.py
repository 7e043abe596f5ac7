"""Microbenchmark: per-block K/V merge glue at the flagship global shape.

The stride-4 similarity merge runs a kv_map closure inside every one of the
24 global blocks. This script times three formulations of that closure at
the production shape (S=33, N=1041, C=1024, r=4) to attribute the glue cost
above the flash kernel (VERDICT r2 item 2):

  * gather: the r2 formulation - dst/src index gathers + one-hot einsum +
    add/scale + concats;
  * matrix: the r3 formulation - contiguous slice + one batched matmul
    against a precomputed per-frame merge matrix M (S-1, Pd, P) + concats;
  * noop:   returns a precomputed kv set (loop/perturbation overhead floor).

Methodology (ARCHITECTURE.md section 10): 24 applications loop inside ONE
jit via lax.scan with a per-iteration input perturbation; timing forces a
scalar host readback.

Usage: python scripts/bench_merge_glue.py [--iters 5]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as onp


def build(S, ns, P, C, r, dtype):
    N = ns + P
    Pd = (P + r - 1) // r
    dst_patch = onp.arange(0, P, r)
    src_patch = onp.setdiff1d(onp.arange(P), dst_patch)
    Ps = len(src_patch)
    rng = onp.random.default_rng(0)
    a = rng.integers(0, Pd, size=(S - 1, Ps))
    A = onp.zeros((S - 1, Ps, Pd), onp.float32)
    A[onp.arange(S - 1)[:, None], onp.arange(Ps)[None, :], a] = 1.0
    cnt = A.sum(axis=1) + 1.0
    M = onp.zeros((S - 1, Pd, P), onp.float32)
    M[:, onp.arange(Pd), dst_patch] = 1.0
    M[:, :, src_patch] = A.transpose(0, 2, 1)
    M = M / cnt[..., None]

    dst_idx = jnp.asarray(ns + dst_patch, jnp.int32)
    src_idx = jnp.asarray(ns + src_patch, jnp.int32)
    Aj = jnp.asarray(A, dtype)
    inv_cnt = jnp.asarray(1.0 / cnt, dtype)
    Mj = jnp.asarray(M, dtype)

    def kv_gather(x_):
        dst = x_[1:, dst_idx]
        src = x_[1:, src_idx]
        agg = jnp.einsum("fsd,fsc->fdc", Aj.astype(x_.dtype), src)
        merged = (dst + agg) * inv_cnt[..., None]
        rest = jnp.concatenate([x_[1:, :ns], merged], axis=1)
        return jnp.concatenate(
            [x_[0], rest.reshape((S - 1) * (ns + Pd), C)])

    def kv_matrix(x_):
        patches = x_[1:, ns:]
        merged = jnp.einsum("fdp,fpc->fdc", Mj.astype(x_.dtype), patches)
        rest = jnp.concatenate([x_[1:, :ns], merged], axis=1)
        return jnp.concatenate(
            [x_[0], rest.reshape((S - 1) * (ns + Pd), C)])

    kv0 = jnp.zeros((N + (S - 1) * (ns + Pd), C), dtype)

    def kv_noop(x_):
        return kv0 + x_[0, 0, 0]

    return {"gather": kv_gather, "matrix": kv_matrix, "noop": kv_noop}, N


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--blocks", type=int, default=24)
    p.add_argument("--S", type=int, default=33)
    p.add_argument("--P", type=int, default=1036)
    p.add_argument("--C", type=int, default=1024)
    p.add_argument("--r", type=int, default=4)
    args = p.parse_args()
    ns = 5
    dtype = jnp.bfloat16
    fns, N = build(args.S, ns, args.P, args.C, args.r, dtype)
    x = jnp.asarray(
        onp.random.default_rng(1).standard_normal((args.S, N, args.C)),
        dtype)

    for name, fn in fns.items():
        @jax.jit
        def run(x, fn=fn):
            def body(carry, i):
                x_ = x + carry  # perturb: no hoisting
                kv = fn(x_)
                return jnp.mean(kv).astype(x.dtype), ()
            c, _ = jax.lax.scan(body, jnp.asarray(0, dtype),
                                jnp.arange(args.blocks))
            return c
        float(run(x))  # compile
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(run(x))  # scalar readback = device sync
            ts.append(time.perf_counter() - t0)
        best = min(ts) * 1000
        print(f"{name:8s} {best:8.2f} ms / {args.blocks} blocks "
              f"({best / args.blocks:6.3f} ms/block)")


if __name__ == "__main__":
    main()
