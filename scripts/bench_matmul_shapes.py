"""Probe raw Pallas/XLA matmul rates for attention-like shapes on the TPU.

Answers: what does the MXU actually deliver for (M,K,N) shapes with small
contraction dims (K=64 attention heads) vs square shapes, and does XLA's
batched dot beat a per-problem Pallas grid? Drives the frame-attention
kernel design (scripts/bench_attention.py found the production kernel
matmul-bound at ~28 TF/s, not at the assumed ~98 TF/s D=64 ceiling).

Usage: python scripts/bench_matmul_shapes.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(fn, args, iters=20):
    @jax.jit
    def loop(*args):
        def body(i, acc):
            a0 = args[0] * (1.0 + 1e-6 * i.astype(args[0].dtype))
            o = fn(a0, *args[1:])
            return acc + o.reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        float(loop(*args))
        best = min(best, (time.time() - t0) / iters)
    return best


def pallas_batched_mm(B, M, K, N, dtype=jnp.bfloat16):
    """grid=(B,): one (M,K)@(K,N) per step."""
    def kernel(a_ref, b_ref, o_ref):
        o_ref[0] = jax.lax.dot_general(
            a_ref[0], b_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    def call(a, b):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, M, K), lambda i: (i, 0, 0)),
                      pl.BlockSpec((1, K, N), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, M, N), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, M, N), dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(a, b)

    return call


def pallas_grouped_mm(B, G, M, K, N, dtype=jnp.bfloat16):
    """grid=(B//G,): G matmuls per step (amortize anything per-step)."""
    def kernel(a_ref, b_ref, o_ref):
        for g in range(G):
            o_ref[0, g] = jax.lax.dot_general(
                a_ref[0, g], b_ref[0, g], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)

    def call(a, b):
        ar = a.reshape(B // G, G, M, K)
        br = b.reshape(B // G, G, K, N)
        out = pl.pallas_call(
            kernel,
            grid=(B // G,),
            in_specs=[pl.BlockSpec((1, G, M, K), lambda i: (i, 0, 0, 0)),
                      pl.BlockSpec((1, G, K, N), lambda i: (i, 0, 0, 0))],
            out_specs=pl.BlockSpec((1, G, M, N), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B // G, G, M, N), dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(ar, br)
        return out.reshape(B, M, N)

    return call


def xla_batched_mm(a, b):
    return jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(a.dtype)


def main():
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.normal(size=shape), jnp.bfloat16)

    print("== single big matmuls in pallas (1 grid step) ==")
    for (M, K, N) in [(1056, 64, 1056), (1024, 64, 1024), (1056, 128, 1056),
                      (1056, 256, 1056), (1056, 512, 1056), (1024, 1024, 1024),
                      (2048, 64, 2048), (4096, 64, 4096), (2048, 2048, 2048)]:
        a, b = mk((1, M, K)), mk((1, K, N))
        dt = bench(pallas_batched_mm(1, M, K, N), (a, b))
        fl = 2 * M * K * N
        print(f"  ({M:5d},{K:5d},{N:5d})  {dt*1e6:8.1f} us  {fl/dt/1e12:6.1f} TF/s")

    print("== batched B=528 attention-shape matmuls ==")
    B, M, K, N = 528, 1056, 64, 1056
    a, b = mk((B, M, K)), mk((B, K, N))
    fl = 2 * B * M * K * N
    dt = bench(pallas_batched_mm(B, M, K, N), (a, b))
    print(f"  pallas grid=(528,)       {dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TF/s")
    for G in (2, 4, 8, 16):
        dt = bench(pallas_grouped_mm(B, G, M, K, N), (a, b))
        print(f"  pallas grouped G={G:<2d}      {dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TF/s")
    dt = bench(xla_batched_mm, (a, b))
    print(f"  XLA batched dot          {dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TF/s")

    print("== PV-shape: (M,N)@(N,64) ==")
    B, M, K, N = 528, 1056, 1056, 64
    a, b = mk((B, M, K)), mk((B, K, N))
    fl = 2 * B * M * K * N
    dt = bench(pallas_batched_mm(B, M, K, N), (a, b))
    print(f"  pallas grid=(528,)       {dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TF/s")
    dt = bench(xla_batched_mm, (a, b))
    print(f"  XLA batched dot          {dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
