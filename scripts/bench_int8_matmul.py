"""Probe: do int8 linear layers pay at the transformer's matmul shapes?

The r3 trace puts the linear stack (qkv/proj/MLP over encoder + frame +
global blocks, ~59 TFLOP/submap) at ~273 ms ≈ the bf16 MXU roofline. The
only lever left there is the MXU's 2x int8 rate. This measures, at the
production MLP/qkv shapes:

  * bf16 x bf16 -> f32 dot (the current path),
  * int8 x int8 -> int32 dot with PRE-QUANTIZED operands (pure MXU rate),
  * dynamic per-token activation quant + int8 dot + dequant (the real
    serving path: weights quantize offline, activations per step).

Methodology per ARCHITECTURE "Axon/tunnel discipline": ops loop inside
one jit with per-iteration perturbation; scalar readback for timing.

Usage: python scripts/bench_int8_matmul.py [--iters 5]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as onp


def timed(fn, x, iters):
    r = jax.jit(fn)
    float(r(x))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(r(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--m", type=int, default=34353)
    p.add_argument("--k", type=int, default=1024)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--loops", type=int, default=8)
    args = p.parse_args()
    M, K, N, L = args.m, args.k, args.n, args.loops
    rng = onp.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    w8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    ws = jnp.asarray(rng.uniform(0.5, 1.5, (N,)), jnp.float32)  # per-channel
    x8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    flop = 2 * M * K * N * L

    def bf16(x):
        def body(c, _):
            y = jax.lax.dot_general((x + c).astype(jnp.bfloat16), w,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return jnp.mean(y).astype(x.dtype), ()
        c, _ = jax.lax.scan(body, jnp.asarray(0, x.dtype), jnp.arange(L))
        return c

    def i8_pre(x):
        def body(c, _):
            xi = (x8 + c.astype(jnp.int8))
            y = jax.lax.dot_general(xi, w8, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return jnp.sum(y[:1, :1]).astype(jnp.int32) % 127, ()
        c, _ = jax.lax.scan(body, jnp.asarray(0, jnp.int32), jnp.arange(L))
        return c

    def i8_dyn(x):
        def body(c, _):
            xp = (x + c).astype(jnp.float32)
            s = jnp.maximum(jnp.max(jnp.abs(xp), axis=1, keepdims=True),
                            1e-6)
            xi = jnp.clip(jnp.round(xp * (127.0 / s)), -127,
                          127).astype(jnp.int8)
            y = jax.lax.dot_general(xi, w8, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            yf = y.astype(jnp.float32) * (s / 127.0) * ws
            return jnp.mean(yf).astype(x.dtype), ()
        c, _ = jax.lax.scan(body, jnp.asarray(0, x.dtype), jnp.arange(L))
        return c

    for name, fn in [("bf16", bf16), ("int8_prequant", i8_pre),
                     ("int8_dynamic", i8_dyn)]:
        t = timed(fn, x, args.iters)
        print(f"{name:14s} {t * 1000:8.2f} ms  {flop / t / 1e12:7.1f} TF/s")


if __name__ == "__main__":
    main()
