"""Microbenchmark harness for the frame-attention Pallas kernel.

Frame attention (and the DINOv2 encoder attention, same shape) is 528
independent (frame, head) problems of ~1041 tokens at D=64 — the one kernel
in the forward far from its roofline (ARCHITECTURE.md "Measured budget").
This script measures the production kernel against diagnostic kernels
(matmul-only / softmax-only to locate the bottleneck) and grouped variants
that process G problems per grid step so the VPU softmax of one problem can
overlap the MXU matmul of the next.

Methodology (ARCHITECTURE.md section 8): the op loops inside ONE jit with a
per-iteration input perturbation (else XLA hoists it via LICM), and timing
forces a single scalar host readback (axon's block_until_ready returns
early through the tunnel).

Usage:  python scripts/bench_attention.py [--iters 20] [--heads 16]
"""
from __future__ import annotations

import argparse
import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vggt_slam_tpu.ops.attention import flash_attention, naive_attention

_NEG_INF = -1e30


def roundup(x, m):
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Diagnostic + variant kernels
# ---------------------------------------------------------------------------


def _matmul_only_kernel(q_ref, k_ref, v_ref, o_ref):
    """Both attention matmuls, NO softmax: the MXU floor for this shape."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = jax.lax.dot_general(s.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _softmax_only_kernel(q_ref, k_ref, v_ref, o_ref):
    """Softmax over a broadcast 'logits' block, no matmuls: the VPU floor."""
    q = q_ref[0]
    nk = k_ref.shape[1]
    s = (q[:, :1] * jnp.float32(0.01)).astype(jnp.float32)
    s = jnp.broadcast_to(s, (q.shape[0], nk))
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = p[:, :q.shape[1]] / jnp.maximum(l, 1e-30)
    o_ref[0] = o.astype(o_ref.dtype)


def _grouped_kernel(q_ref, k_ref, v_ref, o_ref, *, G, interleave):
    """G problems per grid step.

    interleave=False: straight loop (amortizes per-step overhead only).
    interleave=True:  all G QK^T matmuls issued first, then the G
                      softmax+PV chains — gives Mosaic independent MXU work
                      to overlap with each problem's VPU softmax.
    """
    def qk(g):
        return jax.lax.dot_general(q_ref[0, g], k_ref[0, g],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def finish(g, s):
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, g],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, g] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    if interleave:
        ss = [qk(g) for g in range(G)]
        for g in range(G):
            finish(g, ss[g])
    else:
        for g in range(G):
            finish(g, qk(g))


def _pipelined_kernel(q_ref, k_ref, v_ref, o_ref, *, G):
    """Software-pipelined: QK^T of problem g+1 issued before softmax+PV of
    problem g, one step of lookahead (s live set = 2 problems)."""
    def qk(g):
        return jax.lax.dot_general(q_ref[0, g], k_ref[0, g],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def finish(g, s):
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, g],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, g] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    s_prev = qk(0)
    for g in range(1, G):
        s_next = qk(g)
        finish(g - 1, s_prev)
        s_prev = s_next
    finish(G - 1, s_prev)


def make_grouped_call(kernel, G, N, D, BH, extra=()):
    Np = roundup(N, 128)

    def call(q, k, v):
        qf = q.reshape(BH, N, D)
        kf = k.reshape(BH, N, D)
        vf = v.reshape(BH, N, D)
        pad = Np - N
        if pad:
            qf = jnp.pad(qf, ((0, 0), (0, pad), (0, 0)))
            kf = jnp.pad(kf, ((0, 0), (0, pad), (0, 0)))
            vf = jnp.pad(vf, ((0, 0), (0, pad), (0, 0)))
        qf = qf.reshape(BH // G, G, Np, D)
        kf = kf.reshape(BH // G, G, Np, D)
        vf = vf.reshape(BH // G, G, Np, D)
        spec = pl.BlockSpec((1, G, Np, D), lambda b: (b, 0, 0, 0))
        out = pl.pallas_call(
            functools.partial(kernel, **dict(extra)),
            grid=(BH // G,),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(qf, kf, vf)
        return out.reshape(BH, Np, D)[:, :N].reshape(q.shape)

    return call


def make_flat_call(kernel, N, D, BH, extra=()):
    """grid=(BH,), one problem per step — mirrors the production layout."""
    Np = roundup(N, 128)

    def call(q, k, v):
        qf = q.reshape(BH, N, D)
        kf = k.reshape(BH, N, D)
        vf = v.reshape(BH, N, D)
        pad = Np - N
        if pad:
            qf = jnp.pad(qf, ((0, 0), (0, pad), (0, 0)))
            kf = jnp.pad(kf, ((0, 0), (0, pad), (0, 0)))
            vf = jnp.pad(vf, ((0, 0), (0, pad), (0, 0)))
        spec = pl.BlockSpec((1, Np, D), lambda b: (b, 0, 0))
        out = pl.pallas_call(
            functools.partial(kernel, **dict(extra)),
            grid=(BH,),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(qf, kf, vf)
        return out[:, :N].reshape(q.shape)

    return call


# ---------------------------------------------------------------------------
# Timing
# ---------------------------------------------------------------------------


def bench(fn, q, k, v, iters):
    @jax.jit
    def loop(q, k, v):
        def body(i, acc):
            qi = q * (1.0 + 1e-6 * i.astype(q.dtype))
            o = fn(qi, k, v)
            return acc + o[0].reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(q, k, v))          # compile + warm (readback forces sync)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        float(loop(q, k, v))
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--frames", type=int, default=33)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--tokens", type=int, default=1041)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--check", action="store_true",
                    help="verify variants against naive attention first")
    args = ap.parse_args()

    S, H, N, D = args.frames, args.heads, args.tokens, args.dim
    BH = S * H
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(S, H, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(S, H, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(S, H, N, D)), jnp.bfloat16)
    flops = 4 * BH * roundup(N, 128) ** 2 * D

    c_scale = math.log2(math.e) / math.sqrt(D)

    def scaled(fn):
        return lambda q, k, v: fn(
            (q.astype(jnp.float32) * c_scale).astype(q.dtype), k, v)

    variants = {
        "production flash_attention": lambda q, k, v: flash_attention(q, k, v),
        "matmul-only floor": make_flat_call(_matmul_only_kernel, N, D, BH),
        "softmax-only floor": make_flat_call(_softmax_only_kernel, N, D, BH),
    }
    for G in (2, 4, 8):
        variants[f"grouped G={G}"] = scaled(make_grouped_call(
            _grouped_kernel, G, N, D, BH, extra=(("G", G), ("interleave", False))))
        variants[f"interleaved G={G}"] = scaled(make_grouped_call(
            _grouped_kernel, G, N, D, BH, extra=(("G", G), ("interleave", True))))
        variants[f"pipelined G={G}"] = scaled(make_grouped_call(
            _pipelined_kernel, G, N, D, BH, extra=(("G", G),)))

    if args.check:
        ref = naive_attention(q[:1, :2].astype(jnp.float32),
                              k[:1, :2].astype(jnp.float32),
                              v[:1, :2].astype(jnp.float32))
        for name, fn in variants.items():
            if "floor" in name:
                continue
            out = fn(q, k, v)[:1, :2].astype(jnp.float32)
            err = float(jnp.max(jnp.abs(out - ref)))
            print(f"  check {name}: max|err|={err:.4f}")
            assert err < 0.05, name

    print(f"shape: BH={BH} N={N} D={D}; {flops/1e9:.1f} GFLOP/call")
    for name, fn in variants.items():
        try:
            dt = bench(fn, q, k, v, args.iters)
            print(f"{name:32s} {dt*1e3:7.2f} ms   {flops/dt/1e12:6.1f} TF/s")
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
