"""Microbenchmark: the GLOBAL-attention shape of the exact path.

Exact global attention at S=33 is 24 blocks x ~62 ms (trace r2): 16 heads,
Nq = Nk = S*1041 = 34353, D = 64 -> 4.8 TFLOP/block at ~78 TF/s. This
script searches for headroom at THIS shape (the round-1 int8 negative
result was measured at frame-attention shapes, K/N = 64-geometry bound;
VERDICT.md asks for a retest where N is large):

  * production-style bf16 online-softmax kernel at several (block_q,
    block_k) tilings;
  * a matmul-only variant (no softmax/accumulators) = the MXU ceiling of
    the tiling;
  * an int8 QK^T variant (per-head symmetric quantization outside the
    kernel, int32 MXU accumulation, dequant folded into the softmax
    scale) - AV stays bf16;
  * int8 accuracy vs the f32 reference.

Methodology (ARCHITECTURE.md section 10): the op loops inside ONE jit with
a per-iteration input perturbation, timing forces one scalar host
readback.

Usage: python scripts/bench_global_attention.py [--iters 8] [--n 34353]
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

_NEG_INF = -1e30


def roundup(x, m):
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# kernels


def _kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
            block_k, num_k_blocks, mode, scale):
    """One (q-block, k-block) online-softmax step.

    mode: "bf16" - dot(q, k) in bf16;
          "int8" - q/k are int8, dot accumulates int32, scale dequantizes;
          "matmul" - skip softmax: o += (q@k')@v (roofline probe).
    """
    j = pl.program_id(2)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    @pl.when(j == 0)
    def _init():
        if mode != "matmul":
            m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32 if mode == "int8" else jnp.float32)
    if mode == "int8":
        s = s.astype(jnp.float32) * scale
    else:
        s = s * scale

    if mode == "matmul":
        acc_ref[...] += jax.lax.dot_general(
            s.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        m_prev = m_ref[...]
        m_cur = jnp.max(s, axis=1)[:, None]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[...] = alpha * l_ref[...] + jnp.sum(p, axis=1)[:, None]
        m_ref[...] = m_new
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(j == num_k_blocks - 1)
    def _done():
        if mode == "matmul":
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)[None]
        else:
            o_ref[...] = (acc_ref[...] /
                          l_ref[...]).astype(o_ref.dtype)[None]


def run_kernel(q, k, v, block_q, block_k, mode, scale):
    BH, N, D = q.shape
    grid = (BH, N // block_q, N // block_k)
    kernel = functools.partial(_kernel, block_k=block_k,
                               num_k_blocks=grid[2], mode=mode, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, N, D), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v)


# ---------------------------------------------------------------------------
# timing harness


def timed(fn, args, iters, flops):
    """Loop fn inside one jit with per-iteration perturbation."""

    @jax.jit
    def loop(args):
        def body(i, carry):
            out_sum, args = carry
            a0 = args[0]
            if a0.dtype == jnp.int8:
                bumped = (a0 ^ i.astype(jnp.int8), *args[1:])
            else:
                bumped = (a0 + i.astype(a0.dtype) * 1e-6, *args[1:])
            out = fn(*bumped)
            return out_sum + jnp.sum(out.astype(jnp.float32)), args

        out_sum, _ = jax.lax.fori_loop(0, iters, body, (0.0, args))
        return out_sum

    float(loop(args))  # compile + warm
    t0 = time.time()
    s = float(loop(args))
    dt = (time.time() - t0) / iters
    return dt, flops / dt / 1e12, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--n", type=int, default=34353)
    ap.add_argument("--heads", type=int, default=16)
    args = ap.parse_args()

    D = 64
    N = roundup(args.n, 2048)
    BH = args.heads
    print(f"shape: BH={BH} N={N} D={D} "
          f"(padded from {args.n})")
    flops = 4.0 * BH * N * N * D  # two matmuls

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(BH, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(BH, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(BH, N, D)), jnp.bfloat16)
    scale = 1.0 / math.sqrt(D)

    # int8 quantization (per-tensor symmetric; production would use
    # per-head max via a cheap pre-pass)
    qa = np.abs(np.asarray(q, np.float32)).max()
    ka = np.abs(np.asarray(k, np.float32)).max()
    q8 = jnp.asarray(np.clip(np.rint(np.asarray(q, np.float32) / qa * 127),
                             -127, 127), jnp.int8)
    k8 = jnp.asarray(np.clip(np.rint(np.asarray(k, np.float32) / ka * 127),
                             -127, 127), jnp.int8)
    int8_scale = float(qa * ka / (127 * 127) * scale)

    # accuracy of int8 QK^T on a small slab
    ref = None
    for mode, (qq, kk, sc) in {
        "bf16": (q, k, scale), "int8": (q8, k8, int8_scale)}.items():
        out = run_kernel(qq[:, :2048], kk[:, :4096], v[:, :4096],
                         2048, 2048, mode, sc)
        if ref is None:
            ref = np.asarray(out, np.float32)
        else:
            err = np.abs(np.asarray(out, np.float32) - ref)
            print(f"int8 vs bf16 (2048x4096 slab): max {err.max():.4f} "
                  f"mean {err.mean():.5f}")

    configs = [(1024, 2048), (2048, 2048), (1024, 4096), (2048, 4096),
               (512, 2048)]
    for mode in ("matmul", "bf16", "int8"):
        for bq, bk in configs:
            if mode == "int8":
                a = (q8, k8, v)
                sc = int8_scale
            else:
                a = (q, k, v)
                sc = scale
            try:
                fn = functools.partial(run_kernel, block_q=bq, block_k=bk,
                                       mode=mode, scale=sc)
                dt, tf, _ = timed(fn, a, args.iters, flops)
                print(f"{mode:6s} bq={bq:5d} bk={bk:5d}: "
                      f"{dt*1e3:7.2f} ms  {tf:6.1f} TF/s")
            except Exception as e:  # Mosaic rejections etc.
                print(f"{mode:6s} bq={bq:5d} bk={bk:5d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
