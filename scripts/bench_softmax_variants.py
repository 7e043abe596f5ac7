"""Microbenchmark: flash-softmax variants at the exact global shape.

Measures, at the production global-attention shape (16 heads, Nq = Nk =
S*1041, D = 64, bf16 operands):

  * "online"      - classic running-max online softmax (the pre-r2 kernel);
  * "static"      - static-max: p = exp2(s - M) with a precomputed bound
                    (production default since r2, ARCHITECTURE section 8a);
  * "staticfused" - static-max AND the row-sum l folded into the AV matmul
                    by widening v to 128 lanes with a ones column: the MXU
                    already pads D=64 tiles to 128 lanes, so IF the matmul
                    cost is lane-padded this removes the jnp.sum VPU pass
                    for free; if the cost scales with logical width it
                    doubles AV time. This script decides.
  * "matmul"      - both matmuls, no softmax: the tiling's MXU floor.

Methodology (ARCHITECTURE.md section 10): loop inside ONE jit with a
per-iteration perturbation; timing forces one scalar host readback.

Usage: python scripts/bench_softmax_variants.py [--iters 8] [--n 34353]
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def roundup(x, m):
    return -(-x // m) * m


def _kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
            num_k_blocks, mode, smax):
    j = pl.program_id(2)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    block_k, D = v.shape

    @pl.when(j == 0)
    def _init():
        if mode == "online":
            m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        if mode in ("online", "static"):
            l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32 if mode == "staticint8"
        else jnp.float32)

    if mode == "matmul":
        acc_ref[:, :D] += jax.lax.dot_general(
            s.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    elif mode == "online":
        m_prev = m_ref[...]
        m_cur = jnp.max(s, axis=1)[:, None]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)
        l_ref[...] = alpha * l_ref[...] + jnp.sum(p, axis=1)[:, None]
        m_ref[...] = m_new
        acc_ref[:, :D] = acc_ref[:, :D] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    elif mode == "static":
        p = jnp.exp2(s - smax)
        l_ref[...] += jnp.sum(p, axis=1)[:, None]
        acc_ref[:, :D] += jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    elif mode == "staticfused":
        p = jnp.exp2(s - smax)
        vaug = jnp.concatenate(
            [v, jnp.ones((block_k, 128 - D), v.dtype)], axis=1)
        acc_ref[...] += jax.lax.dot_general(
            p.astype(v.dtype), vaug, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    elif mode == "staticint8":
        # q/k int8 (quantized outside), int32 MXU at 2x rate; dequant scale
        # folds into the exp2 argument (one fma per logit on the VPU).
        p = jnp.exp2(s.astype(jnp.float32) * smax[1] - smax[0])
        l_ref[...] += jnp.sum(p, axis=1)[:, None]
        acc_ref[:, :D] += jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(j == num_k_blocks - 1)
    def _done():
        if mode == "matmul":
            o_ref[...] = acc_ref[:, :D].astype(o_ref.dtype)[None]
        elif mode == "staticfused":
            o_ref[...] = (acc_ref[:, :D] /
                          jnp.maximum(acc_ref[:, D:D + 1], 1e-30)
                          ).astype(o_ref.dtype)[None]
        else:
            o_ref[...] = (acc_ref[:, :D] /
                          jnp.maximum(l_ref[...], 1e-30)
                          ).astype(o_ref.dtype)[None]


def run_kernel(q, k, v, block_q, block_k, mode, smax=12.0):
    BH, N, D = q.shape
    grid = (BH, N // block_q, N // block_k)
    kernel = functools.partial(_kernel, num_k_blocks=grid[2], mode=mode,
                               smax=smax)
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
            pltpu.VMEM((block_q, 128), jnp.float32),  # acc (+l lane for fused)
            pltpu.VMEM((block_q, 1), jnp.float32),    # m
            pltpu.VMEM((block_q, 1), jnp.float32),    # l
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v)


def timed(fn, args, iters, flops):
    @jax.jit
    def loop(args):
        def body(i, carry):
            out_sum, args = carry
            bumped = (args[0] + i.astype(args[0].dtype) * 1e-6, *args[1:])
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
    ap.add_argument("--block_q", type=int, default=1024)
    ap.add_argument("--block_k", type=int, default=2048)
    args = ap.parse_args()

    BH, D = args.heads, 64
    N = roundup(args.n, max(args.block_q, args.block_k))
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(BH, N, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(BH, N, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(BH, N, D)), jnp.bfloat16)
    flops = 4.0 * BH * N * N * D

    print(f"shape: BH={BH} N={N} D={D}  bq={args.block_q} bk={args.block_k}"
          f"  {flops/1e12:.2f} TFLOP/call")
    base = {}
    for mode in ("matmul", "online", "static", "staticfused"):
        fn = functools.partial(run_kernel, block_q=args.block_q,
                               block_k=args.block_k, mode=mode)
        dt, tfs, _ = timed(fn, (q, k, v), args.iters, flops)
        base[mode] = dt
        rel = "" if mode == "matmul" else \
            f"  ({base['matmul']/dt*100:.0f}% of matmul floor)"
        print(f"{mode:12s}: {dt*1e3:8.2f} ms  {tfs:6.1f} TF/s{rel}")

    # int8 QK^T + static max: quantize q/k outside (per-tensor here; the
    # production kernel does per-(b,h) in-kernel), dequant folded into the
    # exp2 fma. Now that static-max makes the kernel MXU-bound, the int8
    # 2x QK rate may finally show through end-to-end.
    qs = float(jnp.max(jnp.abs(q.astype(jnp.float32))))
    ks = float(jnp.max(jnp.abs(k.astype(jnp.float32))))
    qi = jnp.clip(jnp.round(q.astype(jnp.float32) * (127.0 / qs)),
                  -127, 127).astype(jnp.int8)
    ki = jnp.clip(jnp.round(k.astype(jnp.float32) * (127.0 / ks)),
                  -127, 127).astype(jnp.int8)
    dequant = (qs / 127.0) * (ks / 127.0)
    fn = functools.partial(run_kernel, block_q=args.block_q,
                           block_k=args.block_k, mode="staticint8",
                           smax=(12.0, dequant))

    @jax.jit
    def loop_i8(qi, ki, v):
        def body(i, carry):
            out_sum, (qi, ki, v) = carry
            out = fn(qi ^ (i % 2).astype(jnp.int8), ki, v)
            return out_sum + jnp.sum(out.astype(jnp.float32)), (qi, ki, v)
        out_sum, _ = jax.lax.fori_loop(0, args.iters, body, (0.0, (qi, ki, v)))
        return out_sum

    float(loop_i8(qi, ki, v))
    t0 = time.time()
    float(loop_i8(qi, ki, v))
    dt = (time.time() - t0) / args.iters
    print(f"{'staticint8':12s}: {dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TF/s"
          f"  ({base['matmul']/dt*100:.0f}% of bf16 matmul floor)")

    # numeric sanity: static vs online on the same inputs
    o_on = run_kernel(q, k, v, args.block_q, args.block_k, "online")
    o_st = run_kernel(q, k, v, args.block_q, args.block_k, "static")
    o_sf = run_kernel(q, k, v, args.block_q, args.block_k, "staticfused")
    d1 = float(jnp.max(jnp.abs(o_st.astype(jnp.float32) -
                               o_on.astype(jnp.float32))))
    d2 = float(jnp.max(jnp.abs(o_sf.astype(jnp.float32) -
                               o_on.astype(jnp.float32))))
    print(f"max |static-online| = {d1:.2e}   |staticfused-online| = {d2:.2e}")


if __name__ == "__main__":
    main()
