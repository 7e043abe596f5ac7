"""Feasibility + perf probe: IN-KERNEL int8 quantization for flash attention
at the exact global shape (BH=16, N~34353, D=64).

Production-shaped variants (online softmax, f32 stats), all fed bf16 q/k/v:

  * bf16      - baseline (quantize nothing);
  * qk8       - q tile quantized to int8 once per q-block into scratch,
                k blocks quantized once per (b,h) into a persistent scratch
                (the production rope-cache pattern), QK^T on the int8 MXU
                path (int32 accum), dequant folded into the softmax scale;
  * qk8av8    - qk8 plus AV on the int8 MXU path: p = exp2(s-m) in [0,1]
                quantized at scale 127, v quantized once per (b,h) into a
                second persistent scratch (per-(b,h) max-abs scale).

Accuracy: each variant vs an f32 reference on one (2048 q x full k) slab.

Usage: python scripts/bench_int8_inkernel.py [--iters 6]
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


def _quant(x, inv):
    return jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)


def _kernel(sc_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
            q8_ref, k8_ref, v8_ref, *, block_k, num_k_blocks, mode):
    b = pl.program_id(0)
    j = pl.program_id(2)
    qk8 = mode in ("qk8", "qk8av8")
    av8 = mode == "qk8av8"

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        if qk8:
            q8_ref[...] = _quant(q_ref[0].astype(jnp.float32), sc_ref[0, b])

    if qk8:
        @pl.when(pl.program_id(1) == 0)
        def _prep_k():
            k8_ref[pl.ds(j * block_k, block_k)] = _quant(
                k_ref[0].astype(jnp.float32), sc_ref[1, b])
            if av8:
                v8_ref[pl.ds(j * block_k, block_k)] = _quant(
                    v_ref[0].astype(jnp.float32), sc_ref[2, b])

    if qk8:
        s = jax.lax.dot_general(
            q8_ref[...], k8_ref[pl.ds(j * block_k, block_k)],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32) * sc_ref[3, b]
    else:
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sc_ref[3, b]

    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1)[:, None])
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new)
    l_ref[...] = alpha * l_ref[...] + jnp.sum(p, axis=1)[:, None]
    m_ref[...] = m_new
    if av8:
        p8 = jnp.clip(jnp.round(p * 127.0), 0, 127).astype(jnp.int8)
        pv = jax.lax.dot_general(
            p8, v8_ref[pl.ds(j * block_k, block_k)],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32) \
            * sc_ref[4, b]
        acc_ref[...] = acc_ref[...] * alpha + pv
    else:
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(j == num_k_blocks - 1)
    def _done():
        o_ref[...] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)[None]


def run(q, k, v, block_q, block_k, mode):
    BH, N, D = q.shape
    Nk = k.shape[1]
    grid = (BH, N // block_q, Nk // block_k)
    c = math.log2(math.e) / math.sqrt(D)
    qa = jnp.max(jnp.abs(q.astype(jnp.float32)), axis=(1, 2))  # (BH,)
    ka = jnp.max(jnp.abs(k.astype(jnp.float32)), axis=(1, 2))
    va = jnp.max(jnp.abs(v.astype(jnp.float32)), axis=(1, 2))
    if mode == "bf16":
        dq = jnp.full((BH,), c, jnp.float32)
    else:
        dq = qa * ka / (127.0 * 127.0) * c
    sc = jnp.stack([127.0 / qa, 127.0 / ka, 127.0 / va, dq,
                    va / (127.0 * 127.0)])  # (5, BH)

    kernel = functools.partial(_kernel, block_k=block_k,
                               num_k_blocks=grid[2], mode=mode)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
            pltpu.VMEM((block_q, D), jnp.int8),
            pltpu.VMEM((Nk, D), jnp.int8),
            pltpu.VMEM((Nk, D), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(sc, q, k, v)


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

    float(loop(args))
    t0 = time.time()
    float(loop(args))
    dt = (time.time() - t0) / iters
    return dt, flops / dt / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--n", type=int, default=34353)
    args = ap.parse_args()

    D = 64
    N = roundup(args.n, 2048)
    BH = 16
    print(f"shape: BH={BH} N={N} D={D}")
    flops = 4.0 * BH * N * N * D

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(BH, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(BH, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(BH, N, D)), jnp.bfloat16)

    # accuracy on a 2048-q slab vs f32 reference
    qs = q[:, :2048]
    c = 1.0 / math.sqrt(D)
    logits = np.einsum("bnd,bmd->bnm", np.asarray(qs, np.float32),
                       np.asarray(k, np.float32)) * c
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    ref = np.einsum("bnm,bmd->bnd", w, np.asarray(v, np.float32))
    for mode in ("bf16", "qk8", "qk8av8"):
        try:
            out = np.asarray(run(qs, k, v, 2048, 2048, mode), np.float32)
            err = np.abs(out - ref)
            print(f"{mode:7s} vs f32: max {err.max():.4f} "
                  f"mean {err.mean():.5f}")
        except Exception as e:
            print(f"{mode:7s} accuracy FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}")

    for mode in ("bf16", "qk8", "qk8av8"):
        for bq, bk in [(1024, 2048), (2048, 2048)]:
            try:
                fn = functools.partial(run, block_q=bq, block_k=bk, mode=mode)
                dt, tf = timed(fn, (q, k, v), args.iters, flops)
                print(f"{mode:7s} bq={bq:5d} bk={bk:5d}: {dt*1e3:7.2f} ms "
                      f"{tf:6.1f} TF/s")
            except Exception as e:
                print(f"{mode:7s} bq={bq:5d} bk={bk:5d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
