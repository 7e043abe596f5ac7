"""Multi-head attention for the VGGT alternating-attention trunk.

The global-attention blocks attend over all frames x all patches
(S*~1387 tokens, ~23k-46k at submap size 16/32 - SURVEY.md section 5.7): the
naive (N,N) logits matrix would need gigabytes, so the TPU hot path is a
Pallas flash-attention kernel (online softmax, f32 accumulators, bf16
operands on the MXU). Three interchangeable implementations:

* "flash":   Pallas TPU kernel (forward only; inference hot path).
* "flash_grad": flash forward + Pallas backward kernels via jax.custom_vjp
             (exact attention; the TPU training path).
* "chunked": XLA lax.map over query chunks - O(chunk*N) memory, fully
             differentiable; the CPU training fallback.
* "naive":   materializes logits; reference implementation for tests.

All take (B, H, N, D) tensors. `valid_len` masks padded keys so bucketed
submap shapes (16+1+loops padded to a fixed slot count) don't pollute the
softmax; it may be a python int OR a traced int32 scalar - the traced form
keeps ONE compiled program per bucket size regardless of the live frame
count (the flash kernel reads it from SMEM).
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _key_mask(valid_len, nk):
    return jax.lax.broadcasted_iota(jnp.int32, (nk,), 0) < valid_len


def naive_attention(q, k, v, valid_len=None, kv_bias=None):
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, v.dtype.type(scale) * k,
                        preferred_element_type=jnp.float32)
    if kv_bias is not None:
        # Per-key additive logit bias (natural-log units): proportional
        # attention for merged K/V tokens (logit += log(group size)).
        logits = logits + kv_bias.astype(jnp.float32)[None, None, None, :]
    if valid_len is not None:
        mask = _key_mask(valid_len, k.shape[2])
        logits = jnp.where(mask[None, None, None, :], logits, _NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)


def chunked_attention(q, k, v, valid_len=None, chunk=1024, kv_bias=None):
    """Memory-bounded attention: map over query chunks, full softmax per chunk."""
    B, H, N, D = q.shape
    scale = 1.0 / math.sqrt(D)
    pad = (-N) % chunk
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    nq = qp.shape[2] // chunk
    qp = qp.reshape(B, H, nq, chunk, D)

    kmask = None if valid_len is None else _key_mask(valid_len, k.shape[2])

    def one_chunk(q_c):
        logits = jnp.einsum("bhqd,bhkd->bhqk", q_c, k,
                            preferred_element_type=jnp.float32) * scale
        if kv_bias is not None:
            logits = logits + kv_bias.astype(jnp.float32)[None, None, None, :]
        if kmask is not None:
            logits = jnp.where(kmask[None, None, None, :], logits, _NEG_INF)
        w = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)

    out = jax.lax.map(one_chunk, jnp.moveaxis(qp, 2, 0))  # (nq, B, H, chunk, D)
    out = jnp.moveaxis(out, 0, 2).reshape(B, H, nq * chunk, D)
    return out[:, :, :N]


# ---------------------------------------------------------------------------
# Pallas flash attention (TPU)
# ---------------------------------------------------------------------------


def _rope_in_kernel(x, C, S):
    """Rotary embedding as x*C + swap(x)*S' with pre-built full-width
    tables (C = [cos|cos], S = [-sin|sin]); runs in f32, returns x.dtype."""
    D2 = x.shape[-1] // 2
    xf = x.astype(jnp.float32)
    sw = jnp.concatenate([xf[:, D2:], xf[:, :D2]], axis=1)
    return (xf * C + sw * S).astype(x.dtype)



def _sq(ref):
    """Load a q/k/v tile as (block, D) from a (1, block, D) or
    (1, block, 1, D) BlockSpec window (bhnd vs nhd layouts)."""
    x = ref[...]
    return x.reshape(x.shape[1], x.shape[-1])


def _quant_i8(x, inv):
    """f32 -> int8 with symmetric per-(batch,head) scale (inv = 127/amax)."""
    return jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)


def _ln_in_kernel(x, g, b, eps):
    """Per-row LayerNorm over the head dim, fused into the kernel's q/k
    tile prep (qk-norm without the two full HBM round trips per block that
    a standalone LN pass costs). f32 stats with flax's fast-variance
    semantics (Var = E[x^2] - E[x]^2 clipped at 0), output cast back to
    the tile dtype so QK^T stays on the bf16 MXU path."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def _flash_kernel(vl_ref, *refs, block_k, num_k_blocks, masked, has_rope,
                  has_bias, qk_int8=False, static_max=False,
                  return_stats=False, qk_ln_eps=None, hp=1):
    """Online-softmax step for one (q-block, k-block) tile.

    `hp` > 1 is the packed-heads layout (_flash_call layout="packed"): the
    lane dim of every q/k/v/o tile carries `hp` heads' D-wide slices side
    by side, so one grid step runs `hp` heads on static lane slices of one
    loaded tile and all ref stores stay full-width. This is what lets the
    caller skip the (B,H,N,D) transposes entirely: Mosaic rejects per-head
    4D blocks ((1, bq, 1, D) - second-to-last block dim must divide 8),
    but folding heads into lanes keeps blocks 3D with a 128-lane minor.

    VPU-lean design (the kernel is ~half VPU-bound at D=64, where both
    matmuls cap at 50% MXU utilization): the softmax scale AND log2(e) are
    folded into q (or its rope tables) by the caller, so the in-kernel
    softmax is exp2-based (base change cancels in acc/l) with no per-logit
    scale multiply; key masking runs per k-block - fully-valid blocks skip
    the iota/compare/select passes entirely and fully-invalid blocks
    (bucket padding) skip ALL compute, which also makes padded-frame cost
    ~zero.

    With `static_max`, the running row-max is replaced by a per-(batch,
    head) STATIC upper bound on the logits (Cauchy-Schwarz over row norms,
    computed by the caller and read from SMEM): p = exp2(s - M) is a pure
    exponent shift, so softmax stays exact to f32 while the kernel drops
    the per-tile max reduction, the exp2 correction factor, and the
    accumulator rescale multiply - one fewer full VPU pass over every
    (block_q, block_k) logits tile. Sound whenever the bound's overshoot
    over the true row max stays < ~120 log2 units (guaranteed by qk-norm'd
    q/k, whose row norms are uniform); tail entries more than 126 below
    the bound flush to zero, which changes the softmax by < 2^-100.

    With `has_rope`, rotary embedding runs in-kernel from tiny shared
    tables AND is cached in scratch so no tile is rotated twice: the q
    tile once per q-block (at j == 0, reused across the k sweep) and each
    k block once per (batch, head) (at i == 0 into a persistent all-blocks
    scratch, reused by every later q block - the TPU grid is sequential,
    so the i/j axes are declared "arbitrary"). This removes the HBM
    round trips of pre-applied roped q/k entirely.
    """
    off = 0
    b_ref = None
    sc_ref = None
    sm_ref = None
    ln_ref = None
    if static_max:
        sm_ref, off = refs[0], 1
    if qk_int8:
        sc_ref = refs[off]
        off += 1
    if qk_ln_eps is not None:
        ln_ref = refs[off]
        off += 1
    if has_bias:
        b_ref = refs[off]
        off += 1
    if has_rope:
        cq_ref, sq_ref, ck_ref, sk_ref = refs[off:off + 4]
        off += 4
    if has_rope or qk_int8:
        qr_ref, ks_ref = refs[-2:]
    mo_ref = lo_ref = None
    if return_stats:
        (q_ref, k_ref, v_ref, o_ref, mo_ref, lo_ref,
         acc_ref, m_ref, l_ref) = refs[off:off + 9]
    else:
        q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref = refs[off:off + 7]
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    D = q_ref.shape[-1] // hp
    # Per-head lane windows of the (block, hp*D) tiles, and the 128-lane
    # column windows of the m/l scratch that hold each head's row stats
    # (stats are stored broadcast across the head's window so every store
    # stays a full-width lane write).
    HW = [slice(h * D, (h + 1) * D) for h in range(hp)]
    SW = [slice(h * (128 // hp), (h + 1) * (128 // hp)) for h in range(hp)]

    if has_rope or qk_int8:
        # q/k tile preparation caches (see docstring): rope and/or int8
        # quantization run once per q block / once per (batch, head) k
        # block, not once per grid step.
        def _prep(ref, c_ref, s_ref, ln0, ln1, sc_row):
            w = _sq(ref)
            parts = []
            for h in range(hp):
                t = w[:, HW[h]]
                if qk_ln_eps is not None:
                    t = _ln_in_kernel(t, ln0, ln1, qk_ln_eps)
                t = (_rope_in_kernel(t, c_ref[...], s_ref[...])
                     if has_rope else t).astype(jnp.float32)
                parts.append(_quant_i8(t, sc_ref[sc_row, b * hp + h])
                             if qk_int8 else t)
            out = parts[0] if hp == 1 else jnp.concatenate(parts, axis=-1)
            return out

        @pl.when(j == 0)
        def _prep_q():
            qr_ref[:] = _prep(q_ref,
                              cq_ref if has_rope else None,
                              sq_ref if has_rope else None,
                              ln_ref[0:1] if ln_ref is not None else None,
                              ln_ref[1:2] if ln_ref is not None else None,
                              0).astype(qr_ref.dtype)

        @pl.when(i == 0)
        def _prep_k():
            ks_ref[pl.ds(j * block_k, block_k)] = \
                _prep(k_ref,
                      ck_ref if has_rope else None,
                      sk_ref if has_rope else None,
                      ln_ref[2:3] if ln_ref is not None else None,
                      ln_ref[3:4] if ln_ref is not None else None,
                      1).astype(ks_ref.dtype)

    def step(apply_mask):
        # Keep matmul operands in bf16 (or int8 with `qk_int8`): the MXU
        # runs bf16 x bf16 -> f32 at full rate and int8 x int8 -> int32 at
        # 2x that, while f32 operands drop it ~8x. Softmax stats stay f32.
        if has_rope or qk_int8:
            qw = qr_ref[:]                           # (block_q, hp*D)
            kw = ks_ref[pl.ds(j * block_k, block_k)]
        else:
            qw = _sq(q_ref)
            kw = _sq(k_ref)
        vw = _sq(v_ref)                              # (block_k, hp*D)
        if apply_mask:
            # Zero v rows past valid_len (straddle block only): the caller
            # never pads k/v, so the edge block's masked read can return
            # non-finite garbage there, and 0 * NaN is still NaN in the AV
            # matmul. One select per straddle tile - fully-valid blocks pay
            # nothing.
            vrow = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, vw.shape, 0)
            vw = jnp.where(vrow < vl_ref[0], vw, 0.0)

        accw = acc_ref[:]
        acc_parts = []
        if static_max:
            lw = l_ref[:]
            l_parts = []
            for h in range(hp):
                q, k, v = qw[:, HW[h]], kw[:, HW[h]], vw[:, HW[h]]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32 if qk_int8
                    else jnp.float32)
                if qk_int8:
                    # Dequantize: sc[2] folds the q/k scales, softmax scale
                    # and log2(e) into one per-(batch,head) constant.
                    s = s.astype(jnp.float32) * sc_ref[2, b * hp + h]
                if has_bias:
                    s = s + b_ref[...]               # (1, block_k) broadcast
                if apply_mask:
                    col = j * block_k + jax.lax.broadcasted_iota(
                        jnp.int32, s.shape, 1)
                    s = jnp.where(col < vl_ref[0], s, _NEG_INF)
                # Exponent shift by the precomputed per-(b,h) bound: no max
                # pass, no correction, no accumulator rescale.
                p = jnp.exp2(s - sm_ref[b * hp + h])
                l_new = lw[:, SW[h]][:, :1] + jnp.sum(p, axis=-1,
                                                      keepdims=True)
                acc_parts.append(accw[:, HW[h]] + jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
                l_parts.append(jnp.broadcast_to(l_new,
                                                (l_new.shape[0], 128 // hp)))
            acc_ref[:] = (acc_parts[0] if hp == 1
                          else jnp.concatenate(acc_parts, axis=-1))
            l_ref[:] = (l_parts[0] if hp == 1
                        else jnp.concatenate(l_parts, axis=-1))
            return

        mw = m_ref[:]
        lw = l_ref[:]
        m_parts = []
        l_parts = []
        for h in range(hp):
            q, k, v = qw[:, HW[h]], kw[:, HW[h]], vw[:, HW[h]]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32 if qk_int8 else jnp.float32)
            if qk_int8:
                s = s.astype(jnp.float32) * sc_ref[2, b * hp + h]
            if has_bias:
                s = s + b_ref[...]
            if apply_mask:
                col = j * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                             s.shape, 1)
                s = jnp.where(col < vl_ref[0], s, _NEG_INF)

            m_prev = mw[:, SW[h]][:, :1]             # (block_q, 1)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp2(s - m_new)                  # (block_q, block_k) f32
            corr = jnp.exp2(m_prev - m_new)          # (block_q, 1)
            l_new = corr * lw[:, SW[h]][:, :1] + jnp.sum(p, axis=-1,
                                                         keepdims=True)
            acc_parts.append(accw[:, HW[h]] * corr + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            m_parts.append(jnp.broadcast_to(m_new,
                                            (m_new.shape[0], 128 // hp)))
            l_parts.append(jnp.broadcast_to(l_new,
                                            (l_new.shape[0], 128 // hp)))
        acc_ref[:] = (acc_parts[0] if hp == 1
                      else jnp.concatenate(acc_parts, axis=-1))
        m_ref[:] = (m_parts[0] if hp == 1
                    else jnp.concatenate(m_parts, axis=-1))
        l_ref[:] = (l_parts[0] if hp == 1
                    else jnp.concatenate(l_parts, axis=-1))

    if masked:
        start = j * block_k

        @pl.when(start + block_k <= vl_ref[0])
        def _full_valid():
            step(False)

        @pl.when((start < vl_ref[0]) & (start + block_k > vl_ref[0]))
        def _straddle():
            step(True)
        # start >= valid_len: whole block is padding - no compute at all.
    else:
        step(False)

    @pl.when(j == num_k_blocks - 1)
    def _finish():
        if hp == 1:
            o = acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)
        else:
            accw, lw = acc_ref[:], l_ref[:]
            o = jnp.concatenate(
                [accw[:, HW[h]] / jnp.maximum(lw[:, SW[h]][:, :1], 1e-30)
                 for h in range(hp)], axis=-1)
        o_ref[...] = o.astype(o_ref.dtype).reshape(o_ref.shape)
        if return_stats:
            # Softmax stats in the kernel's exp2 domain (scale and log2(e)
            # already folded into the logits): m = the value the summands
            # were shifted by (running row max, or the static bound), l =
            # sum of exp2(s - m). Enough to merge partial softmaxes across
            # K/V chunks (parallel/ring.py).
            if static_max:
                if hp == 1:
                    mo_ref[...] = jnp.full_like(mo_ref, sm_ref[b])
                else:
                    # Per-head static bounds into each head's 128/hp-lane
                    # stats window (matching m_ref's layout above).
                    rows = mo_ref.shape[-2]
                    mo_ref[...] = jnp.concatenate(
                        [jnp.full((rows, 128 // hp), sm_ref[b * hp + h],
                                  jnp.float32) for h in range(hp)],
                        axis=-1).reshape(mo_ref.shape)
            else:
                mo_ref[...] = m_ref[:].reshape(mo_ref.shape)
            lo_ref[...] = l_ref[:].reshape(lo_ref.shape)


def _flash_single_kernel(vl_ref, *refs, masked, has_rope, has_bias,
                         return_stats=False, qk_ln_eps=None, hp=1):
    """One-shot softmax for Nk <= one k-block (frame attention, camera
    trunk): no online-softmax accumulators, no m/l scratch traffic.

    `hp` > 1: the packed-heads layout - the tile's lane dim carries `hp`
    heads' D-wide slices side by side (see _flash_call layout="packed");
    each head's attention runs on a static lane slice of the loaded tile
    and the outputs re-concatenate, so the store stays one full-width
    write."""
    off = 0
    b_ref = None
    ln_ref = None
    if qk_ln_eps is not None:
        ln_ref, off = refs[0], 1
    if has_bias:
        b_ref = refs[off]
        off += 1
    if has_rope:
        cq_ref, sq_ref, ck_ref, sk_ref = refs[off:off + 4]
        off += 4
    mo_ref = lo_ref = None
    if return_stats:
        q_ref, k_ref, v_ref, o_ref, mo_ref, lo_ref = refs[off:off + 6]
    else:
        q_ref, k_ref, v_ref, o_ref = refs[off:off + 4]
    qw = _sq(q_ref)                              # (block_q, hp*D)
    kw = _sq(k_ref)                              # (Nk_pad, hp*D)
    vw = _sq(v_ref)
    if masked:
        # Zero v rows past valid_len: the caller never pads k/v (the edge
        # block is a masked read), so those rows can hold non-finite
        # garbage, and a 0 attention weight times a NaN v is still NaN.
        vrow = jax.lax.broadcasted_iota(jnp.int32, vw.shape, 0)
        vw = jnp.where(vrow < vl_ref[0], vw, 0.0)
    D = qw.shape[-1] // hp
    outs = []
    ms = []
    ls = []
    for h in range(hp):
        sl = slice(h * D, (h + 1) * D)
        q, k, v = qw[:, sl], kw[:, sl], vw[:, sl]
        if qk_ln_eps is not None:
            q = _ln_in_kernel(q, ln_ref[0:1], ln_ref[1:2], qk_ln_eps)
            k = _ln_in_kernel(k, ln_ref[2:3], ln_ref[3:4], qk_ln_eps)
        if has_rope:
            q = _rope_in_kernel(q, cq_ref[...], sq_ref[...])
            k = _rope_in_kernel(k, ck_ref[...], sk_ref[...])
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if has_bias:
            s = s + b_ref[...]
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < vl_ref[0], s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        outs.append(o / jnp.maximum(l, 1e-30))
        ms.append(m)
        ls.append(l)
    o = outs[0] if hp == 1 else jnp.concatenate(outs, axis=-1)
    o_ref[...] = o.astype(o_ref.dtype).reshape(o_ref.shape)
    if return_stats:
        if hp == 1:
            mo = jnp.broadcast_to(ms[0], mo_ref.shape[-2:])
            lo = jnp.broadcast_to(ls[0], lo_ref.shape[-2:])
        else:
            # Each head's (rows, 1) stats broadcast across its 128/hp-lane
            # column window (same layout as the multi-block m/l scratch).
            rows = mo_ref.shape[-2]
            mo = jnp.concatenate(
                [jnp.broadcast_to(ms[h], (rows, 128 // hp))
                 for h in range(hp)], axis=-1)
            lo = jnp.concatenate(
                [jnp.broadcast_to(ls[h], (rows, 128 // hp))
                 for h in range(hp)], axis=-1)
        mo_ref[...] = mo.reshape(mo_ref.shape)
        lo_ref[...] = lo.reshape(lo_ref.shape)


def _apply_rope_wide(x, cos, sin):
    """Rotary embedding on (..., N, D) with (N, D/2) tables - same math as
    modules.apply_rope, used when rope is NOT fused into the kernel."""
    D2 = x.shape[-1] // 2
    C = jnp.concatenate([cos, cos], -1).astype(jnp.float32)
    S = jnp.concatenate([-sin, sin], -1).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    sw = jnp.concatenate([xf[..., D2:], xf[..., :D2]], axis=-1)
    return (xf * C + sw * S).astype(x.dtype)


def _rope_tables(cos, sin, scale: float, n_pad: int):
    """(N, D/2) cos/sin -> full-width (N_pad, D) f32 (C, S') tables with the
    softmax scale folded in: rope(x) = x*C + [x2|x1]*S'."""
    C = jnp.concatenate([cos, cos], axis=-1).astype(jnp.float32) * scale
    S = jnp.concatenate([-sin, sin], axis=-1).astype(jnp.float32) * scale
    if n_pad:
        C = jnp.pad(C, ((0, n_pad), (0, 0)))
        S = jnp.pad(S, ((0, n_pad), (0, 0)))
    return C, S


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret", "layout",
                              "qk_int8", "softmax", "return_stats",
                              "qk_ln_eps", "num_heads"),
)
def _flash_call(q, k, v, valid_len, block_q, block_k, interpret,
                rope_q=None, rope_k=None, layout="bhnd", kv_bias=None,
                qk_int8=False, softmax="online", return_stats=False,
                qk_ln=None, qk_ln_eps=None, num_heads=None):
    """layout="bhnd": q/k/v are (B, H, N, D) - flattened to (B*H, N, D).
    layout="packed": q/k/v are (B, N, H*D) - the qkv PROJECTION's natural
    output, zero transposes/reshapes at the boundary; requires `num_heads`.
    Heads fold into the lane dim in groups of hp = 128/D per block (see
    _flash_kernel hp) so every tile keeps a 128-lane minor.
    layout="nhd":  q/k/v are (B, N, H, D) - kept for reference; Mosaic
    rejects its per-head (1, block, 1, D) tiles, so it is interpret-only
    ("packed" is the hardware answer to the same transposes)."""
    hp = 1
    if layout == "packed":
        assert num_heads, "layout='packed' requires num_heads"
        B, Nq, HD = q.shape
        H = num_heads
        D = HD // H
        if D < 128:
            # Largest head-group size that fills the 128-lane minor AND
            # divides both the head count and 128 (the m/l scratch stores
            # per-head stats in 128/hp-lane column windows, so hp must
            # divide 128 exactly - hp=3 at H=6, D=32 would store 3x42=126
            # lanes into the 128-wide scratch). Tiny test configs can have
            # H < 128/D; hp=1 tiles then carry D lanes, fine under
            # interpret and for D-multiple-of-128 hardware cases.
            hp = min(128 // D, H)
            while H % hp or 128 % hp:
                hp -= 1
        Nk = k.shape[1]
        seq_ax = 1
    elif layout == "nhd":
        B, Nq, H, D = q.shape
        Nk = k.shape[1]
        seq_ax = 1
    else:
        B, H, Nq, D = q.shape
        Nk = k.shape[2]
        seq_ax = 2
    has_rope = rope_q is not None
    has_qkln = qk_ln is not None
    if has_qkln:
        # In-kernel qk-norm rides the rope tile-prep caches, and the int8
        # quantization scales are computed by the caller from pre-LN data
        # (wrong post-LN) - keep the fusion to the rope'd bf16 paths.
        assert has_rope, "qk_ln requires in-kernel rope (shared tile prep)"
        assert not qk_int8, "qk_ln + qk_int8 unsupported (scales are pre-LN)"
        assert qk_ln_eps is not None
    # int8 QK^T only pays off on the multi-k-block (global attention) path;
    # the one-shot kernel (frame attention, K=64-geometry bound) measured
    # int8 ~= bf16 in round 1, so it silently stays bf16 there.
    use_int8 = bool(qk_int8) and (Nk + (-Nk) % block_k) // block_k > 1
    # Fold softmax scale and log2(e) into q (or into its rope tables) so the
    # kernel runs an exp2-based online softmax with zero per-logit scaling
    # work. One rounding of q (bf16) - same order as the bf16 storage error
    # already accepted. (With int8 QK^T the fold lives in the per-(b,h)
    # dequant constant instead - see sc below.)
    c_scale = math.log2(math.e) / math.sqrt(D)

    # Static softmax max (see _flash_kernel): Cauchy-Schwarz bound on the
    # exp2-domain logits per (batch, head), max_n|q_n| * max_n|k_n| *
    # c_scale (+ the largest kv bias). Rope rotates (x1, x2) pairs, so row
    # norms - and the bound - are invariant to it; int8 dequant reproduces
    # the same logical logits, so the same bound serves both numerics.
    # Computed on the raw q BEFORE the in-place scale fold below. O(N*D).
    use_static = (softmax == "static"
                  and (Nk + (-Nk) % block_k) // block_k > 1)
    sm_ops = []
    if use_static:
        if has_qkln:
            # LN output rows satisfy ||y|| <= sqrt(D)*max|gamma| + ||beta||
            # (the normalized row has norm exactly sqrt(D) up to eps), so
            # the Cauchy-Schwarz bound comes from the LN PARAMS alone - no
            # pass over q/k at all. For typical gamma ~ 1, beta ~ 0 this is
            # as tight as the data bound (sqrt(D) each side); pathological
            # gamma spread only loosens it by log2(max|g|/rms(g)) << the
            # ~120-unit flush margin.
            def param_bound(g, b_):
                gf = g.astype(jnp.float32)
                bf = b_.astype(jnp.float32)
                return (math.sqrt(D) * jnp.max(jnp.abs(gf))
                        + jnp.sqrt(jnp.sum(bf * bf)))

            gq_, bq_, gk_, bk_ = qk_ln
            smax = jnp.full((B * H,), c_scale * param_bound(gq_, bq_)
                            * param_bound(gk_, bk_), jnp.float32)
        else:
            def row_norm_max(x, n):
                if layout == "packed":
                    x = x.reshape(B, n, H, D)    # free view of (B, N, H*D)
                    ax = 1
                else:
                    ax = seq_ax
                sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1)
                m = jnp.sqrt(jnp.max(sq, axis=ax))           # (B, H)
                return m.reshape(B, H) if layout == "packed" else m

            smax = (c_scale * row_norm_max(q, Nq)
                    * row_norm_max(k, Nk)).reshape(-1)
        if kv_bias is not None:
            smax = smax + jnp.max(kv_bias.astype(jnp.float32)) \
                * math.log2(math.e)
        sm_ops = [smax]

    if not has_rope and not use_int8:
        q = (q.astype(jnp.float32) * c_scale).astype(q.dtype)

    sc_ops = []
    if use_int8:
        # Per-(batch, head) symmetric quantization scales. With rope the
        # kernel quantizes AFTER rotating, so the bound must cover any
        # rotation of each (x1, x2) pair: max pair norm (rotation preserves
        # it, and each rotated component is <= the pair norm). Without rope
        # the plain max-abs is tighter.
        def amax_bound(x):
            if layout == "packed":
                xf = x.reshape(B, x.shape[1], H, D).astype(jnp.float32)
                red_ax = (1, 3)
            else:
                xf = x.astype(jnp.float32)
                red_ax = (seq_ax, 3)  # bhnd/nhd leave (B, H)
            if has_rope:
                x1, x2 = jnp.split(xf, 2, axis=-1)
                mag = jnp.sqrt(x1 * x1 + x2 * x2)
            else:
                mag = jnp.abs(xf)
            return jnp.maximum(jnp.max(mag, axis=red_ax), 1e-6).reshape(-1)

        sq_s = amax_bound(q)
        sk_s = amax_bound(k)
        sc_ops = [jnp.stack([127.0 / sq_s, 127.0 / sk_s,
                             sq_s * sk_s * (c_scale / (127.0 * 127.0))])]

    ln_ops = []
    if has_qkln:
        # One (4, D) f32 table: q gamma/beta rows then k gamma/beta rows,
        # shared across batch/heads (torch q_norm/k_norm are per-head-dim).
        ln_ops = [jnp.stack([t.astype(jnp.float32).reshape(D)
                             for t in qk_ln])]

    # Non-divisible N is served by Mosaic's masked edge blocks - q/k/v are
    # NEVER explicitly padded (a pad+slice pair costs a full HBM round trip
    # of each ~70 MB operand per attention call; measured ~1-2 ms/call at
    # the frame-attention shape). Garbage in the edge block is contained:
    # out-of-range q rows produce garbage rows the masked store discards,
    # out-of-range k columns are where-masked in the kernel (vl <= Nk), and
    # out-of-range v rows are zeroed in-kernel before the AV matmul (a 0
    # softmax weight times a non-finite garbage v would still be NaN).
    pad_q = (-Nq) % block_q
    pad_k = (-Nk) % block_k

    if return_stats and layout == "nhd":
        raise NotImplementedError(
            "return_stats supports layouts 'bhnd' and 'packed'")

    if layout == "packed":
        qf, kf, vf = q, k, v
        PPB = H // hp  # head-group blocks per batch
        lanes = hp * D

        def q_map2(b, i):
            return (b // PPB, i, b % PPB)

        def k_map2(b, i):
            return (b // PPB, 0, b % PPB)

        def q_map3(b, i, j):
            return (b // PPB, i, b % PPB)

        def k_map3(b, i, j):
            return (b // PPB, j, b % PPB)

        def qkv_specs(bmaps):
            q_map, k_map = bmaps
            return [pl.BlockSpec((1, block_q, lanes), q_map),
                    pl.BlockSpec((1, block_k, lanes), k_map),
                    pl.BlockSpec((1, block_k, lanes), k_map)]

        out_shape = jax.ShapeDtypeStruct((B, Nq, H * D), q.dtype)
        out_spec2 = pl.BlockSpec((1, block_q, lanes), q_map2)
        out_spec3 = pl.BlockSpec((1, block_q, lanes), q_map3)

        if return_stats:
            # Per-row softmax stats (f32): one 128-lane tile per head-group
            # grid step; head h of group p lives in the h-th 128/hp-lane
            # column window (the m/l scratch layout — see _flash_kernel SW).
            st_shape = jax.ShapeDtypeStruct((B * PPB, Nq, 128), jnp.float32)
            st_spec2 = pl.BlockSpec((1, block_q, 128), lambda b, i: (b, i, 0))
            st_spec3 = pl.BlockSpec((1, block_q, 128),
                                    lambda b, i, j: (b, i, 0))
            out_shape = [out_shape, st_shape, st_shape]
            out_spec2 = [out_spec2, st_spec2, st_spec2]
            out_spec3 = [out_spec3, st_spec3, st_spec3]
            hp_ = hp

            def unpack(outs):
                o, m, l = outs

                def heads(st):
                    # (B*PPB, Nq, 128) -> (B, H, Nq): column h*(128/hp) of
                    # group p is head p*hp + h.
                    st = st[:, :, ::128 // hp_][:, :, :hp_]
                    st = st.reshape(B, PPB, Nq, hp_)
                    return jnp.transpose(st, (0, 1, 3, 2)).reshape(B, H, Nq)

                return o, heads(m), heads(l)
        else:
            def unpack(out):
                return out
    elif layout == "nhd":
        qf, kf, vf = q, k, v

        def q_map2(b, i):
            return (b // H, i, b % H, 0)

        def k_map2(b, i):
            return (b // H, 0, b % H, 0)

        def q_map3(b, i, j):
            return (b // H, i, b % H, 0)

        def k_map3(b, i, j):
            return (b // H, j, b % H, 0)

        def qkv_specs(bmaps):
            q_map, k_map = bmaps
            return [pl.BlockSpec((1, block_q, 1, D), q_map),
                    pl.BlockSpec((1, block_k, 1, D), k_map),
                    pl.BlockSpec((1, block_k, 1, D), k_map)]

        out_shape = jax.ShapeDtypeStruct((B, Nq, H, D), q.dtype)
        out_spec2 = pl.BlockSpec((1, block_q, 1, D), q_map2)
        out_spec3 = pl.BlockSpec((1, block_q, 1, D), q_map3)

        def unpack(out):
            return out
    else:
        qf = q.reshape(B * H, Nq, D)
        kf = k.reshape(B * H, Nk, D)
        vf = v.reshape(B * H, Nk, D)

        def qkv_specs(bmaps):
            q_map, k_map = bmaps
            return [pl.BlockSpec((1, block_q, D), q_map),
                    pl.BlockSpec((1, block_k, D), k_map),
                    pl.BlockSpec((1, block_k, D), k_map)]

        out_shape = jax.ShapeDtypeStruct((B * H, Nq, D), q.dtype)
        out_spec2 = pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0))
        out_spec3 = pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0))
        if return_stats:
            # Per-row softmax stats as extra outputs (f32, lane-width 128
            # tiles; only column 0 is meaningful).
            st_shape = jax.ShapeDtypeStruct((B * H, Nq, 128), jnp.float32)
            st_spec2 = pl.BlockSpec((1, block_q, 128), lambda b, i: (b, i, 0))
            st_spec3 = pl.BlockSpec((1, block_q, 128),
                                    lambda b, i, j: (b, i, 0))
            out_shape = [out_shape, st_shape, st_shape]
            out_spec2 = [out_spec2, st_spec2, st_spec2]
            out_spec3 = [out_spec3, st_spec3, st_spec3]

            def unpack(outs):
                o, m, l = outs
                return (o.reshape(B, H, Nq, D),
                        m[:, :, 0].reshape(B, H, Nq),
                        l[:, :, 0].reshape(B, H, Nq))
        else:
            def unpack(out):
                return out.reshape(B, H, Nq, D)

        q_map2 = lambda b, i: (b, i, 0)            # noqa: E731
        k_map2 = lambda b, i: (b, 0, 0)            # noqa: E731
        q_map3 = lambda b, i, j: (b, i, 0)         # noqa: E731
        k_map3 = lambda b, i, j: (b, j, 0)         # noqa: E731

    nq_blocks = (Nq + pad_q) // block_q
    nk_blocks = (Nk + pad_k) // block_k

    masked = (valid_len is not None) or bool(pad_k)
    if valid_len is None:
        vl = jnp.full((1,), Nk, dtype=jnp.int32)
    else:
        vl = jnp.minimum(jnp.asarray(valid_len, jnp.int32), Nk).reshape(1)

    ln_specs2 = []
    ln_specs3 = []
    if has_qkln:
        ln_specs2 = [pl.BlockSpec((4, D), lambda b, i: (0, 0))]
        ln_specs3 = [pl.BlockSpec((4, D), lambda b, i, j: (0, 0))]

    has_bias = kv_bias is not None
    bias_ops = []
    bias_specs2 = []
    bias_specs3 = []
    if has_bias:
        # Per-key logit bias in exp2 domain (log2(e) folded like the scale):
        # the kernel's exp2(s + bias2) equals exp(logits + kv_bias).
        bias2 = (kv_bias.astype(jnp.float32) * math.log2(math.e))
        bias_ops = [bias2.reshape(1, -1)]
        bias_specs2 = [pl.BlockSpec((1, block_k), lambda b, i: (0, 0))]
        bias_specs3 = [pl.BlockSpec((1, block_k), lambda b, i, j: (0, j))]

    rope_ops = []
    rope_specs2 = []
    rope_specs3 = []
    if has_rope:
        Cq, Sq = _rope_tables(*rope_q, 1.0 if use_int8 else c_scale, 0)
        Ck, Sk = _rope_tables(*rope_k, 1.0, 0)
        rope_ops = [Cq, Sq, Ck, Sk]
        rq_spec2 = pl.BlockSpec((block_q, D), lambda b, i: (i, 0))
        rk_spec2 = pl.BlockSpec((block_k, D), lambda b, i: (0, 0))
        rope_specs2 = [rq_spec2, rq_spec2, rk_spec2, rk_spec2]
        rq_spec3 = pl.BlockSpec((block_q, D), lambda b, i, j: (i, 0))
        rk_spec3 = pl.BlockSpec((block_k, D), lambda b, i, j: (j, 0))
        rope_specs3 = [rq_spec3, rq_spec3, rk_spec3, rk_spec3]

    # Experiment knob (VGGT_FLASH_ALIAS_Q=1): alias the q operand's HBM
    # buffer with output 0. Shapes/block maps are identical, q is dead
    # after the call, and every grid cell reads its q tile (j==0 with the
    # rope/int8 scratch cache; same-region re-reads otherwise) before the
    # last-j output write to the same region — so the alias is safe and
    # saves the output allocation + the copy XLA keeps at the custom-call
    # boundary for it. Measured before flipping any default.
    alias_q = (os.environ.get("VGGT_FLASH_ALIAS_Q") == "1"
               and not return_stats)

    if nk_blocks == 1:
        q_idx2 = 1 + len(ln_ops) + len(bias_ops) + len(rope_ops)
        out = pl.pallas_call(
            functools.partial(_flash_single_kernel, masked=masked,
                              has_rope=has_rope, has_bias=has_bias,
                              return_stats=return_stats,
                              qk_ln_eps=qk_ln_eps if has_qkln else None,
                              hp=hp),
            grid=(B * H // hp, nq_blocks),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + ln_specs2 +
            bias_specs2 + rope_specs2 + qkv_specs((q_map2, k_map2)),
            out_specs=out_spec2,
            out_shape=out_shape,
            input_output_aliases={q_idx2: 0} if alias_q else {},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                # v5e has 128MB VMEM; the default 16MB scoped limit rejects
                # the larger tiles that win at these shapes.
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(vl, *ln_ops, *bias_ops, *rope_ops, qf, kf, vf)
        return unpack(out)

    kernel = functools.partial(
        _flash_kernel, block_k=block_k,
        num_k_blocks=nk_blocks, masked=masked, has_rope=has_rope,
        has_bias=has_bias, qk_int8=use_int8, static_max=use_static,
        return_stats=return_stats,
        qk_ln_eps=qk_ln_eps if has_qkln else None, hp=hp)
    sm_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] if use_static else []

    scratch = [
        pltpu.VMEM((block_q, hp * D), jnp.float32),
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, 128), jnp.float32),
    ]
    sc_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] if use_int8 else []
    if has_rope or use_int8:
        # roped/quantized q cache (per q block) + k cache over ALL k blocks
        # (filled on the first q sweep, reused by every later one)
        cache_dt = jnp.int8 if use_int8 else q.dtype
        scratch += [pltpu.VMEM((block_q, hp * D), cache_dt),
                    pltpu.VMEM((nk_blocks * block_k, hp * D), cache_dt)]
        # the k cache carries state across the i axis, so i is sequential
        semantics = ("parallel", "arbitrary", "arbitrary")
    else:
        # b and i carry no state; only the k-block axis j is sequential
        # (online-softmax accumulators). Declaring this lets Mosaic
        # pipeline and reorder the parallel axes.
        semantics = ("parallel", "parallel", "arbitrary")

    q_idx3 = (1 + len(sm_ops) + len(sc_ops) + len(ln_ops) + len(bias_ops)
              + len(rope_ops))
    out = pl.pallas_call(
        kernel,
        grid=(B * H // hp, nq_blocks, nk_blocks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + sm_specs +
        sc_specs + ln_specs3 + bias_specs3 + rope_specs3 +
        qkv_specs((q_map3, k_map3)),
        out_specs=out_spec3,
        out_shape=out_shape,
        input_output_aliases={q_idx3: 0} if alias_q else {},
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(vl, *sm_ops, *sc_ops, *ln_ops, *bias_ops, *rope_ops, qf, kf, vf)
    return unpack(out)


def flash_attention(q, k, v, valid_len=None, block_q=1024, block_k=2048,
                    interpret=False, rope_q=None, rope_k=None,
                    layout="bhnd", kv_bias=None, qk_int8=False,
                    softmax="online", return_stats=False,
                    qk_ln=None, qk_ln_eps=1e-5, num_heads=None):
    """Pallas flash attention forward.

    `return_stats` (layouts "bhnd" and "packed"): additionally return the
    per-row softmax statistics (m, l), each (B, H, Nq) f32, where the row
    output is
    sum_k exp2(s_k - m) v_k / l with s the exp2-domain logits (softmax
    scale and log2(e) folded in) and m the shift the kernel used (running
    row max, or the static bound under softmax="static"). Two partial
    results over disjoint key sets merge exactly:

        m' = max(m_a, m_b);  w_x = l_x * exp2(m_x - m')
        out = (w_a * out_a + w_b * out_b) / (w_a + w_b);  l' = w_a + w_b

    which is what ring attention (parallel/ring.py) uses to chain the
    kernel across rotating K/V chunks.

    `softmax`: "online" (default) runs the classic running-max online
    softmax; "static" replaces the running max with a per-(batch, head)
    Cauchy-Schwarz logit bound computed outside the kernel (exact softmax
    up to an fp exponent shift; drops one full VPU pass per logits tile -
    see _flash_kernel). Only sound when row norms are roughly uniform
    (e.g. qk-normed attention): a row whose true max logit sits more than
    ~120 log2 units below the bound would flush to zero. Only affects the
    multi-k-block (global attention) path; the one-shot kernel already
    computes an exact single-pass softmax.

    `qk_int8`: quantize the (roped) q/k tiles to int8 IN-KERNEL with
    per-(batch, head) symmetric scales and run QK^T on the MXU's 2x-rate
    int8 path (int32 accumulation, dequant folded into one per-(b,h)
    constant). Only takes effect on the multi-k-block (global attention)
    path; max error ~1e-3 vs f32 at production N (bf16 kernel: ~2e-4;
    scripts/bench_int8_inkernel.py). Attention stays full-rank. NOT the
    default: the isolated-kernel ~12% win does not survive the production
    kernel's rope/mask/bias VPU load - end-to-end A/B measured the exact
    path 3.6% SLOWER with int8 (ARCHITECTURE.md section 9). AV stays bf16
    always: quantizing p each step measured 44.8 vs 63.5 TF/s.

    `kv_bias`: optional (Nk,) f32 per-key additive logit bias (natural-log
    units), shared across batch/heads - proportional attention for merged
    K/V tokens (softmax weight scales by exp(bias) = merged group size).

    layout="bhnd": q,k,v (B, H, N, D) -> (B, H, N, D).
    layout="nhd":  q,k,v (B, N, H, D) -> (B, N, H, D) - the qkv
    projection's natural reshape; the kernel reads strided (row, head)
    tiles directly so no head-major transpose is ever materialized.
    CAVEAT: Mosaic's TPU lowering currently rejects the per-head block
    shape this needs ((1, block, 1, D): the second-to-last block dim must
    be divisible by 8 or equal the array dim), so on real TPUs "nhd" only
    works under interpret=True; the model uses "bhnd" with explicit
    transposes until that restriction lifts.

    `valid_len` may be a traced scalar (read from SMEM in-kernel), so one
    compilation serves every actual frame count within a bucket.

    `rope_q` / `rope_k`: optional (cos, sin) tables of shape (Nq|Nk, D/2) -
    rotary embedding is then applied to the q/k tiles IN-KERNEL (identical
    math to modules.apply_rope), which avoids materializing roped q and k
    to HBM. Tables are shared across B and H.
    """
    if layout == "nhd" and not interpret:
        raise NotImplementedError(
            "layout='nhd' needs a (1, block, 1, D) BlockSpec that Mosaic's "
            "TPU lowering rejects (second-to-last block dim must divide 8 "
            "or equal the array dim); layout='packed' is the hardware "
            "answer to the same transposes (heads folded into lanes)")
    seq_ax = 2 if layout == "bhnd" else 1
    Nq = q.shape[seq_ax]
    Nk = k.shape[seq_ax]

    def roundup(x, m):
        return -(-x // m) * m

    if roundup(Nk, 128) <= min(block_k, 2304):
        # Whole key sequence in ONE k-block: the one-shot softmax kernel with
        # exact-fit padding. For frame attention (N~1041) this beats the
        # generic online-softmax tiling ~2x: no m/l accumulator traffic and
        # ~1% pad waste instead of 23/47% (measured 28 -> ~60 TF/s on v5e).
        block_k = max(128, roundup(Nk, 128))
        bq_cap = max(256, (6 * 1024 * 1024) // (4 * block_k) // 16 * 16)
        block_q = min(roundup(Nq, 16), bq_cap, 2048)
    else:
        # Long sequences (global attention): large tiles win.
        if Nq < 4 * block_q:
            block_q = max(128, min(block_q, 256))
        block_q = min(block_q, max(128, 1 << (Nq - 1).bit_length()))
        # Size block_k to the EVEN split of Nk rather than a fixed 2048:
        # with merged K/V (e.g. Nk=5329 at stride 8) the fixed tile pads
        # 15% of the key range (5329 -> 3x2048), and every padded column
        # still pays full QK^T/AV matmul cost in the straddle block. The
        # even split rounded to 256 lanes keeps pad waste ~1%
        # (5329 -> 3x1792 = 5376) at identical per-tile MXU efficiency.
        nk_b = -(-Nk // block_k)
        block_k = min(block_k, max(256, roundup(-(-Nk // nk_b), 256)))
        # Multi-block rope runs in-kernel with scratch caching (q rotated
        # once per q block, every k block rotated once per (batch, head)
        # on the first q sweep) - no pre-applied roped q/k round trips.
    return _flash_call(q, k, v, valid_len, block_q, block_k, interpret,
                       rope_q=rope_q, rope_k=rope_k, layout=layout,
                       kv_bias=kv_bias, qk_int8=qk_int8, softmax=softmax,
                       return_stats=return_stats, qk_ln=qk_ln,
                       qk_ln_eps=qk_ln_eps if qk_ln is not None else None,
                       num_heads=num_heads)


def attention(q, k, v, impl: str = "chunked", valid_len=None,
              interpret: bool = False, rope_q=None, rope_k=None,
              layout: str = "bhnd", kv_bias=None, qk_int8: bool = False,
              softmax: str = "online", qk_ln=None, qk_ln_eps: float = 1e-5,
              num_heads=None):
    """Dispatch by implementation name. See module docstring.

    Only "flash" consumes rope_q/rope_k (in-kernel rotary); callers using
    other impls must pre-apply rope and pass None. layout="nhd" ((B,N,H,D)
    tensors) is native for "flash"; other impls transpose at the boundary
    (they are the test/CPU fallbacks, not the TPU hot path).
    `kv_bias` (Nk,) adds a per-key logit bias (proportional attention).
    `qk_int8` (flash only) runs QK^T on the int8 MXU path - see
    flash_attention; other impls ignore it (they are the f32/bf16
    reference semantics the int8 path is tested against).
    `softmax` (flash only): "static" swaps the online running max for a
    precomputed logit bound on the multi-k-block path - see
    flash_attention; other impls compute a full exact softmax regardless.
    """
    if impl == "flash":
        return flash_attention(q, k, v, valid_len=valid_len,
                               interpret=interpret, rope_q=rope_q,
                               rope_k=rope_k, layout=layout, kv_bias=kv_bias,
                               qk_int8=qk_int8, softmax=softmax,
                               qk_ln=qk_ln, qk_ln_eps=qk_ln_eps,
                               num_heads=num_heads)
    assert rope_q is None
    assert qk_ln is None, "in-kernel qk-norm is flash-only; pre-apply LN"
    if layout == "packed":
        assert num_heads, "layout='packed' requires num_heads"
        B, Nq, HD = q.shape
        D = HD // num_heads

        def to_bhnd(t):
            return jnp.swapaxes(
                t.reshape(t.shape[0], t.shape[1], num_heads, D), 1, 2)

        q, k, v = to_bhnd(q), to_bhnd(k), to_bhnd(v)
    elif layout == "nhd":
        q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
    if impl == "naive":
        out = naive_attention(q, k, v, valid_len, kv_bias=kv_bias)
    elif impl == "chunked":
        out = chunked_attention(q, k, v, valid_len, kv_bias=kv_bias)
    elif impl == "flash_grad":
        # Differentiable flash (custom VJP + Pallas backward kernels):
        # the training path's kernel. Exact attention only - merging's
        # kv_bias and the int8 QK^T path are inference operating points.
        assert kv_bias is None and not qk_int8, \
            "flash_grad is the exact-attention training kernel"
        out = flash_attention_grad(q, k, v, valid_len=valid_len,
                                   softmax=softmax, interpret=interpret)
    else:
        raise ValueError(f"unknown attention impl {impl!r}")
    if layout == "packed":
        return jnp.swapaxes(out, 1, 2).reshape(out.shape[0], out.shape[2],
                                               -1)
    return jnp.swapaxes(out, 1, 2) if layout == "nhd" else out


# ---------------------------------------------------------------------------
# Differentiable flash attention (the training path's kernel)
#
# The inference kernels above are pallas_calls with no VJP, so training
# configs historically fell back to chunked_attention (XLA autodiff, full
# (chunk, Nk) logits materialized in the backward). flash_attention_grad
# is a jax.custom_vjp whose forward is the stats-returning flash kernel
# (out, m, l) and whose backward runs two Pallas kernels implementing the
# standard FlashAttention backward:
#
#     delta_i = rowsum(dO_i * O_i)
#     p_ij    = exp2(c2 * q_i.k_j - m_i) / l_i          (recomputed per tile)
#     dV_j    = sum_i p_ij^T dO_i
#     dL_ij   = p_ij * (dO_i V_j^T - delta_i)           (grad wrt logits/sqrt(D))
#     dQ_i    = sum_j dL_ij K_j / sqrt(D)
#     dK_j    = sum_i dL_ij^T Q_i / sqrt(D)
#
# Scope (the exact training configuration): bhnd layout, q/k pre-roped and
# pre-LN'd OUTSIDE (XLA differentiates those), no K/V merging bias, no
# int8. Both softmax modes work unchanged - the backward only needs the
# shift m the forward actually used.
#
# Per-row stats (m, 1/l, delta) ride ONE (Nq_pad, 3*BH) f32 operand with
# (block_q, 3*BH) tiles - the (1, block_q)-style per-(b,h) row layout that
# would be natural here violates Mosaic's last-two-dims tiling rule, so the
# rows sit on sublanes, (b,h) on lanes, and each kernel instance selects
# its lane with a one-hot reduction (3*BH lanes; negligible VPU work).


def _bwd_stats_cols(st_ref, b, BH):
    """(block_q, 3*BH) stats tile -> per-row (m, w, delta) columns of
    batch-head b via one-hot lane selection."""
    st = st_ref[...].astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, st.shape, 1)

    def sel(base):
        return jnp.sum(jnp.where(lane == base + b, st, 0.0), axis=1,
                       keepdims=True)

    return sel(0), sel(BH), sel(2 * BH)


def _flash_bwd_dq_kernel(vl_ref, st_ref, q_ref, k_ref, v_ref, do_ref,
                         dq_ref, acc_ref, *, block_k, num_k_blocks, BH,
                         c_scale, inv_sqrt_d):
    b = pl.program_id(0)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    m, w, delta = _bwd_stats_cols(st_ref, b, BH)
    q = _sq(q_ref)
    k = _sq(k_ref)
    v = _sq(v_ref)
    do = _sq(do_ref)
    s2 = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * c_scale
    col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1)
    p = jnp.where(col < vl_ref[0], jnp.exp2(s2 - m) * w, 0.0)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dl = p * (dp - delta)
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        dl.astype(q.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == num_k_blocks - 1)
    def _finish():
        dq_ref[...] = (acc_ref[:] * inv_sqrt_d).astype(dq_ref.dtype) \
            .reshape(dq_ref.shape)


def _flash_bwd_dkv_kernel(vl_ref, st_ref, q_ref, k_ref, v_ref, do_ref,
                          dk_ref, dv_ref, acck_ref, accv_ref, *, block_k,
                          num_q_blocks, BH, c_scale, inv_sqrt_d):
    b = pl.program_id(0)
    j = pl.program_id(1)
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        acck_ref[:] = jnp.zeros_like(acck_ref)
        accv_ref[:] = jnp.zeros_like(accv_ref)

    m, w, delta = _bwd_stats_cols(st_ref, b, BH)
    q = _sq(q_ref)
    k = _sq(k_ref)
    v = _sq(v_ref)
    do = _sq(do_ref)
    s2 = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * c_scale
    col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1)
    p = jnp.where(col < vl_ref[0], jnp.exp2(s2 - m) * w, 0.0)
    accv_ref[:] = accv_ref[:] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dl = (p * (dp - delta)).astype(q.dtype)
    acck_ref[:] = acck_ref[:] + jax.lax.dot_general(
        dl, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == num_q_blocks - 1)
    def _finish():
        dk_ref[...] = (acck_ref[:] * inv_sqrt_d).astype(dk_ref.dtype) \
            .reshape(dk_ref.shape)
        dv_ref[...] = accv_ref[:].astype(dv_ref.dtype).reshape(dv_ref.shape)


def _flash_bwd(q, k, v, out, m, l, do, valid_len, block_q, block_k,
               interpret):
    """Backward pass: q/k/v/out/do (B, H, N, D) + fwd stats -> dq, dk, dv."""
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    BH = B * H
    c_scale = math.log2(math.e) / math.sqrt(D)
    inv_sqrt_d = 1.0 / math.sqrt(D)

    pad_q = (-Nq) % block_q
    pad_k = (-Nk) % block_k
    nq_b = (Nq + pad_q) // block_q
    nk_b = (Nk + pad_k) // block_k

    def pad3(x, n):
        x = x.reshape(BH, x.shape[2], D)
        return jnp.pad(x, ((0, 0), (0, n), (0, 0))) if n else x

    qf, dof = pad3(q, pad_q), pad3(do, pad_q)
    kf, vf = pad3(k, pad_k), pad3(v, pad_k)

    # Per-row stats: m, w = 1/l, delta = rowsum(do * out). Padded q rows
    # carry w = 0, zeroing their p rows (and thus their dk/dv terms).
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)                              # (B, H, Nq)
    w = 1.0 / jnp.maximum(l, 1e-30)
    st = jnp.concatenate([m.reshape(BH, Nq), w.reshape(BH, Nq),
                          delta.reshape(BH, Nq)], axis=0)  # (3BH, Nq)
    st = jnp.pad(st, ((0, 0), (0, pad_q))).T              # (Nq_pad, 3BH)

    vl = jnp.minimum(
        jnp.asarray(Nk if valid_len is None else valid_len,
                    jnp.int32), Nk).reshape(1)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    q_spec3 = pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0))
    k_spec3 = pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0))
    st_specq = pl.BlockSpec((block_q, 3 * BH), lambda b, i, j: (i, 0))

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block_k,
                          num_k_blocks=nk_b, BH=BH, c_scale=c_scale,
                          inv_sqrt_d=inv_sqrt_d),
        grid=(BH, nq_b, nk_b),
        in_specs=[smem, st_specq, q_spec3, k_spec3, k_spec3, q_spec3],
        out_specs=q_spec3,
        out_shape=jax.ShapeDtypeStruct((BH, Nq + pad_q, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(vl, st, qf, kf, vf, dof)

    # dkv sweeps q blocks in the INNER grid axis (accumulators per k block).
    q_speckv = pl.BlockSpec((1, block_q, D), lambda b, j, i: (b, i, 0))
    k_speckv = pl.BlockSpec((1, block_k, D), lambda b, j, i: (b, j, 0))
    st_speckv = pl.BlockSpec((block_q, 3 * BH), lambda b, j, i: (i, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_k=block_k,
                          num_q_blocks=nq_b, BH=BH, c_scale=c_scale,
                          inv_sqrt_d=inv_sqrt_d),
        grid=(BH, nk_b, nq_b),
        in_specs=[smem, st_speckv, q_speckv, k_speckv, k_speckv, q_speckv],
        out_specs=[k_speckv, k_speckv],
        out_shape=[jax.ShapeDtypeStruct((BH, Nk + pad_k, D), k.dtype),
                   jax.ShapeDtypeStruct((BH, Nk + pad_k, D), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, D), jnp.float32),
                        pltpu.VMEM((block_k, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(vl, st, qf, kf, vf, dof)

    def unpad(x, n, npad):
        return x[:, :n].reshape(B, H, n, D)

    return unpad(dq, Nq, pad_q), unpad(dk, Nk, pad_k), unpad(dv, Nk, pad_k)


def flash_attention_grad(q, k, v, valid_len=None, softmax="online",
                         block_q=1024, block_k=1024, interpret=False):
    """Differentiable flash attention for the training path.

    q, k, v: (B, H, N, D), ALREADY roped/LN'd (those stay outside so XLA
    autodiffs them); returns (B, H, Nq, D). The softmax scale 1/sqrt(D) is
    applied internally (like the other impls). `valid_len` masks key
    suffixes exactly as in inference. No kv_bias/int8/merging - this is
    the exact-attention training configuration.
    """

    @jax.custom_vjp
    def _f(q, k, v):
        return _fwd(q, k, v)[0]

    def _fwd(q, k, v):
        out, m, l = flash_attention(
            q, k, v, valid_len=valid_len, block_q=block_q,
            block_k=max(block_k, 2048), interpret=interpret,
            softmax=softmax, return_stats=True)
        return out, (q, k, v, out, m, l)

    def _bwd(res, do):
        q, k, v, out, m, l = res
        return _flash_bwd(q, k, v, out, m, l, do, valid_len,
                          block_q, block_k, interpret)

    _f.defvjp(_fwd, _bwd)
    return _f(q, k, v)
