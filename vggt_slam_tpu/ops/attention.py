"""Multi-head attention for the VGGT alternating-attention trunk.

The global-attention blocks attend over all frames x all patches
(S*~1387 tokens, ~23k-46k at submap size 16/32 - SURVEY.md section 5.7): the
naive (N,N) logits matrix would need gigabytes, so the TPU hot path is a
Pallas flash-attention kernel (online softmax, f32 accumulators, bf16
operands on the MXU). Three interchangeable implementations:

* "flash":   Pallas TPU kernel (forward only; inference hot path).
* "chunked": XLA lax.map over query chunks - O(chunk*N) memory, fully
             differentiable; used for training and as the CPU fallback.
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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _key_mask(valid_len, nk):
    return jax.lax.broadcasted_iota(jnp.int32, (nk,), 0) < valid_len


def naive_attention(q, k, v, valid_len=None):
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, v.dtype.type(scale) * k,
                        preferred_element_type=jnp.float32)
    if valid_len is not None:
        mask = _key_mask(valid_len, k.shape[2])
        logits = jnp.where(mask[None, None, None, :], logits, _NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)


def chunked_attention(q, k, v, valid_len=None, chunk=1024):
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


def _flash_kernel(vl_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                  *, scale, block_k, num_k_blocks, masked):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # Keep matmul operands in bf16: the MXU runs bf16 x bf16 -> f32 at full
    # rate, while f32 operands drop it ~8x. Softmax statistics stay f32.
    q = q_ref[0]                                 # (block_q, D) bf16
    k = k_ref[0]                                 # (block_k, D) bf16
    v = v_ref[0]                                 # (block_k, D) bf16

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if masked:
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < vl_ref[0], s, _NEG_INF)

    m_prev = m_ref[:, :1]                        # (block_q, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)   # (block_q, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                       # (block_q, block_k) f32
    corr = jnp.exp(m_prev - m_new)               # (block_q, 1)
    l_new = corr * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == num_k_blocks - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret"),
)
def _flash_call(q, k, v, valid_len, block_q, block_k, interpret):
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    scale = 1.0 / math.sqrt(D)

    pad_q = (-Nq) % block_q
    pad_k = (-Nk) % block_k
    qf = q.reshape(B * H, Nq, D)
    kf = k.reshape(B * H, Nk, D)
    vf = v.reshape(B * H, Nk, D)
    if pad_q:
        qf = jnp.pad(qf, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        kf = jnp.pad(kf, ((0, 0), (0, pad_k), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pad_k), (0, 0)))
    nq_blocks = qf.shape[1] // block_q
    nk_blocks = kf.shape[1] // block_k

    masked = (valid_len is not None) or bool(pad_k)
    if valid_len is None:
        vl = jnp.full((1,), Nk, dtype=jnp.int32)
    else:
        vl = jnp.minimum(jnp.asarray(valid_len, jnp.int32), Nk).reshape(1)

    kernel = functools.partial(
        _flash_kernel, scale=scale, block_k=block_k,
        num_k_blocks=nk_blocks, masked=masked)

    out = pl.pallas_call(
        kernel,
        grid=(B * H, nq_blocks, nk_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, qf.shape[1], D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(vl, qf, kf, vf)
    return out[:, :Nq].reshape(B, H, Nq, D)


def flash_attention(q, k, v, valid_len=None, block_q=1024, block_k=1024,
                    interpret=False):
    """Pallas flash attention forward. q,k,v: (B, H, N, D) -> (B, H, N, D).

    `valid_len` may be a traced scalar (read from SMEM in-kernel), so one
    compilation serves every actual frame count within a bucket.
    """
    Nq = q.shape[2]
    Nk = k.shape[2]
    # Large blocks win on long sequences (global attention); short per-frame
    # sequences (~1k tokens) would waste half the pad at 1024, so shrink.
    if Nq < 4 * block_q:
        block_q = max(128, min(block_q, 256))
    if Nk < 4 * block_k:
        block_k = max(128, min(block_k, 512))
    block_q = min(block_q, max(128, 1 << (Nq - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (Nk - 1).bit_length()))
    return _flash_call(q, k, v, valid_len, block_q, block_k, interpret)


def attention(q, k, v, impl: str = "chunked", valid_len=None,
              interpret: bool = False):
    """Dispatch by implementation name. See module docstring."""
    if impl == "naive":
        return naive_attention(q, k, v, valid_len)
    if impl == "chunked":
        return chunked_attention(q, k, v, valid_len)
    if impl == "flash":
        return flash_attention(q, k, v, valid_len=valid_len, interpret=interpret)
    raise ValueError(f"unknown attention impl {impl!r}")
