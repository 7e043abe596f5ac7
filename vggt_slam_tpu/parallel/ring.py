"""Ring (sequence-parallel) self-attention over a mesh axis.

TPU-native scaling path for the aggregator's GLOBAL attention (SURVEY.md
section 2.4: "global attention shards cleanly over heads (TP) or sequence"):
with frames sharded over the mesh's "dp" axis, the frame-major token axis of
global attention is ALREADY sequence-sharded, so instead of letting XLA
all-gather the full (S*P, C) activations onto every chip at each of the 24
global blocks, each chip keeps its resident query chunk and the K/V chunks
rotate around the ring via `ppermute` - blockwise attention with online
log-sum-exp merging across steps (Liu et al., Ring Attention). Per-chip
memory stays O(N/dp) and the K/V transfer pipelines over ICI instead of
serializing as one all-gather.

Used by the exact-attention path only: with global K/V token merging the
keys/values shrink 4x, so the plain jit-sharding all-gather of the merged
set is already the right design there (parallel/infer.py).

The inner per-chunk attention is plain XLA (einsum in bf16/f32) rather than
the Pallas flash kernel: chunk sizes are N/dp so the logits tile is small,
and this path must also run on CPU meshes for testing; swapping the inner
op for a stats-returning flash kernel is a later optimization.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_NEG_INF = -1e30


def _ring_self_attention_local(q, k, v, *, axis: str, valid_len, scale):
    """Body run INSIDE shard_map: q/k/v are (B, H, Nl, D) LOCAL chunks.

    Step s processes the K/V chunk that originated on shard
    (my_index + s) % sp, whose global key offset is src * Nl; masking
    against `valid_len` (a replicated traced scalar) is applied in global
    coordinates.
    """
    sp = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    B, H, Nl, D = q.shape
    qf = q.astype(jnp.float32) * scale

    def step(s, carry):
        kc, vc, m, l, acc = carry
        # Rotate FIRST, into separate values: the ppermute has no data
        # dependence on this step's matmuls, so the next chunk's ICI
        # transfer can overlap the current chunk's compute (issuing it
        # after the compute would serialize comm behind each step).
        # Send our chunk to the left neighbor, receive from the right -
        # after s steps every shard holds chunk (me + s) % sp.
        perm = [(j, (j - 1) % sp) for j in range(sp)]
        kc_next = jax.lax.ppermute(kc, axis, perm)
        vc_next = jax.lax.ppermute(vc, axis, perm)
        # Pin every operand to int32: under jax_enable_x64 (leaked by
        # callers) the fori_loop index and python-int literals promote to
        # int64 and lax.rem refuses mixed dtypes.
        src = jax.lax.rem(me + jnp.asarray(s, jnp.int32), jnp.int32(sp))
        logits = jnp.einsum("bhqd,bhkd->bhqk", qf, kc.astype(jnp.float32))
        col = src * Nl + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 3)
        logits = jnp.where(col < valid_len, logits, _NEG_INF)
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        p = jnp.exp(logits - m_new)
        corr = jnp.exp(m - m_new)
        l = corr * l + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vc.astype(jnp.float32))
        m = m_new
        return kc_next, vc_next, m, l, acc

    m0 = jnp.full((B, H, Nl, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, H, Nl, 1), jnp.float32)
    a0 = jnp.zeros((B, H, Nl, D), jnp.float32)
    _, _, _, l, acc = jax.lax.fori_loop(0, sp, step, (k, v, m0, l0, a0))
    out = acc / jnp.maximum(l, 1e-30)
    return out.astype(q.dtype)


def ring_self_attention(q, k, v, mesh, axis: str = "dp", valid_len=None):
    """Sequence-parallel exact self-attention: (B, H, N, D) -> same.

    The token axis (2) is sharded over `mesh[axis]`; q stays resident and
    k/v rotate. `valid_len` (python int or traced int32 scalar) masks
    global key positions >= valid_len (bucket padding). N must divide the
    axis size. Exact softmax semantics - parity with naive attention is
    tested on an 8-device CPU mesh (tests/test_parallel.py).
    """
    N = q.shape[2]
    sp = mesh.shape[axis]
    if N % sp != 0:
        raise ValueError(f"token axis {N} not divisible by {axis}={sp}")
    scale = 1.0 / math.sqrt(q.shape[-1])
    # Uniform plumbing: "no masking" is valid_len = N (every key valid).
    vl = jnp.asarray(N if valid_len is None else valid_len,
                     jnp.int32).reshape(1)

    spec = P(None, None, axis, None)

    def body(a, b, c, w):
        return _ring_self_attention_local(a, b, c, axis=axis,
                                          valid_len=w[0], scale=scale)

    fn = jax.shard_map(body, mesh=mesh, in_specs=(spec, spec, spec, P()),
                       out_specs=spec, check_vma=False)
    return fn(q, k, v, vl)
