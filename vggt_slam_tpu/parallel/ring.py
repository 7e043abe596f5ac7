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

The per-chunk inner op is the Pallas flash kernel in stats-returning mode
on TPU (ops/attention.flash_attention(return_stats=True): each chunk's
partial softmax comes back as (out, m, l) and merges exactly across ring
steps), and a small einsum with the same exp2-domain stats on CPU meshes
(tests). Scaling model and the exact-attention multi-chip arithmetic:
ARCHITECTURE.md "Ring attention" section.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_NEG_INF = -1e30


def _chunk_stats_einsum(q2, kc, vc, vl_local):
    """Exact per-chunk attention with exp2-domain softmax stats.

    q2: (B, H, Nl, D) f32 with log2(e)/sqrt(D) pre-folded; kc/vc one K/V
    chunk; vl_local masks chunk-local key positions >= vl_local. Returns
    (out, m, l) with out normalized within the chunk - the same contract
    as flash_attention(return_stats=True), so the ring merge below serves
    both inner ops.
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q2, kc.astype(jnp.float32))
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
    s = jnp.where(col < vl_local, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)            # (B, H, Nl, 1)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vc.astype(jnp.float32))
    return o / jnp.maximum(l, 1e-30), m, l


def _chunk_stats_flash(q, kc, vc, vl_local):
    """Stats-returning Pallas flash kernel on one K/V chunk (TPU)."""
    from vggt_slam_tpu.ops.attention import flash_attention
    o, m, l = flash_attention(q, kc, vc, valid_len=vl_local,
                              return_stats=True)
    return o.astype(jnp.float32), m[..., None], l[..., None]


def _chunk_stats_flash_packed(q, kc, vc, vl_local, *, num_heads):
    """Packed-layout ((B, Nl, H*D)) stats-returning flash kernel: the
    projections' native layout crosses the kernel boundary with zero
    transposes (the win measured at 1437->1264 ms/submap on the
    single-chip path — ARCHITECTURE.md §9 'layout=packed'). Stats come
    back per head ((B, H, Nl)); the packed ring merge broadcasts them
    into the lane domain."""
    from vggt_slam_tpu.ops.attention import flash_attention
    o, m, l = flash_attention(q, kc, vc, valid_len=vl_local,
                              return_stats=True, layout="packed",
                              num_heads=num_heads)
    return o.astype(jnp.float32), m, l


def _chunk_stats_einsum_packed(q2, kc, vc, vl_local, *, num_heads):
    """CPU-mesh packed inner: same contract as the flash packed inner
    ((B, Nl, H*D) out, (B, H, Nl) stats), computed via the bhnd einsum."""
    B, Nl, HD = q2.shape
    D = HD // num_heads

    def to_bhnd(t):
        return jnp.swapaxes(
            t.reshape(B, t.shape[1], num_heads, D), 1, 2)

    o, m, l = _chunk_stats_einsum(to_bhnd(q2), to_bhnd(kc), to_bhnd(vc),
                                  vl_local)
    o = jnp.swapaxes(o, 1, 2).reshape(B, Nl, HD)
    return o, m[..., 0], l[..., 0]


def _ring_self_attention_local(q, k, v, *, axis: str, valid_len, inner):
    """Body run INSIDE shard_map: q/k/v are (B, H, Nl, D) LOCAL chunks.

    Step s processes the K/V chunk that originated on shard
    (my_index + s) % sp, whose global key offset is src * Nl; masking
    against `valid_len` (a replicated traced scalar) is applied by
    translating it into that chunk's local coordinates.
    """
    sp = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    B, H, Nl, D = q.shape
    # Send our chunk to the left neighbor, receive from the right -
    # after s steps every shard holds chunk (me + s) % sp.
    perm = [(j, (j - 1) % sp) for j in range(sp)]

    def attend(s, kc, vc, m, l, acc):
        # Pin every operand to int32: under jax_enable_x64 (leaked by
        # callers) the fori_loop index and python-int literals promote to
        # int64 and lax.rem refuses mixed dtypes.
        src = jax.lax.rem(me + jnp.asarray(s, jnp.int32), jnp.int32(sp))
        vl_local = jnp.clip(valid_len - src * Nl, 0, Nl)
        o_s, m_s, l_s = inner(q, kc, vc, vl_local)
        m_new = jnp.maximum(m, m_s)
        c_prev = jnp.exp2(m - m_new)
        c_s = l_s * jnp.exp2(m_s - m_new)
        acc = acc * c_prev + o_s * c_s
        l = l * c_prev + c_s
        return m_new, l, acc

    def step(s, carry):
        kc, vc, m, l, acc = carry
        # Rotate FIRST, into separate values: the ppermute has no data
        # dependence on this step's matmuls, so the next chunk's ICI
        # transfer can overlap the current chunk's compute (issuing it
        # after the compute would serialize comm behind each step).
        kc_next = jax.lax.ppermute(kc, axis, perm)
        vc_next = jax.lax.ppermute(vc, axis, perm)
        m, l, acc = attend(s, kc, vc, m, l, acc)
        return kc_next, vc_next, m, l, acc

    m0 = jnp.full((B, H, Nl, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, H, Nl, 1), jnp.float32)
    a0 = jnp.zeros((B, H, Nl, D), jnp.float32)
    # The LAST chunk needs no rotate (its successor is never consumed), so
    # the loop runs the first sp-1 steps and the final attend is peeled -
    # one fewer full K/V ppermute pair per ring.
    kc, vc, m, l, acc = jax.lax.fori_loop(0, sp - 1, step,
                                          (k, v, m0, l0, a0))
    _, l, acc = attend(sp - 1, kc, vc, m, l, acc)
    out = acc / jnp.maximum(l, 1e-30)
    return out.astype(v.dtype)  # v keeps the caller dtype (q may be f32)


def _ring_self_attention_local_packed(q, k, v, *, axis: str, valid_len,
                                      inner, num_heads: int):
    """Packed-layout ring body run INSIDE shard_map: q/k/v are
    (B, Nl, H*D) LOCAL chunks (token axis 1 sharded). Identical online
    log-sum-exp merge as the bhnd body, with the per-head (B, H, Nl)
    stats broadcast into the lane domain (each head's scalar repeated
    across its D lanes) so the accumulator keeps the projections' native
    packed layout end to end — no (B, H, N, D) transposes anywhere on
    the multi-chip exact path."""
    sp = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    B, Nl, HD = q.shape
    D = HD // num_heads
    perm = [(j, (j - 1) % sp) for j in range(sp)]

    def lanes(w):
        # (B, H, Nl) per-head weights -> (B, Nl, H*D) lane broadcast.
        return jnp.repeat(jnp.swapaxes(w, 1, 2), D, axis=-1,
                          total_repeat_length=HD)

    def attend(s, kc, vc, m, l, acc):
        src = jax.lax.rem(me + jnp.asarray(s, jnp.int32), jnp.int32(sp))
        vl_local = jnp.clip(valid_len - src * Nl, 0, Nl)
        o_s, m_s, l_s = inner(q, kc, vc, vl_local)   # (B,Nl,HD),(B,H,Nl)x2
        m_new = jnp.maximum(m, m_s)
        c_prev = jnp.exp2(m - m_new)
        c_s = l_s * jnp.exp2(m_s - m_new)
        acc = acc * lanes(c_prev) + o_s * lanes(c_s)
        l = l * c_prev + c_s
        return m_new, l, acc

    def step(s, carry):
        kc, vc, m, l, acc = carry
        kc_next = jax.lax.ppermute(kc, axis, perm)
        vc_next = jax.lax.ppermute(vc, axis, perm)
        m, l, acc = attend(s, kc, vc, m, l, acc)
        return kc_next, vc_next, m, l, acc

    m0 = jnp.full((B, num_heads, Nl), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, num_heads, Nl), jnp.float32)
    a0 = jnp.zeros((B, Nl, HD), jnp.float32)
    kc, vc, m, l, acc = jax.lax.fori_loop(0, sp - 1, step,
                                          (k, v, m0, l0, a0))
    _, l, acc = attend(sp - 1, kc, vc, m, l, acc)
    out = acc * lanes(1.0 / jnp.maximum(l, 1e-30))
    return out.astype(v.dtype)


def ring_self_attention(q, k, v, mesh, axis: str = "dp", valid_len=None,
                        inner: str = "auto", layout: str = "bhnd",
                        num_heads=None):
    """Sequence-parallel exact self-attention.

    layout="bhnd": q/k/v are (B, H, N, D), token axis 2 sharded.
    layout="packed": q/k/v are (B, N, H*D) — the qkv projections' native
    output (requires `num_heads`), token axis 1 sharded; the inner flash
    kernel then runs its packed-heads path with ZERO boundary transposes
    (the layout the single-chip path ships — ARCHITECTURE.md §9) and the
    ring merge broadcasts the per-head stats into the lane domain.

    q stays resident and k/v rotate. `valid_len` (python int or traced
    int32 scalar) masks global key positions >= valid_len (bucket
    padding). Token counts that don't divide the axis size are padded to
    the next multiple and masked (padding is appended, so real keys keep
    their global positions). `inner` picks the per-chunk op: "flash"
    (Pallas kernel, TPU), "einsum" (XLA, any backend), or "auto" (flash
    iff the default backend is TPU). Exact softmax semantics - parity
    with naive attention is tested on an 8-device CPU mesh
    (tests/test_parallel.py).
    """
    packed = layout == "packed"
    if packed:
        assert num_heads, "layout='packed' requires num_heads"
    tok_ax = 1 if packed else 2
    N = q.shape[tok_ax]
    sp = mesh.shape[axis]
    # Uniform plumbing: "no masking" is valid_len = N (every key valid).
    vl = jnp.asarray(N if valid_len is None else valid_len,
                     jnp.int32).reshape(1)
    pad = (-N) % sp
    if pad:
        cfgpad = [(0, 0)] * q.ndim
        cfgpad[tok_ax] = (0, pad)
        q, k, v = (jnp.pad(t, cfgpad) for t in (q, k, v))
        vl = jnp.minimum(vl, N)  # padded keys are never valid

    if inner == "auto":
        inner = "flash" if jax.default_backend() == "tpu" else "einsum"
    head_dim = (q.shape[-1] // num_heads) if packed else q.shape[-1]
    if inner == "flash":
        inner_fn = (functools.partial(_chunk_stats_flash_packed,
                                      num_heads=num_heads)
                    if packed else _chunk_stats_flash)
        prep = lambda x: x  # noqa: E731 - kernel folds the scale itself
    else:
        c_scale = math.log2(math.e) / math.sqrt(head_dim)
        inner_fn = (functools.partial(_chunk_stats_einsum_packed,
                                      num_heads=num_heads)
                    if packed else _chunk_stats_einsum)
        prep = lambda x: x.astype(jnp.float32) * c_scale  # noqa: E731

    if packed:
        spec = P(None, axis, None)
        body = functools.partial(_ring_self_attention_local_packed,
                                 axis=axis, inner=inner_fn,
                                 num_heads=num_heads)
    else:
        spec = P(None, None, axis, None)
        body = functools.partial(_ring_self_attention_local, axis=axis,
                                 inner=inner_fn)

    def fn_body(a, b, c, w):
        return body(prep(a), b, c, valid_len=w[0])

    fn = jax.shard_map(fn_body, mesh=mesh, in_specs=(spec, spec, spec, P()),
                       out_specs=spec, check_vma=False)
    out = fn(q, k, v, vl)
    if not pad:
        return out
    return out[:, :N] if packed else out[:, :, :N]
