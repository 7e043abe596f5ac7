"""Transformer building blocks shared by the VGGT encoder, aggregator and heads.

flax.linen modules with a bf16 compute / f32 parameter policy. LayerNorms run
in f32 for numerical stability regardless of compute dtype.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from vggt_slam_tpu.ops import attention as attn_ops


def rope_2d_angles(positions: jax.Array, head_dim: int, base: float):
    """Rotary angles for 2D (y, x) positions.

    Args:
        positions: (N, 2) float (y, x) patch coordinates.
        head_dim: per-head dim; half rotates with y, half with x.
    Returns:
        (cos, sin) each (N, head_dim // 2).
    """
    d_axis = head_dim // 4  # frequency count per axis (pairs rotate)
    freq = 1.0 / (base ** (jnp.arange(d_axis, dtype=jnp.float32) / d_axis))
    ang_y = positions[:, 0:1] * freq[None, :]  # (N, d_axis)
    ang_x = positions[:, 1:2] * freq[None, :]
    ang = jnp.concatenate([ang_y, ang_x], axis=-1)  # (N, head_dim//2)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply rotary embedding. x: (..., N, D); cos/sin: (N, D//2)."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    c = cos.astype(x.dtype)
    s = sin.astype(x.dtype)
    return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)


class _LNParams(nn.Module):
    """Parameter container matching nn.LayerNorm's param tree ("scale",
    "bias") so converter name mappings are identical whether the qk-norm
    runs as a standalone pass or fused into the flash kernel's tile prep."""
    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones,
                           (self.dim,), jnp.float32),
                self.param("bias", nn.initializers.zeros,
                           (self.dim,), jnp.float32))


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        # tanh-approximate GELU: on v5e the exact erf costs ~3 ms per MLP at
        # 17k tokens while the tanh form fuses to ~3 us (measured); the
        # difference is < 1e-3 relative, far below bf16 inference noise.
        x = nn.gelu(x, approximate=True)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        return x


class LayerScale(nn.Module):
    dim: int
    init_value: float

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init_value),
                           (self.dim,), jnp.float32)
        return x * gamma.astype(x.dtype)


class Attention(nn.Module):
    """Standard multi-head self-attention with optional 2D RoPE.

    `rope_cos`/`rope_sin` are FULL-LENGTH (N, head_dim//2) angle tables:
    special tokens (camera/register) carry identity rotations (cos=1, sin=0),
    so token order stays frame-major and suffix padding masks with a single
    `valid_len` in the flash kernel.
    """
    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "chunked"
    qkv_bias: bool = True
    qk_norm: bool = False
    # torch nn.LayerNorm default; DINOv2-lineage modules pass 1e-6.
    ln_eps: float = 1e-5
    # int8 QK^T on the flash kernel's multi-k-block (global) path; see
    # ops/attention.flash_attention. No effect on other impls/paths.
    qk_int8: bool = False
    # "static" drops the flash kernel's running-max pass in favor of a
    # precomputed per-(batch,head) logit bound (exact softmax up to an fp
    # exponent shift; requires ~uniform row norms, i.e. qk_norm). Flash
    # multi-k-block path only; see ops/attention.flash_attention.
    softmax_mode: str = "online"
    # Sequence-parallel exact attention: with a mesh set (and no K/V
    # merging), the token axis stays sharded over `seq_axis` and K/V
    # chunks rotate via ppermute (parallel/ring.py) instead of XLA
    # all-gathering the full sequence onto every chip.
    seq_mesh: Optional[object] = None
    seq_axis: str = "dp"

    @nn.compact
    def __call__(self, x, rope_cos=None, rope_sin=None,
                 valid_len: Optional[int] = None, kv_map=None,
                 kv_valid_len=None, kv_rope_cos=None, kv_rope_sin=None,
                 kv_bias=None):
        """Self-attention; `kv_map` (callable (B, N, C) -> (B, n_kv, C))
        restricts/merges keys and values to a reduced token set (global K/V
        token merging) while queries stay dense; `kv_bias` (n_kv,) adds a
        per-key logit bias (proportional attention for merged groups). The
        fused qkv parameter layout is kept (torch-converter compatible
        paths attn/qkv/{kernel,bias}); the k/v projection only runs on the
        reduced set (projection is linear, so merging token means BEFORE
        the projection equals merging keys/values)."""
        B, N, C = x.shape
        H = self.num_heads
        Dh = C // H

        if self.softmax_mode == "static" and not self.qk_norm:
            # The static-max flash softmax replaces the running row max with
            # a Cauchy-Schwarz bound over row norms; without qk-norm one
            # outlier-norm key row inflates the bound for the whole (batch,
            # head) and can silently flush entire attention rows to zero.
            import warnings
            warnings.warn(
                "softmax_mode='static' without qk_norm: the static logit "
                "bound is only sound for ~uniform q/k row norms; rows whose "
                "true max logit sits >120 log2 units below the bound flush "
                "to zero SILENTLY. Use qk_norm=True or softmax_mode="
                "'online'.", RuntimeWarning, stacklevel=2)

        kernel = _FusedQKV(C, use_bias=self.qkv_bias, name="qkv")()
        qkv_kernel, qkv_bias = kernel
        qkv_kernel = qkv_kernel.astype(self.dtype)

        # Separate q/k/v projections from the fused parameter: one
        # interleaved (N,2,H,D) kv tensor would force strided slice copies
        # when splitting; three plain dots leave each output in the (B, N,
        # H, Dh) layout the flash kernel reads natively (no transposes).
        kv_src = x if kv_map is None else kv_map(x)
        q = x @ qkv_kernel[:, :C]
        k = kv_src @ qkv_kernel[:, C:2 * C]
        v = kv_src @ qkv_kernel[:, 2 * C:]
        if qkv_bias is not None:
            qkv_bias = qkv_bias.astype(self.dtype)
            q = q + qkv_bias[:C]
            k = k + qkv_bias[C:2 * C]
            v = v + qkv_bias[2 * C:]
        # Layout: the flash path consumes the projections' NATIVE
        # (B, N, H*Dh) output directly (attention.py layout="packed" -
        # heads fold into the lane dim in 128-lane groups), so q/k/v and
        # the attention output cross HBM with ZERO transposes/reshapes.
        # The ring (sequence-parallel) path keeps the same packed layout
        # when its inner op is the flash kernel (parallel/ring.py
        # layout="packed" — stats-returning packed kernels merge across
        # K/V rotations), so the multi-chip exact path pays no boundary
        # transposes either. Non-flash impls take head-major (B,H,N,Dh).
        use_ring = self.seq_mesh is not None and kv_map is None
        use_packed = self.attn_impl == "flash"
        Nk = k.shape[1]
        if not use_packed:
            q = jnp.swapaxes(q.reshape(B, N, H, Dh), 1, 2)      # (B,H,N,Dh)
            k = jnp.swapaxes(k.reshape(B, Nk, H, Dh), 1, 2)
            v = jnp.swapaxes(v.reshape(B, Nk, H, Dh), 1, 2)

        # Per-head LayerNorm over head_dim, BEFORE rotary embedding (matches
        # the released VGGT attention: qkv -> q_norm/k_norm -> rope). On the
        # flash path with in-kernel rope the LN fuses into the kernel's
        # q/k tile prep (ops/attention.py qk_ln) - the standalone pass costs
        # two full HBM round trips of q per block; elsewhere it runs here in
        # f32 with identical numerics.
        fuse_ln = False
        qk_ln = None
        if self.qk_norm:
            gq_ln, bq_ln = _LNParams(Dh, name="q_norm")()
            gk_ln, bk_ln = _LNParams(Dh, name="k_norm")()
            fuse_ln = (self.attn_impl == "flash" and not use_ring
                       and rope_cos is not None and not self.qk_int8)
            if fuse_ln:
                qk_ln = (gq_ln, bq_ln, gk_ln, bk_ln)
            else:
                # Same numerics as the fused path: attn_ops._ln_in_kernel
                # is the ONE implementation of this LayerNorm (f32 fast-
                # variance stats, output in the input dtype).
                def _ln(t, n, g, b_):
                    hd = t.reshape(B, n, H, Dh) if use_packed else t
                    hd = attn_ops._ln_in_kernel(hd, g, b_, self.ln_eps)
                    return hd.reshape(B, n, C) if use_packed else hd

                q = _ln(q, N, gq_ln, bq_ln)
                k = _ln(k, Nk, gk_ln, bk_ln)

        if kv_map is None:
            kv_rope_cos, kv_rope_sin = rope_cos, rope_sin
            kv_valid_len = valid_len

        # Sequence-parallel ring attention (use_ring above) takes the exact
        # (unmerged) path when a mesh is configured: tokens stay sharded,
        # K/V rotate over ICI (parallel/ring.py). With K/V merging the
        # reduced set is 4x smaller, so the plain jit-sharding all-gather
        # remains the right design and the regular dispatch below handles
        # it.

        # The flash kernel applies rotary in-kernel from the tiny shared
        # tables (ops/attention.py), skipping two full HBM round trips of
        # roped q/k per block; other impls (and the ring path) pre-apply.
        rope_q = rope_k = None
        if rope_cos is not None:
            if self.attn_impl == "flash" and not use_ring:
                rope_q = (rope_cos, rope_sin)
                rope_k = (kv_rope_cos, kv_rope_sin)
            elif use_packed:
                # Ring path keeps the packed layout but must pre-apply
                # rope with GLOBAL positions (K/V chunks rotate between
                # shards, so in-kernel per-chunk tables would need
                # rotation-dependent slices). Per-head view + broadcast
                # tables; XLA fuses this into the projection epilogue.
                def _rope_packed(t, n, c, s):
                    hd = t.reshape(B, n, H, Dh)
                    hd = apply_rope(hd, c[:, None, :], s[:, None, :])
                    return hd.reshape(B, n, C)

                q = _rope_packed(q, N, rope_cos, rope_sin)
                k = _rope_packed(k, Nk, kv_rope_cos, kv_rope_sin)
            else:
                q = apply_rope(q, rope_cos, rope_sin)
                k = apply_rope(k, kv_rope_cos, kv_rope_sin)

        if use_ring:
            from vggt_slam_tpu.parallel.ring import ring_self_attention
            out = ring_self_attention(q, k, v, self.seq_mesh,
                                      axis=self.seq_axis,
                                      valid_len=kv_valid_len,
                                      layout="packed" if use_packed
                                      else "bhnd", num_heads=H)
        else:
            interpret = jax.default_backend() != "tpu"
            out = attn_ops.attention(q, k, v, impl=self.attn_impl,
                                     valid_len=kv_valid_len,
                                     interpret=interpret,
                                     rope_q=rope_q, rope_k=rope_k,
                                     kv_bias=kv_bias, qk_int8=self.qk_int8,
                                     softmax=self.softmax_mode,
                                     qk_ln=qk_ln, qk_ln_eps=self.ln_eps,
                                     layout="packed" if use_packed
                                     else "bhnd", num_heads=H)
        if not use_packed:
            out = jnp.swapaxes(out, 1, 2).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class _FusedQKV(nn.Module):
    """Parameter container with nn.Dense-compatible init and param paths."""
    dim: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.dim, 3 * self.dim), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (3 * self.dim,), jnp.float32) if self.use_bias else None
        return kernel, bias


class Block(nn.Module):
    """Pre-norm transformer block with optional LayerScale."""
    dim: int
    num_heads: int
    mlp_ratio: int = 4
    layerscale: Optional[float] = None
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "chunked"
    qk_norm: bool = False
    ln_eps: float = 1e-5  # torch default; DINOv2-lineage blocks pass 1e-6
    qk_int8: bool = False  # int8 QK^T (flash global path only)
    softmax_mode: str = "online"  # "static": bound-based flash softmax
    seq_mesh: Optional[object] = None  # ring attention mesh (see Attention)
    seq_axis: str = "dp"

    @nn.compact
    def __call__(self, x, rope_cos=None, rope_sin=None,
                 valid_len: Optional[int] = None, kv_map=None,
                 kv_valid_len=None, kv_rope_cos=None, kv_rope_sin=None,
                 kv_bias=None):
        def ls(name):
            if self.layerscale is None:
                return lambda y: y
            return LayerScale(self.dim, self.layerscale, name=name)

        h = nn.LayerNorm(dtype=jnp.float32, epsilon=self.ln_eps,
                         name="norm1")(x).astype(self.dtype)
        h = Attention(self.dim, self.num_heads, dtype=self.dtype,
                      attn_impl=self.attn_impl, qk_norm=self.qk_norm,
                      ln_eps=self.ln_eps, qk_int8=self.qk_int8,
                      softmax_mode=self.softmax_mode,
                      seq_mesh=self.seq_mesh, seq_axis=self.seq_axis,
                      name="attn")(
            h, rope_cos, rope_sin, valid_len, kv_map=kv_map,
            kv_valid_len=kv_valid_len, kv_rope_cos=kv_rope_cos,
            kv_rope_sin=kv_rope_sin, kv_bias=kv_bias)
        x = x + ls("ls1")(h)
        h = nn.LayerNorm(dtype=jnp.float32, epsilon=self.ln_eps,
                         name="norm2")(x).astype(self.dtype)
        h = Mlp(self.dim * self.mlp_ratio, self.dim, dtype=self.dtype,
                name="mlp")(h)
        x = x + ls("ls2")(h)
        return x
