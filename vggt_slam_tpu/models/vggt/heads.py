"""VGGT output heads: camera pose (iterative refinement) and DPT dense heads.

Camera head: per the VGGT paper, the camera tokens from the final aggregator
depth are refined iteratively - each iteration embeds the current 9-D pose
encoding (the learned `empty_pose_tokens` on the first iteration), gates an
AdaLN modulation of the tokens WITH a residual (gate * modulate(norm(x)) + x)
before a small self-attention trunk over the S frames, and predicts a delta;
the first iteration's delta IS the prediction (not empty + delta). Output
encoding layout matches ops/geometry.py: [t(3), quat(4 wxyz), fov(2)] - all
three parts RAW (the released head's trans/quat/fov activations are linear;
quaternions are normalized downstream in quat_to_rotmat and fov feeds
tan(fov/2) directly in pose_encoding_to_extri_intri).

DPT heads: per-depth tokens from 4 captured aggregator layers are projected
(1x1 conv), resampled to 4 scales with LEARNED resize layers (ConvTranspose
x4 / x2, identity, strided conv x0.5 - the Depth-Anything DPT lineage the
released VGGT head derives from; parameter names mirror its state dict:
projects.N / resize_layers.N / scratch.layerN_rn / scratch.refinenetN /
scratch.output_conv1/2), fused coarse-to-fine with residual conv units
(resConfUnit1 applied to the skip branch, align-corners bilinear upsample
inside each refinenet), and decoded to (S, H, W, C_out) maps. Depth head
emits (depth, conf), point head ((x,y,z), conf); activations keep depth
positive and conf >= 1.

On top of the Depth-Anything structure, VGGT's DPT adds (both implemented):
a single shared LayerNorm (`norm`) applied to every captured token tensor
before its 1x1 projection, and a procedural sine/cosine UV positional
embedding (aspect-corrected [-span, span] grid, omega_0=100, scaled by
ratio=0.1) added after each projection conv and again after the final
full-resolution upsample.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from vggt_slam_tpu.models.vggt.config import VGGTConfig
from vggt_slam_tpu.models.vggt.modules import Block, Mlp


class CameraHead(nn.Module):
    cfg: VGGTConfig

    @nn.compact
    def __call__(self, tokens_last: jax.Array,
                 valid_frames=None) -> jax.Array:
        """tokens_last: (S, N, 2*agg_dim) final aggregator output.

        Returns pose encodings (S, 9) for every frame. The trunk attends
        across frames, so `valid_frames` masks padded-frame keys the same
        way the aggregator's global attention does.
        """
        cfg = self.cfg
        dim = 2 * cfg.agg_dim
        S = tokens_last.shape[0]
        cam = tokens_last[:, 0, :]  # camera token per frame
        cam = nn.LayerNorm(dtype=jnp.float32, epsilon=1e-5,
                           name="token_norm")(cam)
        cam = cam.astype(cfg.dtype)[None]  # (1, S, dim)

        empty = self.param("empty_pose_tokens", nn.initializers.zeros,
                           (1, 1, 9), jnp.float32)
        pred0 = jnp.tile(empty.astype(cfg.dtype), (1, S, 1))

        embed = nn.Dense(dim, dtype=cfg.dtype, name="embed_pose")
        mod = nn.Dense(3 * dim, dtype=cfg.dtype, name="modulation")
        trunk = [Block(dim, cfg.agg_heads, cfg.agg_mlp_ratio, layerscale=0.01,
                       dtype=cfg.dtype, name=f"trunk_{i}")
                 for i in range(cfg.cam_trunk_depth)]
        out_norm = nn.LayerNorm(dtype=jnp.float32, epsilon=1e-5,
                                name="trunk_norm")
        head = Mlp(dim // 2, 9, dtype=cfg.dtype, name="pose_branch")

        adaln = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                             dtype=jnp.float32, name="adaln_norm")

        vl = valid_frames
        pred = None
        for _ in range(cfg.cam_iterations):
            inp = pred0 if pred is None else \
                jax.lax.stop_gradient(pred).astype(cfg.dtype)
            m = mod(nn.silu(embed(inp)))
            shift, scale, gate = jnp.split(m, 3, axis=-1)
            # gate * modulate(adaln(x)) + x, THEN the trunk (the released
            # camera_head's trunk_fn ordering).
            h = gate * (adaln(cam).astype(cfg.dtype) * (1 + scale) + shift)
            h = h + cam
            for blk in trunk:
                h = blk(h, valid_len=vl)
            delta = head(out_norm(h).astype(cfg.dtype)).astype(jnp.float32)
            pred = delta if pred is None else pred + delta

        # Raw encoding: trans/quat/fov activations are linear in the
        # released head; consumers normalize the quaternion themselves.
        return pred[0]


def _uv_grid(w: int, h: int, aspect: float) -> jax.Array:
    """Aspect-corrected UV grid (h, w, 2) in [-span, span].

    The released DPT's create_uv_grid: the (u, v) spans are the sides of a
    unit-diagonal rectangle with the IMAGE's aspect ratio, and endpoints
    sit at pixel centers ((n-1)/n scaling).
    """
    diag = (aspect * aspect + 1.0) ** 0.5
    span_x, span_y = aspect / diag, 1.0 / diag
    xs = jnp.linspace(-span_x * (w - 1) / w, span_x * (w - 1) / w, w,
                      dtype=jnp.float32)
    ys = jnp.linspace(-span_y * (h - 1) / h, span_y * (h - 1) / h, h,
                      dtype=jnp.float32)
    uu = jnp.broadcast_to(xs[None, :], (h, w))
    vv = jnp.broadcast_to(ys[:, None], (h, w))
    return jnp.stack([uu, vv], axis=-1)


def _sincos_embed(dim: int, pos: jax.Array, omega0: float = 100.0):
    """1-D sine/cosine embedding (pos (M,) -> (M, dim)), omega_0 = 100."""
    omega = jnp.arange(dim // 2, dtype=jnp.float32) / (dim / 2.0)
    omega = 1.0 / (omega0 ** omega)
    out = pos[:, None] * omega[None, :]
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=-1)


def uv_pos_embed(w: int, h: int, aspect: float, dim: int) -> jax.Array:
    """(h, w, dim) positional embedding: sincos(u) || sincos(v)."""
    grid = _uv_grid(w, h, aspect).reshape(-1, 2)
    emb = jnp.concatenate([_sincos_embed(dim // 2, grid[:, 0]),
                           _sincos_embed(dim // 2, grid[:, 1])], axis=-1)
    return emb.reshape(h, w, dim)


def _interp_matrix(n_in: int, n_out: int) -> "np.ndarray":
    """(n_out, n_in) align-corners bilinear weights, two nonzeros per row."""
    import numpy as np
    pos = np.arange(n_out, dtype=np.float64) * \
        ((n_in - 1) / max(n_out - 1, 1))
    lo = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 2)
    frac = pos - lo
    A = np.zeros((n_out, n_in), np.float32)
    A[np.arange(n_out), lo] = 1.0 - frac
    A[np.arange(n_out), lo + 1] = frac
    return A


def resize_bilinear_align_corners(x: jax.Array, out_hw: tuple[int, int]):
    """Bilinear resize with align_corners=True on (S, h, w, C).

    torch's DPT interpolates with align_corners=True (endpoint-to-endpoint
    mapping); jax.image.resize only offers half-pixel centers. Implemented
    as two einsums against precomputed (static-shape) interpolation
    matrices: 2 nonzeros per output row, but the dense matmul rides the MXU
    and measures ~4x faster than the gather formulation at the head's
    production upsample (scripts/bench_dpt_ops.py: 7.3 vs 28.5 ms for
    112x148->392x518 at S=33, c=128).
    """
    def axis_interp(x, size, axis):
        n = x.shape[axis]
        if size == n:
            return x
        if n == 1:
            return jnp.repeat(x, size, axis)
        A = jnp.asarray(_interp_matrix(n, size), x.dtype)
        return jnp.einsum("shwc,Hh->sHwc" if axis == 1 else "shwc,Ww->shWc",
                          x, A)

    x = axis_interp(x, out_hw[0], 1)
    return axis_interp(x, out_hw[1], 2)


class _ConvTransposeUp(nn.Module):
    """ConvTranspose2d with kernel == stride (non-overlapping upsample).

    Implemented as an einsum so the semantics exactly match torch's
    ConvTranspose2d (out[.., i*k+a, j*k+b, :] += x[.., i, j, :] @ K[a, b])
    with kernel stored (k, k, in, out) - the converter maps torch's
    (in, out, k, k) with a plain (2,3,0,1) transpose, no flip ambiguity.
    """
    features: int
    k: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        S, h, w, ci = x.shape
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (self.k, self.k, ci, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        # lax.conv_transpose(transpose_kernel=False) convolves the
        # zero-dilated input with the kernel as given, which lands K[k-1-r]
        # on output phase r - the spatial flip of torch ConvTranspose2d's
        # K[r]. Flipping the stored kernel restores torch semantics
        # (verified in tests/test_heads_torch_parity.py); XLA's conv
        # lowering beats the equivalent einsum+reshape
        # (scripts/bench_dpt_ops.py).
        y = jax.lax.conv_transpose(
            x, kern[::-1, ::-1].astype(x.dtype), strides=(self.k, self.k),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(y.dtype)


class _ResidualConvUnit(nn.Module):
    features: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(h)
        return x + h


class _FeatureFusion(nn.Module):
    """DPT FeatureFusionBlock: x0 (deeper path) + resConfUnit1(skip),
    resConfUnit2, align-corners upsample to `out_hw`, 1x1 out_conv."""
    features: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x0, skip=None, out_hw=None):
        x = x0
        if skip is not None:
            x = x + _ResidualConvUnit(self.features, self.dtype,
                                      name="resConfUnit1")(skip)
        x = _ResidualConvUnit(self.features, self.dtype, name="resConfUnit2")(x)
        if out_hw is None:
            out_hw = (2 * x.shape[1], 2 * x.shape[2])
        x = resize_bilinear_align_corners(x, out_hw)
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out_conv")(x)
        return x


class _Conv1x1CF(nn.Module):
    """1x1 conv with CHANNEL-FIRST output: (S,H,W,K) -> (C,S,H,W) f32.

    Parameter layout matches nn.Conv ((1,1,K,C) kernel + (C,) bias) so the
    torch-checkpoint converter needs no special case.
    """
    features: int

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, x.shape[-1], self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        y = jnp.einsum("shwk,kc->cshw", x.astype(jnp.float32), k[0, 0])
        return y + b[:, None, None, None]


class DPTHead(nn.Module):
    """Dense prediction head over captured aggregator depths.

    Returns RAW predictions CHANNEL-FIRST: (out_channels, S, H, W) f32."""
    cfg: VGGTConfig
    out_channels: int  # e.g. 2 for depth+conf, 4 for xyz+conf

    @nn.compact
    def __call__(self, captured: dict, image_hw: tuple[int, int]) -> jax.Array:
        cfg = self.cfg
        H, W = image_hw
        h, w = cfg.patch_grid(H, W)
        ns = captured["patch_start"]
        n = len(cfg.dpt_layers)
        # ONE LayerNorm shared by every captured depth (the torch head's
        # single self.norm module).
        in_norm = nn.LayerNorm(dtype=jnp.float32, epsilon=1e-5, name="norm")

        def add_pos(x):
            pe = uv_pos_embed(x.shape[2], x.shape[1], W / H, x.shape[-1])
            return x + (0.1 * pe[None]).astype(x.dtype)

        feats = []
        for li, d in enumerate(cfg.dpt_layers):
            t = captured[d][:, ns:, :]  # (S, P, 2C) patch tokens
            S = t.shape[0]
            oc = cfg.dpt_out_channels[li]
            t = in_norm(t).astype(cfg.dtype)
            x = t.reshape(S, h, w, t.shape[-1])
            x = nn.Conv(oc, (1, 1), dtype=cfg.dtype, name=f"projects_{li}")(x)
            x = add_pos(x)
            # Learned resize to the layer's scale. Fewer captured layers
            # (tiny config) use the TAIL of the 4-layer spec; names carry
            # the torch resize_layers index.
            spec = li + 4 - n
            if spec == 0:
                x = _ConvTransposeUp(oc, 4, cfg.dtype, name="resize_0")(x)
            elif spec == 1:
                x = _ConvTransposeUp(oc, 2, cfg.dtype, name="resize_1")(x)
            elif spec == 3:
                # torch: Conv2d(k=3, stride=2, padding=1); explicit (1,1)
                # padding reproduces its output positions exactly.
                x = nn.Conv(oc, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), dtype=cfg.dtype,
                            name="resize_3")(x)
            x = nn.Conv(cfg.dpt_features, (3, 3), padding="SAME",
                        use_bias=False, dtype=cfg.dtype,
                        name=f"layer_rn_{li}")(x)
            feats.append(x)

        # Coarse-to-fine fusion; torch numbers refinenets finest-first:
        # refinenet4 consumes the DEEPEST capture alone (li=3 -> name 4),
        # refinenet1 the finest, each stage upsampling to the next skip's
        # grid (the finest doubles).
        path = None
        for li in reversed(range(n)):
            out_hw = feats[li - 1].shape[1:3] if li > 0 else None
            fusion = _FeatureFusion(cfg.dpt_features, cfg.dtype,
                                    name=f"refinenet{li + 1}")
            if path is None:
                path = fusion(feats[li], None, out_hw)
            else:
                path = fusion(path, feats[li], out_hw)

        x = nn.Conv(cfg.dpt_features // 2, (3, 3), padding="SAME",
                    dtype=cfg.dtype, name="output_conv1")(path)
        x = resize_bilinear_align_corners(x, (H, W))
        x = add_pos(x)
        x = nn.Conv(32, (3, 3), padding="SAME", dtype=cfg.dtype,
                    name="output_conv2_0")(x)
        x = nn.relu(x)
        # Final 1x1 conv emitted CHANNEL-FIRST: a channels-last
        # (S, H, W, 2..4) buffer tiles its minor dim to 128 lanes (~42x
        # physical size - the write alone measured ~8.6 ms at S=33);
        # (C, S, H, W) is unpadded and is also the fast boundary layout
        # (ARCHITECTURE.md section 8). Param paths stay nn.Conv-identical
        # for the torch converter.
        return _Conv1x1CF(self.out_channels, name="output_conv2_2")(x)


def activate_depth(raw_cf: jax.Array):
    """raw (2,S,H,W) channel-first -> depth (S,H,W,1) > 0, conf (S,H,W) >= 1.

    ("exp" depth activation + "expp1" conf, the released model's choices.)
    """
    depth = jnp.exp(jnp.clip(raw_cf[0], -10.0, 10.0))[..., None]
    conf = 1.0 + jnp.exp(jnp.clip(raw_cf[1], -10.0, 10.0))
    return depth, conf


def activate_points(raw_cf: jax.Array):
    """raw (4,S,H,W) -> points (3,S,H,W) CHANNEL-FIRST via sign-expm1
    ("inv_log"), conf (S,H,W) >= 1."""
    xyz = raw_cf[0:3]
    pts = jnp.sign(xyz) * jnp.expm1(jnp.clip(jnp.abs(xyz), 0.0, 10.0))
    conf = 1.0 + jnp.exp(jnp.clip(raw_cf[3], -10.0, 10.0))
    return pts, conf
