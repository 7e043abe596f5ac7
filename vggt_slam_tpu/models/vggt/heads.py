"""VGGT output heads: camera pose (iterative refinement) and DPT dense heads.

Camera head: per the VGGT paper, the camera tokens from the final aggregator
depth are refined iteratively - each iteration embeds the current 9-D pose
encoding, modulates a small self-attention trunk over the S frames with
AdaLN (shift/scale/gate), and predicts a delta. Output encoding layout
matches ops/geometry.py: [t(3), quat(4 wxyz), fov(2)].

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

Known unverifiables (no access to the released checkpoint or the vggt
package here): whether VGGT's DPT adds an input LayerNorm or a procedural
UV positional embedding on top of the Depth-Anything structure. Neither is
implemented; if the real state dict carries e.g. `depth_head.norm.*` keys
the converter reports them unused - treat that as the signal to revisit.
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
        cam = nn.LayerNorm(dtype=jnp.float32, name="token_norm")(cam)
        cam = cam.astype(cfg.dtype)[None]  # (1, S, dim)

        empty = self.param("empty_pose_tokens", nn.initializers.zeros,
                           (1, 1, 9), jnp.float32)
        pred = jnp.tile(empty.astype(jnp.float32), (1, S, 1))

        embed = nn.Dense(dim, dtype=cfg.dtype, name="embed_pose")
        mod = nn.Dense(3 * dim, dtype=cfg.dtype, name="modulation")
        trunk = [Block(dim, cfg.agg_heads, cfg.agg_mlp_ratio, layerscale=0.01,
                       dtype=cfg.dtype, name=f"trunk_{i}")
                 for i in range(cfg.cam_trunk_depth)]
        out_norm = nn.LayerNorm(dtype=jnp.float32, name="trunk_norm")
        head = Mlp(dim // 2, 9, dtype=cfg.dtype, name="pose_branch")

        vl = valid_frames
        for _ in range(cfg.cam_iterations):
            m = mod(nn.silu(embed(jax.lax.stop_gradient(pred).astype(cfg.dtype))))
            shift, scale, gate = jnp.split(m, 3, axis=-1)
            h = nn.LayerNorm(use_bias=False, use_scale=False, dtype=jnp.float32,
                             name=None)(cam).astype(cfg.dtype)
            h = h * (1 + scale) + shift
            for blk in trunk:
                h = blk(h, valid_len=vl)
            h = out_norm(h).astype(cfg.dtype)
            delta = head(h * (1 + gate))
            pred = pred + delta.astype(jnp.float32)

        return activate_pose(pred[0])


def activate_pose(enc: jax.Array) -> jax.Array:
    """Constrain the raw encoding: normalized quaternion, fov in (0, pi)."""
    t = enc[..., 0:3]
    q = enc[..., 3:7]
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-8)
    fov = jnp.pi * jax.nn.sigmoid(enc[..., 7:9])
    return jnp.concatenate([t, q, fov], axis=-1)


def resize_bilinear_align_corners(x: jax.Array, out_hw: tuple[int, int]):
    """Bilinear resize with align_corners=True on (S, h, w, C).

    torch's DPT interpolates with align_corners=True (endpoint-to-endpoint
    mapping); jax.image.resize only offers half-pixel centers, so this
    implements the endpoint convention directly with two 1-D gathers.
    """
    def axis_interp(x, size, axis):
        n = x.shape[axis]
        if size == n:
            return x
        if n == 1:
            return jnp.repeat(x, size, axis)
        pos = jnp.arange(size, dtype=jnp.float32) * ((n - 1) / (size - 1)) \
            if size > 1 else jnp.zeros((1,), jnp.float32)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
        frac = (pos - lo).astype(x.dtype)
        a = jnp.take(x, lo, axis=axis)
        b = jnp.take(x, lo + 1, axis=axis)
        shape = [1] * x.ndim
        shape[axis] = size
        return a + (b - a) * frac.reshape(shape)

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
        y = jnp.einsum("shwc,abcd->shawbd", x, kern.astype(x.dtype))
        y = y.reshape(S, h * self.k, w * self.k, self.features)
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


class DPTHead(nn.Module):
    """Dense prediction head over captured aggregator depths."""
    cfg: VGGTConfig
    out_channels: int  # e.g. 2 for depth+conf, 4 for xyz+conf

    @nn.compact
    def __call__(self, captured: dict, image_hw: tuple[int, int]) -> jax.Array:
        cfg = self.cfg
        H, W = image_hw
        h, w = cfg.patch_grid(H, W)
        ns = captured["patch_start"]
        n = len(cfg.dpt_layers)
        feats = []
        for li, d in enumerate(cfg.dpt_layers):
            t = captured[d][:, ns:, :]  # (S, P, 2C) patch tokens
            S = t.shape[0]
            oc = cfg.dpt_out_channels[li]
            x = t.reshape(S, h, w, t.shape[-1])
            x = nn.Conv(oc, (1, 1), dtype=cfg.dtype, name=f"projects_{li}")(x)
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

        # Coarse-to-fine fusion; refinenet{n} consumes the deepest capture
        # alone, each following refinenet adds the next skip and upsamples
        # to that skip's grid (the finest doubles).
        path = None
        for li in reversed(range(n)):
            out_hw = feats[li - 1].shape[1:3] if li > 0 else None
            fusion = _FeatureFusion(cfg.dpt_features, cfg.dtype,
                                    name=f"refinenet{n - li}")
            if path is None:
                path = fusion(feats[li], None, out_hw)
            else:
                path = fusion(path, feats[li], out_hw)

        x = nn.Conv(cfg.dpt_features // 2, (3, 3), padding="SAME",
                    dtype=cfg.dtype, name="output_conv1")(path)
        x = resize_bilinear_align_corners(x, (H, W))
        x = nn.Conv(32, (3, 3), padding="SAME", dtype=cfg.dtype,
                    name="output_conv2_0")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), dtype=jnp.float32,
                    name="output_conv2_2")(x.astype(jnp.float32))
        return x  # (S, H, W, out_channels), raw


def activate_depth(raw: jax.Array):
    """raw (S,H,W,2) -> depth (S,H,W,1) > 0, conf (S,H,W) >= 1."""
    depth = jnp.exp(jnp.clip(raw[..., 0:1], -10.0, 10.0))
    conf = 1.0 + jnp.exp(jnp.clip(raw[..., 1], -10.0, 10.0))
    return depth, conf


def activate_points(raw: jax.Array):
    """raw (S,H,W,4) -> points (S,H,W,3) via sign-expm1, conf (S,H,W) >= 1."""
    xyz = raw[..., 0:3]
    pts = jnp.sign(xyz) * jnp.expm1(jnp.clip(jnp.abs(xyz), 0.0, 10.0))
    conf = 1.0 + jnp.exp(jnp.clip(raw[..., 3], -10.0, 10.0))
    return pts, conf
