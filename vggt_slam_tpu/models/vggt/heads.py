"""VGGT output heads: camera pose (iterative refinement) and DPT dense heads.

Camera head: per the VGGT paper, the camera tokens from the final aggregator
depth are refined iteratively - each iteration embeds the current 9-D pose
encoding, modulates a small self-attention trunk over the S frames with
AdaLN (shift/scale/gate), and predicts a delta. Output encoding layout
matches ops/geometry.py: [t(3), quat(4 wxyz), fov(2)].

DPT heads: per-depth tokens from 4 captured aggregator layers are projected,
reassembled into feature maps at 4 scales, fused top-down with residual conv
units, and decoded to (S, H, W, C_out) maps. Depth head emits (depth, conf),
point head ((x,y,z), conf); activations keep depth positive and conf >= 1.
"""
from __future__ import annotations

from typing import Sequence

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

        empty = self.param("empty_pose", nn.initializers.zeros, (1, 1, 9),
                           jnp.float32)
        pred = jnp.tile(empty.astype(jnp.float32), (1, S, 1))

        embed = nn.Dense(dim, dtype=cfg.dtype, name="embed_pose")
        mod = nn.Dense(3 * dim, dtype=cfg.dtype, name="modulation")
        trunk = [Block(dim, cfg.agg_heads, cfg.agg_mlp_ratio, layerscale=0.01,
                       dtype=cfg.dtype, name=f"trunk_{i}")
                 for i in range(cfg.cam_trunk_depth)]
        out_norm = nn.LayerNorm(dtype=jnp.float32, name="out_norm")
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
    features: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, skip, deeper=None):
        x = skip
        if deeper is not None:
            deeper = jax.image.resize(deeper, skip.shape, method="bilinear")
            x = x + _ResidualConvUnit(self.features, self.dtype, name="rcu1")(deeper)
        x = _ResidualConvUnit(self.features, self.dtype, name="rcu2")(x)
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="project")(x)
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
        feats = []
        scales = self._scales()
        for li, d in enumerate(cfg.dpt_layers):
            t = captured[d][:, ns:, :]  # (S, P, 2C) patch tokens
            S = t.shape[0]
            oc = cfg.dpt_out_channels[li]
            x = nn.Dense(oc, dtype=cfg.dtype, name=f"proj_{li}")(t)
            x = x.reshape(S, h, w, oc)
            sc = scales[li]
            if sc != 1.0:
                x = jax.image.resize(
                    x, (S, max(1, int(round(h * sc))), max(1, int(round(w * sc))), oc),
                    method="bilinear")
            x = nn.Conv(cfg.dpt_features, (3, 3), padding="SAME", use_bias=False,
                        dtype=cfg.dtype, name=f"rn_{li}")(x)
            feats.append(x)

        # Top-down fusion: deepest (coarsest) first.
        f = None
        for li in reversed(range(len(feats))):
            f = _FeatureFusion(cfg.dpt_features, cfg.dtype, name=f"fusion_{li}")(
                feats[li], f)

        x = nn.Conv(cfg.dpt_features // 2, (3, 3), padding="SAME",
                    dtype=cfg.dtype, name="head_conv1")(f)
        x = jax.image.resize(x, (x.shape[0], H, W, x.shape[-1]), method="bilinear")
        x = nn.Conv(32, (3, 3), padding="SAME", dtype=cfg.dtype,
                    name="head_conv2")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), dtype=jnp.float32,
                    name="head_out")(x.astype(jnp.float32))
        return x  # (S, H, W, out_channels), raw

    def _scales(self) -> Sequence[float]:
        # DPT reassembly scales for 4 layers: x4, x2, x1, x0.5; fewer layers
        # (tiny config) use the tail of that list.
        all_scales = [4.0, 2.0, 1.0, 0.5]
        n = len(self.cfg.dpt_layers)
        return all_scales[-n:] if n < 4 else all_scales


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
