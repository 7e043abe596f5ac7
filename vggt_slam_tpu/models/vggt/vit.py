"""DINOv2-style ViT image encoder (patch tokens only).

VGGT uses a full DINOv2 ViT-L/14-with-registers forward as its "patch embed"
(SURVEY.md section 2.2: 14x14 patchify of each frame) - the encoder's
normalized patch tokens feed the alternating-attention aggregator. This
re-implementation keeps DINOv2's structure (cls + register tokens, learned
position embeddings with bilinear interpolation, LayerScale blocks, no RoPE)
so the released torch weights can be mapped 1:1 by the converter.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from vggt_slam_tpu.models.vggt.config import VGGTConfig
from vggt_slam_tpu.models.vggt.modules import Block

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


class DinoViT(nn.Module):
    cfg: VGGTConfig
    return_cls: bool = False  # also return the final CLS token (SALAD)

    @nn.compact
    def __call__(self, images: jax.Array):
        """images: (B, 3, H, W) in [0, 1] -> patch tokens (B, h*w, enc_dim),
        or (patch_tokens, cls_token (B, enc_dim)) when `return_cls`."""
        cfg = self.cfg
        B, _, H, W = images.shape
        h, w = cfg.patch_grid(H, W)

        mean = jnp.asarray(_IMAGENET_MEAN, dtype=images.dtype).reshape(1, 3, 1, 1)
        std = jnp.asarray(_IMAGENET_STD, dtype=images.dtype).reshape(1, 3, 1, 1)
        x = (images - mean) / std

        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC for conv
        x = nn.Conv(cfg.enc_dim, kernel_size=(cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
                    dtype=cfg.dtype, name="patch_embed")(x)
        x = x.reshape(B, h * w, cfg.enc_dim)

        # Learned position embedding over the training grid, bilinearly
        # interpolated to the current grid (DINOv2 behavior for non-square
        # inputs like 392x518).
        g = cfg.img_size // cfg.patch_size
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, g, g, cfg.enc_dim), jnp.float32)
        if (h, w) != (g, g):
            pos = jax.image.resize(pos, (1, h, w, cfg.enc_dim), method="bilinear")
        x = x + pos.reshape(1, h * w, cfg.enc_dim).astype(x.dtype)

        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, cfg.enc_dim), jnp.float32)
        special = [jnp.tile(cls.astype(x.dtype), (B, 1, 1))]
        if cfg.enc_num_registers:
            reg = self.param("register_tokens", nn.initializers.normal(0.02),
                             (1, cfg.enc_num_registers, cfg.enc_dim), jnp.float32)
            special.append(jnp.tile(reg.astype(x.dtype), (B, 1, 1)))
        x = jnp.concatenate(special + [x], axis=1)

        BlockCls = nn.remat(Block) if cfg.remat else Block
        for i in range(cfg.enc_depth):
            x = BlockCls(cfg.enc_dim, cfg.enc_heads, cfg.enc_mlp_ratio,
                         layerscale=cfg.enc_layerscale, dtype=cfg.dtype,
                         attn_impl=cfg.attn_impl, ln_eps=1e-6,  # DINOv2 eps
                         name=f"block_{i}")(x)
        x = nn.LayerNorm(dtype=jnp.float32, epsilon=1e-6,
                         name="norm")(x).astype(cfg.dtype)
        patches = x[:, 1 + cfg.enc_num_registers:]
        if self.return_cls:
            return patches, x[:, 0]
        return patches
