"""Place-recognition descriptor model (SALAD-style) in JAX.

Counterpart of the reference's SALAD retrieval network (loop_closure.py:57-59,
hub model `dinov2_salad`): a DINOv2-B/14 backbone over 224x224 frames with
optimal-transport (Sinkhorn) aggregation of projected patch features into
cluster slots plus a global token, producing one L2-normalized global
descriptor per image. Matching semantics downstream are the reference's:
L2 distance, accept < 0.80 (loop_closure.py:80).

Structure follows the SALAD paper (Optimal Transport Aggregation for Visual
Place Recognition): patch features -> 1x1 projections to `cluster_dim`,
score matrix vs `num_clusters` slots (+ dustbin) refined by `sinkhorn_iters`
Sinkhorn normalizations, feature aggregation per cluster, concatenated with
a projected global token, each part L2-normalized then jointly normalized.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import flax.linen as nn

from vggt_slam_tpu.models.vggt.config import VGGTConfig
from vggt_slam_tpu.models.vggt.vit import DinoViT


@dataclasses.dataclass(frozen=True)
class SALADConfig:
    input_size: int = 224
    patch_size: int = 14
    backbone_dim: int = 768
    backbone_depth: int = 12
    backbone_heads: int = 12
    num_clusters: int = 64
    cluster_dim: int = 128
    token_dim: int = 256
    sinkhorn_iters: int = 3
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def tiny(**overrides) -> "SALADConfig":
        base = dict(input_size=56, backbone_dim=32, backbone_depth=2,
                    backbone_heads=2, num_clusters=8, cluster_dim=16,
                    token_dim=16, sinkhorn_iters=2)
        base.update(overrides)
        return SALADConfig(**base)

    def backbone_vit_config(self) -> VGGTConfig:
        return VGGTConfig(
            img_size=self.input_size, patch_size=self.patch_size,
            enc_dim=self.backbone_dim, enc_depth=self.backbone_depth,
            enc_heads=self.backbone_heads, dtype=self.dtype,
        )


def sinkhorn_log(scores: jax.Array, iters: int) -> jax.Array:
    """Log-domain Sinkhorn with a dustbin column.

    scores: (N, K+1) raw assignment logits (last column = dustbin).
    Returns soft assignment (N, K) after `iters` row/col normalizations.
    """
    log_a = scores
    for _ in range(iters):
        log_a = log_a - jax.nn.logsumexp(log_a, axis=-1, keepdims=True)
        log_a = log_a - jax.nn.logsumexp(log_a, axis=-2, keepdims=True)
    # Final row normalization so each patch's mass sums to 1, then drop dustbin.
    log_a = log_a - jax.nn.logsumexp(log_a, axis=-1, keepdims=True)
    return jnp.exp(log_a[..., :-1])


class SALAD(nn.Module):
    cfg: SALADConfig

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images: (B, 3, H, W) in [0,1] -> (B, D) L2-normalized descriptors."""
        cfg = self.cfg
        B = images.shape[0]
        if images.shape[-2:] != (cfg.input_size, cfg.input_size):
            images = jax.image.resize(
                images, (B, 3, cfg.input_size, cfg.input_size), method="bilinear")

        feats = DinoViT(cfg.backbone_vit_config(), name="backbone")(images)
        # (B, P, backbone_dim)
        local = nn.Dense(512, dtype=cfg.dtype, name="proj_hidden")(feats)
        local = nn.relu(local)
        local = nn.Dense(cfg.cluster_dim, dtype=cfg.dtype, name="proj_local")(local)

        scores = nn.Dense(cfg.num_clusters + 1, dtype=cfg.dtype,
                          name="score")(feats)
        assign = jax.vmap(lambda s: sinkhorn_log(s, cfg.sinkhorn_iters))(scores)
        # (B, P, K) x (B, P, C) -> (B, K, C)
        clusters = jnp.einsum("bpk,bpc->bkc", assign, local)
        clusters = clusters / (jnp.linalg.norm(clusters, axis=-1, keepdims=True) + 1e-8)
        clusters = clusters.reshape(B, cfg.num_clusters * cfg.cluster_dim)

        glob = jnp.mean(feats, axis=1)
        glob = nn.Dense(512, dtype=cfg.dtype, name="token_hidden")(glob)
        glob = nn.relu(glob)
        glob = nn.Dense(cfg.token_dim, dtype=cfg.dtype, name="token_out")(glob)
        glob = glob / (jnp.linalg.norm(glob, axis=-1, keepdims=True) + 1e-8)

        desc = jnp.concatenate([glob, clusters], axis=-1)
        return desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)


@functools.lru_cache(maxsize=4)
def _build_default(input_size: int):
    cfg = SALADConfig(input_size=input_size)
    model = SALAD(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(7), jnp.zeros((1, 3, input_size, input_size)))
    fn = jax.jit(model.apply)
    return params, fn


def default_descriptor_fn(input_size: int = 224):
    """Random-init SALAD descriptor callable (until weights are converted).

    With random weights, descriptors of distinct images are far apart in L2
    so no spurious loop closures fire; converting the public SALAD
    checkpoint restores real place recognition.
    """
    def run(frames):
        params, fn = _build_default(input_size)
        return fn(params, jnp.asarray(frames))
    return run
