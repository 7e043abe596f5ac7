"""Place-recognition descriptor model (SALAD) in JAX.

Counterpart of the reference's SALAD retrieval network (loop_closure.py:57-59,
hub model `dinov2_salad`, ckpt `dino_salad.ckpt`): a DINOv2-B/14 backbone
over 224x224 frames with optimal-transport (Sinkhorn) aggregation of
projected patch features into cluster slots plus a global token, producing
one L2-normalized 8448-D global descriptor per image. Matching semantics
downstream are the reference's: L2 distance, accept < 0.80
(loop_closure.py:80).

The structure mirrors the public serizba/salad implementation ("Optimal
Transport Aggregation for Visual Place Recognition") so its released
checkpoint converts 1:1:

  * backbone: DINOv2 ViT-B/14 (no register tokens); patch tokens feed the
    cluster/score branches, the CLS token feeds the global-token branch.
  * cluster_features: 1x1 conv stack 768 -> 512 -> relu -> cluster_dim.
  * score: 1x1 conv stack 768 -> 512 -> relu -> num_clusters, augmented
    with a LEARNED scalar dustbin row.
  * token_features: linear stack 768 -> 512 -> relu -> token_dim on CLS.
  * assignment: SuperGlue-style log-domain optimal transport where the
    dustbin row's marginal absorbs the n_patches - n_clusters leftover
    mass; 3 iterations.
  * descriptor: concat(normalize(token), per-cluster-normalized aggregated
    features flattened in (cluster_dim, num_clusters) order), then a final
    joint L2 normalization.

`convert_torch_checkpoint` maps the public `dino_salad.ckpt` state dict
(keys `backbone.model.*` / `aggregator.*`) into this layout.
"""
from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
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
    hidden_dim: int = 512
    sinkhorn_iters: int = 3
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def tiny(**overrides) -> "SALADConfig":
        base = dict(input_size=56, backbone_dim=32, backbone_depth=2,
                    backbone_heads=2, num_clusters=8, cluster_dim=16,
                    token_dim=16, hidden_dim=16, sinkhorn_iters=2)
        base.update(overrides)
        return SALADConfig(**base)

    def backbone_vit_config(self) -> VGGTConfig:
        # DINOv2-B/14 as released for SALAD: LayerScale, NO register tokens.
        return VGGTConfig(
            img_size=self.input_size, patch_size=self.patch_size,
            enc_dim=self.backbone_dim, enc_depth=self.backbone_depth,
            enc_heads=self.backbone_heads, enc_num_registers=0,
            dtype=self.dtype,
        )


def log_otp_solver(log_a: jax.Array, log_b: jax.Array, M: jax.Array,
                   num_iters: int) -> jax.Array:
    """Sinkhorn in log domain (SuperGlue-style) for one (m+1, n) cost M.

    log_a: (m+1,) row marginals (last = dustbin), log_b: (n,) col marginals.
    Returns log transport plan (m+1, n).
    """
    u = jnp.zeros_like(log_a)
    v = jnp.zeros_like(log_b)
    for _ in range(num_iters):
        u = log_a - jax.nn.logsumexp(M + v[None, :], axis=1)
        v = log_b - jax.nn.logsumexp(M + u[:, None], axis=0)
    return M + u[:, None] + v[None, :]


def get_matching_probs(S: jax.Array, dustbin_score: jax.Array,
                       num_iters: int) -> jax.Array:
    """SALAD assignment for one image. S: (K, n) cluster-patch scores.

    Appends the learned scalar dustbin row, runs optimal transport with
    marginals where the dustbin absorbs the n - K leftover patch mass, and
    returns exp(log_P - log(1/n)) with the dustbin row dropped: (K, n).
    """
    K, n = S.shape
    S_aug = jnp.concatenate(
        [S, jnp.full((1, n), dustbin_score, S.dtype)], axis=0)
    norm = -math.log(n)
    # Dustbin absorbs the leftover patch mass. Real configs have n > K
    # (224px -> 256 patches vs 64 clusters); clamp keeps degenerate tiny
    # grids (n <= K) well-posed instead of raising on log(<=0).
    log_a = jnp.full((K + 1,), norm).at[-1].add(math.log(max(n - K, 1)))
    log_b = jnp.full((n,), norm)
    log_P = log_otp_solver(log_a, log_b, S_aug, num_iters)
    return jnp.exp(log_P - norm)[:-1]


class SALAD(nn.Module):
    cfg: SALADConfig

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images: (B, 3, H, W) in [0,1] -> (B, D) L2-normalized descriptors
        with D = token_dim + num_clusters * cluster_dim (8448 at defaults)."""
        cfg = self.cfg
        B = images.shape[0]
        if images.shape[-2:] != (cfg.input_size, cfg.input_size):
            images = jax.image.resize(
                images, (B, 3, cfg.input_size, cfg.input_size), method="bilinear")

        feats, cls = DinoViT(cfg.backbone_vit_config(), return_cls=True,
                             name="backbone")(images)
        # feats: (B, n, backbone_dim); cls: (B, backbone_dim)

        local = nn.Dense(cfg.hidden_dim, dtype=cfg.dtype,
                         name="cluster_hidden")(feats)
        local = nn.relu(local)
        local = nn.Dense(cfg.cluster_dim, dtype=cfg.dtype,
                         name="cluster_out")(local)       # (B, n, Cd)

        scores = nn.Dense(cfg.hidden_dim, dtype=cfg.dtype,
                          name="score_hidden")(feats)
        scores = nn.relu(scores)
        scores = nn.Dense(cfg.num_clusters, dtype=cfg.dtype,
                          name="score_out")(scores)       # (B, n, K)

        glob = nn.Dense(cfg.hidden_dim, dtype=cfg.dtype,
                        name="token_hidden")(cls)
        glob = nn.relu(glob)
        glob = nn.Dense(cfg.token_dim, dtype=cfg.dtype, name="token_out")(glob)

        dust_bin = self.param("dust_bin", nn.initializers.ones, (), jnp.float32)
        assign = jax.vmap(
            lambda s: get_matching_probs(
                s.T, dust_bin.astype(s.dtype), cfg.sinkhorn_iters))(scores)
        # assign: (B, K, n)
        clusters = jnp.einsum("bkn,bnc->bkc", assign, local)  # (B, K, Cd)
        clusters = clusters / (
            jnp.linalg.norm(clusters, axis=-1, keepdims=True) + 1e-8)
        # Flatten in (cluster_dim, num_clusters) order - the public SALAD
        # keeps features as (B, Cd, K) and flattens channel-major.
        clusters = jnp.swapaxes(clusters, 1, 2).reshape(
            B, cfg.num_clusters * cfg.cluster_dim)

        glob = glob / (jnp.linalg.norm(glob, axis=-1, keepdims=True) + 1e-8)
        desc = jnp.concatenate([glob, clusters], axis=-1)
        return desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)


# ----------------------------------------------------------------------------
# Torch checkpoint conversion (dino_salad.ckpt)
# ----------------------------------------------------------------------------

_AGG_NAMES = {
    "cluster_hidden": "aggregator.cluster_features.0",
    "cluster_out": "aggregator.cluster_features.2",
    "score_hidden": "aggregator.score.0",
    "score_out": "aggregator.score.2",
    "token_hidden": "aggregator.token_features.0",
    "token_out": "aggregator.token_features.2",
}


def _salad_name_candidates(flax_path: str) -> list[str]:
    """Map a flax SALAD param path to candidate torch state-dict names."""
    p = flax_path
    if p == "params/dust_bin":
        return ["aggregator.dust_bin"]
    for ours, theirs in _AGG_NAMES.items():
        if f"/{ours}/" in p:
            leaf = p.rsplit("/", 1)[1].replace("kernel", "weight")
            return [f"{theirs}.{leaf}"]
    # Backbone: our DinoViT layout under backbone/, theirs under
    # backbone.model. (the salad repo wraps torch.hub DINOv2 as .model).
    p = p.replace("params/backbone/", "")
    p = p.replace("block_", "blocks.")
    p = p.replace("patch_embed/kernel", "patch_embed.proj.weight")
    p = p.replace("patch_embed/bias", "patch_embed.proj.bias")
    p = p.replace("/kernel", ".weight").replace("/bias", ".bias")
    p = p.replace("/scale", ".weight")
    p = p.replace("/", ".")
    return [f"backbone.model.{p}", f"backbone.{p}", p]


def convert_torch_state_dict(state_dict: dict, params_template):
    """Fill a flax SALAD param tree from the public dino_salad state dict.

    Handles: DINOv2 pos_embed/cls_token layout (via the shared structural
    transform), conv OIHW->HWIO and (out,in)->(in,out) transposes, and the
    aggregator's 1x1 convs squeezed to dense kernels.
    """
    from vggt_slam_tpu.models.vggt.convert import _structural_transforms

    flat_t = {k: np.asarray(v) for k, v in state_dict.items()}
    _structural_transforms(flat_t)
    used = set()
    unmatched = []

    def fill(prefix, node):
        if isinstance(node, dict):
            return {k: fill(f"{prefix}/{k}" if prefix else k, v)
                    for k, v in node.items()}
        shape = tuple(node.shape)
        for cand in _salad_name_candidates(prefix):
            if cand not in flat_t:
                continue
            arr = flat_t[cand]
            if cand.endswith(".weight"):
                if arr.ndim == 4 and arr.shape[2:] == (1, 1) and len(shape) == 2:
                    arr = arr[:, :, 0, 0].T          # 1x1 conv -> dense
                elif arr.ndim == 4 and len(shape) == 4:
                    arr = arr.transpose(2, 3, 1, 0)  # conv OIHW -> HWIO
                elif arr.ndim == 2 and len(shape) == 2:
                    arr = arr.T
            if arr.ndim == 0 and len(shape) == 0 or arr.shape == shape:
                used.add(cand)
                return jnp.asarray(np.asarray(arr).reshape(shape),
                                   dtype=node.dtype)
        unmatched.append(prefix)
        return node

    params = fill("", params_template)
    unused = sorted(set(flat_t) - used)
    return params, {"unmatched_flax": unmatched, "unused_torch": unused}


def convert_torch_checkpoint(torch_path: str, out_path: str,
                             cfg: SALADConfig | None = None):
    """CLI helper: dino_salad.ckpt -> flat npz in our layout + match report."""
    import torch
    from vggt_slam_tpu.models.vggt.convert import save_checkpoint

    cfg = cfg or SALADConfig()
    sd = torch.load(torch_path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    model = SALAD(cfg)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 3, cfg.input_size, cfg.input_size))))
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    params, report = convert_torch_state_dict(sd, template)
    n_un = len(report["unmatched_flax"])
    print(f"[salad-convert] unmatched flax params: {n_un}; "
          f"unused torch keys: {len(report['unused_torch'])}")
    for p in report["unmatched_flax"][:20]:
        print("  missing:", p)
    save_checkpoint(params, out_path)
    return report


@functools.lru_cache(maxsize=4)
def _build_default(input_size: int, checkpoint: str | None = None):
    cfg = SALADConfig(input_size=input_size)
    model = SALAD(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(7), jnp.zeros((1, 3, input_size, input_size)))
    if checkpoint:
        from vggt_slam_tpu.models.vggt.convert import load_checkpoint
        params = load_checkpoint(checkpoint, params)
    fn = jax.jit(model.apply)
    return params, fn


def default_descriptor_fn(input_size: int = 224, checkpoint: str | None = None):
    """SALAD descriptor callable (random init until weights are converted).

    With random weights descriptors carry no place information (distinct
    images land ~0.3 apart in L2, under the 0.80 accept threshold), so a
    checkpoint-less descriptor would fire arbitrary "loop closures" and
    feed garbage RANSAC factors into the graph. The returned callable
    therefore carries `run.trusted = (checkpoint is not None)`;
    ImageRetrieval disables loop detection when it is False. Convert the
    public SALAD checkpoint (`convert_torch_checkpoint`) for real place
    recognition (reference loop_closure.py:80-91 only fires on genuine
    sub-0.80 matches from trained weights).
    """
    built: dict = {}  # lazy-once: build on first call, never per submap

    def run(frames):
        if not built:
            built["params"], built["fn"] = _build_default(
                input_size, checkpoint)
        return built["fn"](built["params"], jnp.asarray(frames))

    run.trusted = checkpoint is not None
    return run


def tiny_image_descriptor_fn(grid: int = 16):
    """Weight-free "tiny image" place descriptor (host, O(HW) per frame).

    Gray thumbnail at `grid` x `grid`, mean-centered and L2-normalized, so
    descriptor L2 distance is a monotone function of thumbnail NCC. This is
    NOT a SALAD replacement for real scenes (viewpoint/illumination
    sensitive); it exists so loop closure runs END TO END with zero external
    weights - the CLI-level smoke acceptance (evals/smoke_loop.py) and the
    synthetic eval sweeps exercise retrieval -> LoopMatchQueue -> RANSAC ->
    graph factors through it. Select with --retrieval_backend tiny.
    """
    import cv2

    def run(frames):
        frames = np.asarray(frames, np.float32)  # (S, 3, H, W) in [0, 1]
        out = np.empty((frames.shape[0], grid * grid), np.float32)
        for i, f in enumerate(frames):
            g = f.mean(axis=0)
            t = cv2.resize(g, (grid, grid),
                           interpolation=cv2.INTER_AREA).ravel()
            t -= t.mean()
            out[i] = t / (np.linalg.norm(t) + 1e-8)
        return out

    run.trusted = True
    return run
