"""Pipeline-parallel (pp x dp) VGGT training step.

The reference is single-GPU (SURVEY.md section 2.4); this completes the
TPU-native parallelism inventory alongside dp/tp (parallel/train.py) and
sequence parallelism (parallel/ring.py): the aggregator's `agg_depth`
(frame, global) block pairs - the model's dominant FLOPs - are split into
`pp` contiguous stages over a ("pp", "dp") mesh and microbatched scenes
flow through the stages GPipe-style, activations hopping stage-to-stage
via `ppermute` over ICI. Scenes are the microbatch unit (each scene's
global attention needs all of its frames jointly, so the frame axis cannot
be microbatched), and the dp axis runs independent pipelines over disjoint
scene shards - gradients reduce over dp through shard_map's transpose.

Design notes:
  * Stage homogeneity: every aggregator depth has identical structure, so
    per-depth block params are STACKED along a leading depth axis and
    sharded P("pp") - each stage holds agg_depth/pp depth slices. Stacking
    happens inside the loss from the standard (checkpoint-compatible)
    param tree; pre-stacking params is a later optimization.
  * The DINOv2 encoder + token/RoPE assembly (preamble) and the DPT/camera
    heads + loss (postamble) run OUTSIDE the pipeline as plain dp-sharded
    SPMD over scenes - they are frame/scene-parallel and a small fraction
    of total FLOPs; only the alternating trunk pipelines. The preamble
    mirrors models/vggt/aggregator.py's token assembly exactly (parity
    guarded by tests/test_parallel.py::TestPipelineParallel).
  * The schedule is GPipe with M = scenes-per-dp-shard microbatches and
    M + pp - 1 ticks; bubble fraction (pp-1)/(M+pp-1). Idle ticks compute
    on zeros (LayerNorm/attention are finite on zero input) and their
    writes are masked, so autodiff through the `lax.scan` over ticks stays
    exact; `ppermute`'s transpose reverses the ring for the backward pass.
  * Every stage captures ALL of its depths' concat(frame_out, global_out)
    outputs (the DPT heads need 4 interior depths, cfg.dpt_layers); the
    heads then index the stacked capture. Capturing only the needed rows
    would save activation memory at real scale - documented trade-off.
  * Exact global attention only (global_kv_stride == 1): the merged path's
    shared ToMe assignment is computed at depth 0 and consumed by all
    later depths, which would couple stages; training uses exact attention
    anyway (merging is a training-free inference-time approximation).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from vggt_slam_tpu.models.vggt.config import VGGTConfig
from vggt_slam_tpu.models.vggt.heads import (CameraHead, DPTHead,
                                             activate_depth, activate_points)
from vggt_slam_tpu.models.vggt.modules import Block, rope_2d_angles
from vggt_slam_tpu.models.vggt.vit import DinoViT


def _stack_blocks(agg_params, prefix: str, depth: int):
    """Stack params of `prefix`_0..`prefix`_{depth-1} along a new axis 0."""
    subtrees = [agg_params[f"{prefix}_{d}"] for d in range(depth)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *subtrees)


def _preamble(cfg: VGGTConfig, agg_params, images):
    """images (S, 3, H, W) -> tokens (S, N, C) + frame RoPE tables.

    Mirrors the token assembly of models/vggt/aggregator.py (patch embed,
    camera/register tokens with frame-0 specialization, 1-based 2D RoPE).
    """
    S, _, H, W = images.shape
    h, w = cfg.patch_grid(H, W)
    ns = cfg.tokens_per_frame_special

    x = DinoViT(cfg).apply({"params": agg_params["patch_embed"]}, images)
    if cfg.enc_dim != cfg.agg_dim:
        import flax.linen as nn
        x = nn.Dense(cfg.agg_dim, dtype=cfg.dtype).apply(
            {"params": agg_params["input_proj"]}, x)

    cam_tok = agg_params["camera_token"]
    reg_tok = agg_params["register_token"]
    sel = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           jnp.ones((max(S - 1, 0),), jnp.int32)])[:S]
    special = jnp.concatenate([cam_tok, reg_tok], axis=1)[sel]
    x = jnp.concatenate([special.astype(x.dtype), x], axis=1)

    yy, xx = jnp.meshgrid(jnp.arange(1, h + 1, dtype=jnp.float32),
                          jnp.arange(1, w + 1, dtype=jnp.float32),
                          indexing="ij")
    positions = jnp.stack([yy.ravel(), xx.ravel()], axis=-1)
    head_dim = cfg.agg_dim // cfg.agg_heads
    cos_p, sin_p = rope_2d_angles(positions, head_dim, cfg.rope_base)
    cos = jnp.concatenate([jnp.ones((ns, head_dim // 2)), cos_p], axis=0)
    sin = jnp.concatenate([jnp.zeros((ns, head_dim // 2)), sin_p], axis=0)
    return x, cos, sin


def _stage_body(cfg: VGGTConfig, fstack, gstack, x, cos, sin):
    """Apply this stage's L_local (frame, global) pairs to one scene.

    x: (S, N, C). Returns (y, caps) with caps (L_local, S, N, 2C)."""
    S, N, C = x.shape
    cos_g = jnp.tile(cos, (S, 1))
    sin_g = jnp.tile(sin, (S, 1))
    L_local = jax.tree.leaves(fstack)[0].shape[0]
    frame_blk = Block(cfg.agg_dim, cfg.agg_heads, cfg.agg_mlp_ratio,
                      layerscale=cfg.agg_layerscale, dtype=cfg.dtype,
                      attn_impl=cfg.attn_impl, qk_norm=cfg.agg_qk_norm)
    global_blk = Block(cfg.agg_dim, cfg.agg_heads, cfg.agg_mlp_ratio,
                       layerscale=cfg.agg_layerscale, dtype=cfg.dtype,
                       attn_impl=cfg.attn_impl, qk_norm=cfg.agg_qk_norm,
                       softmax_mode=cfg.global_softmax)
    caps = []
    for j in range(L_local):
        fp = jax.tree.map(lambda a, j=j: a[j], fstack)
        gp = jax.tree.map(lambda a, j=j: a[j], gstack)
        x = frame_blk.apply({"params": fp}, x, cos, sin)
        frame_out = x
        xg = x.reshape(1, S * N, C)
        xg = global_blk.apply({"params": gp}, xg, cos_g, sin_g)
        x = xg.reshape(S, N, C)
        caps.append(jnp.concatenate([frame_out, x], axis=-1))
    return x, jnp.stack(caps)


def _pipeline_local(cfg: VGGTConfig, fstack, gstack, toks, cos, sin, *,
                    pp_axis: str):
    """shard_map body: GPipe schedule on one (pp, dp) device.

    toks: (M, S, N, C) this dp shard's microbatches (scenes); fstack/gstack
    hold this STAGE's depth slice. Returns (M, L_local, S, N, 2C) captures.
    """
    s = jax.lax.axis_index(pp_axis)
    pp = jax.lax.axis_size(pp_axis)
    M, S, N, C = toks.shape
    stage = functools.partial(_stage_body, cfg, fstack, gstack,
                              cos=cos, sin=sin)
    cap_sd = jax.eval_shape(stage, jax.ShapeDtypeStruct((S, N, C),
                                                        toks.dtype))[1]
    outs0 = jnp.zeros((M,) + cap_sd.shape, cap_sd.dtype)
    cur0 = jnp.where(s == 0, toks[0], jnp.zeros_like(toks[0]))
    perm = [(i, (i + 1) % pp) for i in range(pp)]

    def tick(carry, t):
        cur, outs = carry
        y, caps = stage(cur)
        m = t - s
        valid = (m >= 0) & (m < M)
        z = jnp.int32(0)  # int32 indices even under leaked jax_enable_x64
        written = jax.lax.dynamic_update_slice(
            outs, caps[None].astype(outs.dtype),
            (jnp.clip(m, 0, M - 1).astype(jnp.int32), z, z, z, z))
        outs = jnp.where(valid, written, outs)
        y_next = jax.lax.ppermute(y, pp_axis, perm)
        feed = toks[jnp.clip(t + 1, 0, M - 1)]
        cur = jnp.where(s == 0, feed, y_next)
        return (cur, outs), None

    # int32 tick counter: under jax_enable_x64 (leaked by callers) a bare
    # arange would be int64 and mix dtypes with the int32 axis_index.
    (_, outs), _ = jax.lax.scan(tick, (cur0, outs0),
                                jnp.arange(M + pp - 1, dtype=jnp.int32))
    return outs


def pp_forward_captures(cfg: VGGTConfig, params, images, mesh):
    """Pipelined aggregator over a scene batch: (B, S, 3, H, W) ->
    (B, agg_depth, S, N, 2C) captured tokens, B = M * dp scenes."""
    assert cfg.global_kv_stride == 1, "pp path is exact-attention only"
    pp, dp = mesh.shape["pp"], mesh.shape["dp"]
    assert cfg.agg_depth % pp == 0, (cfg.agg_depth, pp)
    B = images.shape[0]
    assert B % dp == 0, f"scene batch {B} not divisible by dp={dp}"

    agg = params["params"]["aggregator"]
    fstack = _stack_blocks(agg, "frame_block", cfg.agg_depth)
    gstack = _stack_blocks(agg, "global_block", cfg.agg_depth)

    toks, cos, sin = jax.vmap(
        lambda im: _preamble(cfg, agg, im),
        out_axes=(0, None, None))(images)

    body = functools.partial(_pipeline_local, cfg, pp_axis="pp")
    blk_spec = jax.tree.map(lambda _: P("pp"), fstack)
    fn = jax.shard_map(
        lambda f, g, t, c, s_: body(f, g, t, c, s_),
        mesh=mesh,
        in_specs=(blk_spec, blk_spec, P("dp"), P(), P()),
        out_specs=P("dp", "pp"), check_vma=False)
    return fn(fstack, gstack, toks, cos, sin)


def pp_vggt_loss(cfg: VGGTConfig, params, batch, mesh):
    """Mean VGGT loss (parallel/train.vggt_loss semantics) over a scene
    batch via the pipelined trunk + dp-sharded heads."""
    images = batch["images"]  # (B, S, 3, H, W)
    B, S, _, H, W = images.shape
    caps = pp_forward_captures(cfg, params, images, mesh)
    ns = cfg.tokens_per_frame_special
    p = params["params"]

    def per_scene(cap_scene, pose_gt, depth_gt, points_gt):
        captured = {d: cap_scene[d]
                    for d in set(cfg.dpt_layers) | {cfg.agg_depth - 1}}
        captured["patch_start"] = ns
        pose_enc = CameraHead(cfg).apply(
            {"params": p["camera_head"]}, captured[cfg.agg_depth - 1], None)
        loss = jnp.mean((pose_enc - pose_gt) ** 2)
        if cfg.enable_depth_head:
            raw = DPTHead(cfg, out_channels=2).apply(
                {"params": p["depth_head"]}, captured, (H, W))
            depth, conf = activate_depth(raw)
            err = jnp.abs(depth[..., 0] - depth_gt)
            loss = loss + jnp.mean(conf * err - 0.2 * jnp.log(conf))
        if cfg.enable_point_head:
            raw = DPTHead(cfg, out_channels=4).apply(
                {"params": p["point_head"]}, captured, (H, W))
            pts_cf, conf = activate_points(raw)
            err = jnp.linalg.norm(
                jnp.moveaxis(pts_cf, 0, -1) - points_gt, axis=-1)
            loss = loss + jnp.mean(conf * err - 0.2 * jnp.log(conf))
        return loss

    losses = jax.vmap(per_scene)(caps, batch["pose_enc_gt"],
                                 batch["depth_gt"], batch["points_gt"])
    return jnp.mean(losses)


def make_pp_train_step(cfg: VGGTConfig, mesh, params, optimizer=None):
    """Build (train_step, opt_state) for the pipeline-parallel step.

    Params/optimizer state keep the standard (checkpoint-compatible) tree,
    replicated; the scene batch shards over dp; the stacked block params
    reshard to their pipeline stages inside the jit.
    """
    if optimizer is None:
        optimizer = optax.adamw(1e-4, weight_decay=0.05)
    r = NamedSharding(mesh, P())
    scene = NamedSharding(mesh, P("dp"))
    batch_shardings = {"images": scene, "pose_enc_gt": scene,
                       "depth_gt": scene, "points_gt": scene}
    opt_state = optimizer.init(params)
    r_tree = jax.tree.map(lambda _: r, params)
    o_tree = jax.tree.map(lambda _: r, opt_state)

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda q: pp_vggt_loss(cfg, q, batch, mesh))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = jax.jit(step, in_shardings=(r_tree, o_tree, batch_shardings),
                     out_shardings=(r_tree, o_tree, r))
    return jitted, opt_state


def make_pp_dryrun_batch(cfg: VGGTConfig, n_scenes: int, n_frames: int,
                         image_hw):
    H, W = image_hw
    key = jax.random.PRNGKey(0)
    return {
        "images": jax.random.uniform(key, (n_scenes, n_frames, 3, H, W)),
        "pose_enc_gt": jnp.zeros((n_scenes, n_frames, 9)),
        "depth_gt": jnp.ones((n_scenes, n_frames, H, W)),
        "points_gt": jnp.zeros((n_scenes, n_frames, H, W, 3)),
    }
