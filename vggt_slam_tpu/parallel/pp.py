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
    sharded P("pp") - each stage holds agg_depth/pp depth slices. The
    stacking happens ONCE, outside the jit (`to_pp_params`): the train
    step consumes the pp param tree directly, so no per-step restack or
    replicated->pp reshard exists in the compiled program (the source of
    the round-2 dryrun's involuntary-full-rematerialization warning).
    `from_pp_params` restores the standard (checkpoint-compatible) tree.
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
  * Each stage captures ONLY the depths the heads consume
    (cfg.dpt_layers + the final depth for the camera head), not all of its
    depths: every stage carries k = max captures-per-stage slots (a static
    per-stage slot->local-depth map selects into them; unused slots stay
    zero), so pipelined activation memory scales with len(dpt_layers)
    instead of agg_depth.
  * Exact global attention only (global_kv_stride == 1): the merged path's
    shared ToMe assignment is computed at depth 0 and consumed by all
    later depths, which would couple stages; training uses exact attention
    anyway (merging is a training-free inference-time approximation).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
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


def to_pp_params(cfg: VGGTConfig, params):
    """Standard param tree -> pipeline tree: the aggregator's per-depth
    frame/global block params stacked on a leading depth axis (to be
    sharded P("pp")), everything else under "rest" (replicated)."""
    p = dict(params["params"])
    agg = dict(p["aggregator"])
    fstack = _stack_blocks(agg, "frame_block", cfg.agg_depth)
    gstack = _stack_blocks(agg, "global_block", cfg.agg_depth)
    for d in range(cfg.agg_depth):
        del agg[f"frame_block_{d}"]
        del agg[f"global_block_{d}"]
    p["aggregator"] = agg
    return {"stacked": {"frame": fstack, "global": gstack},
            "rest": {"params": p}}


def from_pp_params(cfg: VGGTConfig, pp_params):
    """Inverse of to_pp_params (also valid on grad trees, which mirror the
    param structure)."""
    p = dict(pp_params["rest"]["params"])
    agg = dict(p["aggregator"])
    for prefix, stack in (("frame", pp_params["stacked"]["frame"]),
                          ("global", pp_params["stacked"]["global"])):
        for d in range(cfg.agg_depth):
            agg[f"{prefix}_block_{d}"] = jax.tree.map(
                lambda a, d=d: a[d], stack)
    p["aggregator"] = agg
    return {"params": p}


def pp_param_shardings(cfg: VGGTConfig, pp_params, mesh):
    """Sharding tree for a pp param tree: stacked blocks split over the
    pipeline axis, the rest replicated."""
    stacked = jax.tree.map(lambda _: NamedSharding(mesh, P("pp")),
                           pp_params["stacked"])
    rest = jax.tree.map(lambda _: NamedSharding(mesh, P()),
                        pp_params["rest"])
    return {"stacked": stacked, "rest": rest}


def _capture_plan(cfg: VGGTConfig, pp: int):
    """Static per-stage capture layout.

    Returns (depths, slot_map, k): `depths` = sorted depths the heads need;
    `slot_map` (pp, k) int32 with the LOCAL depth index each slot captures
    (-1 = unused slot); `k` = slots per stage (max captures of any stage).
    The global capture column of depth d is stage(d) * k + its slot index.
    """
    depths = sorted(set(cfg.dpt_layers) | {cfg.agg_depth - 1})
    L_local = cfg.agg_depth // pp
    per_stage = [[d % L_local for d in depths if d // L_local == s]
                 for s in range(pp)]
    k = max(1, max(len(c) for c in per_stage))
    slot_map = np.full((pp, k), -1, np.int32)
    for s, caps in enumerate(per_stage):
        slot_map[s, :len(caps)] = caps
    return depths, slot_map, k


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


def _stage_body(cfg: VGGTConfig, fstack, gstack, x, cos, sin, slots):
    """Apply this stage's L_local (frame, global) pairs to one scene.

    x: (S, N, C); slots: (k,) int32 LOCAL depth indices this stage must
    capture (-1 = unused slot, stays zero). Returns (y, caps) with caps
    (k, S, N, 2C)."""
    S, N, C = x.shape
    cos_g = jnp.tile(cos, (S, 1))
    sin_g = jnp.tile(sin, (S, 1))
    L_local = jax.tree.leaves(fstack)[0].shape[0]
    k = slots.shape[0]
    frame_blk = Block(cfg.agg_dim, cfg.agg_heads, cfg.agg_mlp_ratio,
                      layerscale=cfg.agg_layerscale, dtype=cfg.dtype,
                      attn_impl=cfg.attn_impl, qk_norm=cfg.agg_qk_norm)
    global_blk = Block(cfg.agg_dim, cfg.agg_heads, cfg.agg_mlp_ratio,
                       layerscale=cfg.agg_layerscale, dtype=cfg.dtype,
                       attn_impl=cfg.attn_impl, qk_norm=cfg.agg_qk_norm,
                       softmax_mode=cfg.global_softmax)
    caps = [jnp.zeros((S, N, 2 * C), x.dtype) for _ in range(k)]
    for j in range(L_local):
        fp = jax.tree.map(lambda a, j=j: a[j], fstack)
        gp = jax.tree.map(lambda a, j=j: a[j], gstack)
        x = frame_blk.apply({"params": fp}, x, cos, sin)
        frame_out = x
        xg = x.reshape(1, S * N, C)
        xg = global_blk.apply({"params": gp}, xg, cos_g, sin_g)
        x = xg.reshape(S, N, C)
        cap = jnp.concatenate([frame_out, x], axis=-1)
        for i in range(k):
            caps[i] = jnp.where(slots[i] == j, cap, caps[i])
    return x, jnp.stack(caps)


def _pipeline_local(cfg: VGGTConfig, fstack, gstack, toks, cos, sin, *,
                    pp_axis: str, slot_map):
    """shard_map body: GPipe schedule on one (pp, dp) device.

    toks: (M, S, N, C) this dp shard's microbatches (scenes); fstack/gstack
    hold this STAGE's depth slice; slot_map (pp, k) the static capture
    layout (_capture_plan). Returns (M, k, S, N, 2C) captures.
    """
    s = jax.lax.axis_index(pp_axis)
    pp = jax.lax.axis_size(pp_axis)
    M, S, N, C = toks.shape
    slots = jnp.asarray(slot_map, jnp.int32)[s]  # (k,) this stage's plan
    stage = functools.partial(_stage_body, cfg, fstack, gstack,
                              cos=cos, sin=sin, slots=slots)
    k = slot_map.shape[1]
    outs0 = jnp.zeros((M, k, S, N, 2 * C), toks.dtype)
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


def pp_forward_captures(cfg: VGGTConfig, pp_params, images, mesh):
    """Pipelined aggregator over a scene batch.

    pp_params: the pipeline tree from `to_pp_params` (stacked block params
    sharded P("pp") by the caller). Returns (caps, depths): caps
    (B, len(depths), S, N, 2C) captured tokens ordered by `depths` (the
    sorted head-consumed depth list), B = M * dp scenes."""
    assert cfg.global_kv_stride == 1, "pp path is exact-attention only"
    pp, dp = mesh.shape["pp"], mesh.shape["dp"]
    assert cfg.agg_depth % pp == 0, (cfg.agg_depth, pp)
    B = images.shape[0]
    assert B % dp == 0, f"scene batch {B} not divisible by dp={dp}"

    depths, slot_map, k = _capture_plan(cfg, pp)
    L_local = cfg.agg_depth // pp
    fstack = pp_params["stacked"]["frame"]
    gstack = pp_params["stacked"]["global"]
    agg = pp_params["rest"]["params"]["aggregator"]

    toks, cos, sin = jax.vmap(
        lambda im: _preamble(cfg, agg, im),
        out_axes=(0, None, None))(images)

    body = functools.partial(_pipeline_local, cfg, pp_axis="pp",
                             slot_map=slot_map)
    blk_spec = jax.tree.map(lambda _: P("pp"), fstack)
    fn = jax.shard_map(
        lambda f, g, t, c, s_: body(f, g, t, c, s_),
        mesh=mesh,
        in_specs=(blk_spec, blk_spec, P("dp"), P(), P()),
        out_specs=P("dp", "pp"), check_vma=False)
    caps = fn(fstack, gstack, toks, cos, sin)  # (B, k*pp, S, N, 2C)
    # Select the real capture columns (stage-major slot layout).
    cols = [(d // L_local) * k + list(
        np.flatnonzero(slot_map[d // L_local] == d % L_local))[0]
        for d in depths]
    return caps[:, jnp.asarray(cols, jnp.int32)], depths


def pp_vggt_loss(cfg: VGGTConfig, pp_params, batch, mesh):
    """Mean VGGT loss (parallel/train.vggt_loss semantics) over a scene
    batch via the pipelined trunk + dp-sharded heads. `pp_params` is the
    pipeline tree (to_pp_params)."""
    images = batch["images"]  # (B, S, 3, H, W)
    B, S, _, H, W = images.shape
    caps, depths = pp_forward_captures(cfg, pp_params, images, mesh)
    ns = cfg.tokens_per_frame_special
    p = pp_params["rest"]["params"]

    def per_scene(cap_scene, pose_gt, depth_gt, points_gt):
        captured = {d: cap_scene[i] for i, d in enumerate(depths)}
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
    """Build (train_step, pp_params, opt_state) for the pipeline-parallel
    step.

    `params` (standard tree) is converted ONCE to the pipeline tree with
    the stacked block params placed P("pp") and everything else
    replicated; the optimizer state mirrors that placement (AdamW moments
    of the block stacks live pp-sharded). The compiled step therefore
    contains no replicated->pp reshard. Recover a checkpoint-compatible
    tree with `from_pp_params(cfg, pp_params)`.
    """
    if optimizer is None:
        optimizer = optax.adamw(1e-4, weight_decay=0.05)
    # Land the incoming tree on THIS mesh (replicated) before stacking:
    # callers may hand over params still placed on a different mesh (e.g.
    # the dp/tp train mesh in the driver dryrun), and stacking across mesh
    # boundaries makes XLA fall back to involuntary full rematerialization
    # on the subsequent pp reshard.
    params = jax.device_put(params, NamedSharding(mesh, P()))
    pp_params = to_pp_params(cfg, params)
    p_shard = pp_param_shardings(cfg, pp_params, mesh)
    pp_params = jax.device_put(pp_params, p_shard)
    # Eager init: optax's moments are zeros_like(params), which inherit
    # each param's placement - so the block stacks' AdamW state lives
    # pp-sharded without any explicit spec.
    opt_state = optimizer.init(pp_params)

    scene = NamedSharding(mesh, P("dp"))
    batch_shardings = {"images": scene, "pose_enc_gt": scene,
                       "depth_gt": scene, "points_gt": scene}

    def step(pp_params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda q: pp_vggt_loss(cfg, q, batch, mesh))(pp_params)
        updates, opt_state = optimizer.update(grads, opt_state, pp_params)
        pp_params = optax.apply_updates(pp_params, updates)
        return pp_params, opt_state, loss

    # Moments carry the params' NamedShardings; stray leaves (step counts,
    # schedule state) come back single-device - replicate those over the
    # mesh so every input shares one device assignment.
    o_shard = jax.tree.map(
        lambda x: x.sharding if isinstance(x.sharding, NamedSharding)
        else NamedSharding(mesh, P()), opt_state)
    opt_state = jax.device_put(opt_state, o_shard)
    jitted = jax.jit(step,
                     in_shardings=(p_shard, o_shard, batch_shardings),
                     out_shardings=(p_shard, o_shard,
                                    NamedSharding(mesh, P())))
    return jitted, pp_params, opt_state


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
