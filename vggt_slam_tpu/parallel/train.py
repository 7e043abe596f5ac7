"""Sharded VGGT training step (multi-chip).

The reference ships inference only; the training step exists so the model
can be fine-tuned on TPU pods and to exercise the full dp/tp sharded
compile path end-to-end. Losses follow the VGGT paper's recipe: camera
pose-encoding regression plus confidence-weighted dense depth/point
regression (conf * |err| - alpha * log conf).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from vggt_slam_tpu.models.vggt.config import VGGTConfig
from vggt_slam_tpu.models.vggt.model import VGGT
from vggt_slam_tpu.parallel.mesh import (frame_sharding, make_param_shardings,
                                         replicated)


def vggt_loss(cfg: VGGTConfig, params, batch):
    model = VGGT(cfg)
    out = model.apply(params, batch["images"])
    loss = jnp.mean((out["pose_enc"] - batch["pose_enc_gt"]) ** 2)
    if cfg.enable_depth_head:
        err = jnp.abs(out["depth"][..., 0] - batch["depth_gt"])
        conf = out["depth_conf"]
        loss = loss + jnp.mean(conf * err - 0.2 * jnp.log(conf))
    if cfg.enable_point_head:
        err = jnp.linalg.norm(
            jnp.moveaxis(out["world_points_cf"], 0, -1) - batch["points_gt"],
            axis=-1)
        conf = out["world_points_conf"]
        loss = loss + jnp.mean(conf * err - 0.2 * jnp.log(conf))
    return loss


def make_train_step(cfg: VGGTConfig, mesh, params, optimizer=None):
    """Build (train_step, opt_state, shardings) with dp/tp shardings applied.

    train_step(params, opt_state, batch) -> (params, opt_state, loss); the
    returned callable is jitted with explicit in/out shardings so XLA places
    tensors and inserts the TP psums / DP all-gathers.
    """
    if optimizer is None:
        optimizer = optax.adamw(1e-4, weight_decay=0.05)
    p_shard = make_param_shardings(params, mesh)
    f_shard = frame_sharding(mesh)
    r_shard = replicated(mesh)
    batch_shardings = {
        "images": f_shard, "pose_enc_gt": f_shard,
        "depth_gt": f_shard, "points_gt": f_shard,
    }

    opt_state = optimizer.init(params)
    # Optimizer moments are replicated here; make_zero1_train_step below is
    # the dp-sharded-moments (ZeRO-1) variant for memory-bound configs.
    o_shard = jax.tree.map(lambda _: r_shard, opt_state)

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda p: vggt_loss(cfg, p, batch))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = jax.jit(
        step,
        in_shardings=(p_shard, o_shard, batch_shardings),
        out_shardings=(p_shard, o_shard, r_shard),
    )
    return jitted, opt_state, dict(params=p_shard, opt=o_shard,
                                   batch=batch_shardings)


def make_zero1_train_step(cfg: VGGTConfig, mesh, params, optimizer=None):
    """ZeRO-1 variant of make_train_step: optimizer state sharded over dp.

    Params stay replicated for the forward/backward (grads reduce over dp
    as usual; the model's cross-frame global attention rules out putting
    the forward itself in shard_map), but the AdamW moments - 2x the
    params in f32, the dominant training-memory term - live dp-sharded,
    PER LEAF: each param leaf is viewed as a flat vector padded to a dp
    multiple, each dp rank owns its 1/dp slice, and the update runs
    inside shard_map on local slices only (optimizer math is elementwise,
    so sliced AdamW is exactly tree AdamW). Updated slices all-gather
    back over ICI per leaf - the classic reduce-scatter/all-gather update
    cycle. Slicing leaf-by-leaf INSIDE the shard_map body means the
    largest f32 transient any device holds is one leaf (~16 MB at 1B
    scale), not a concatenated full-model vector (~4.7 GB) as an earlier
    flat-vector design materialized. Trajectory parity with the
    replicated step (up to collective reduction-order noise) is asserted
    in tests/test_parallel.py::TestZero1.
    """
    if optimizer is None:
        optimizer = optax.adamw(1e-4, weight_decay=0.05)
    from jax.sharding import NamedSharding, PartitionSpec as P

    dp = mesh.shape["dp"]

    def _slice_leaf(leaf, r):
        # rank r's 1/dp slice of the leaf viewed as a padded flat vector.
        v = leaf.astype(jnp.float32).ravel()
        v = jnp.pad(v, (0, (-v.size) % dp)).reshape(dp, -1)
        return jax.lax.dynamic_index_in_dim(v, r, 0, keepdims=False)

    def _gather_leaf(v_local, ref):
        full = jax.lax.all_gather(v_local, "dp", tiled=True)
        return full[:ref.size].reshape(ref.shape).astype(ref.dtype)

    # Moment vectors shard over dp; scalar state (the AdamW step count)
    # stays replicated.
    local_p_sd = jax.tree.map(
        lambda l: jax.ShapeDtypeStruct((-(-l.size // dp),), jnp.float32),
        params)
    local_o_sd = jax.eval_shape(optimizer.init, local_p_sd)
    o_spec = jax.tree.map(lambda x: P("dp") if x.ndim >= 1 else P(),
                          local_o_sd)
    o_shard = jax.tree.map(lambda s: NamedSharding(mesh, s), o_spec,
                           is_leaf=lambda x: isinstance(x, P))

    def local_init(params_rep):
        r = jax.lax.axis_index("dp")
        return optimizer.init(
            jax.tree.map(lambda l: _slice_leaf(l, r), params_rep))

    # Initialize the sharded moments: optimizer.init on the LOCAL slice in
    # shard_map so no device ever materializes full-size f32 moments.
    opt_state = jax.jit(
        jax.shard_map(local_init, mesh=mesh, in_specs=(P(),),
                      out_specs=o_spec, check_vma=False),
        out_shardings=o_shard)(params)

    r_shard = replicated(mesh)
    p_shard_tree = jax.tree.map(lambda _: r_shard, params)
    f_shard = frame_sharding(mesh)
    batch_shardings = {"images": f_shard, "pose_enc_gt": f_shard,
                       "depth_gt": f_shard, "points_gt": f_shard}

    def local_update(params_rep, grads_rep, opt_local):
        # runs in shard_map: each dp rank slices and updates its 1/dp of
        # every leaf, then all-gathers the updated slices leaf-by-leaf.
        r = jax.lax.axis_index("dp")
        p_loc = jax.tree.map(lambda l: _slice_leaf(l, r), params_rep)
        g_loc = jax.tree.map(lambda l: _slice_leaf(l, r), grads_rep)
        updates, opt_local = optimizer.update(g_loc, opt_local, p_loc)
        p_loc = optax.apply_updates(p_loc, updates)
        return jax.tree.map(_gather_leaf, p_loc, params_rep), opt_local

    upd = jax.shard_map(local_update, mesh=mesh,
                        in_specs=(P(), P(), o_spec),
                        out_specs=(P(), o_spec), check_vma=False)

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda q: vggt_loss(cfg, q, batch))(params)
        # The P() in_spec pins the grad tree replicated at the shard_map
        # boundary (no dp-sharded layout can propagate backwards into the
        # autodiff graph, which previously triggered involuntary full
        # rematerialization of small activations under a P("dp") spec).
        new_params, opt_state = upd(params, grads, opt_state)
        return new_params, opt_state, loss

    jitted = jax.jit(step,
                     in_shardings=(p_shard_tree, o_shard, batch_shardings),
                     out_shardings=(p_shard_tree, o_shard, r_shard))
    return jitted, opt_state


def make_dryrun_batch(cfg: VGGTConfig, n_frames: int, image_hw):
    H, W = image_hw
    key = jax.random.PRNGKey(0)
    return {
        "images": jax.random.uniform(key, (n_frames, 3, H, W)),
        "pose_enc_gt": jnp.zeros((n_frames, 9)),
        "depth_gt": jnp.ones((n_frames, H, W)),
        "points_gt": jnp.zeros((n_frames, H, W, 3)),
    }
