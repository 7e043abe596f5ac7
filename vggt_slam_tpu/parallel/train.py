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
    as usual), but the AdamW moments - 2x the params in f32, the dominant
    training-memory term - live dp-sharded: all params flatten into one
    1-D vector padded to a dp multiple, each dp shard owns 1/dp of it, and
    the update runs inside shard_map on the local slice only (optimizer
    math is elementwise, so flat-vector AdamW is exactly tree AdamW).
    The updated param vector all-gathers back over ICI (out_spec P() with
    an explicit all_gather), i.e. the classic reduce-scatter/all-gather
    data-parallel update cycle. Trajectory parity with the replicated
    step (up to collective reduction-order noise) is asserted in
    tests/test_parallel.py::TestZero1.
    """
    if optimizer is None:
        optimizer = optax.adamw(1e-4, weight_decay=0.05)
    from jax.sharding import NamedSharding, PartitionSpec as P

    dp = mesh.shape["dp"]
    leaves, treedef = jax.tree.flatten(params)
    sizes = [int(l.size) for l in leaves]
    shapes = [l.shape for l in leaves]
    dtypes = [l.dtype for l in leaves]
    total = sum(sizes)
    padded = -(-total // dp) * dp

    def flatten(tree):
        ls = jax.tree.leaves(tree)
        vec = jnp.concatenate([l.astype(jnp.float32).ravel() for l in ls])
        return jnp.pad(vec, (0, padded - total))

    def unflatten(vec):
        out, off = [], 0
        for sz, shp, dt in zip(sizes, shapes, dtypes):
            out.append(vec[off:off + sz].reshape(shp).astype(dt))
            off += sz
        return jax.tree.unflatten(treedef, out)

    pvec0 = flatten(params)
    r_shard = replicated(mesh)
    # Moment vectors shard over dp; scalar state (the AdamW step count)
    # stays replicated.
    local_sd = jax.eval_shape(optimizer.init,
                              jnp.zeros((padded // dp,), jnp.float32))
    o_spec = jax.tree.map(lambda x: P("dp") if x.ndim >= 1 else P(),
                          local_sd)
    o_shard = jax.tree.map(lambda s: NamedSharding(mesh, s), o_spec,
                           is_leaf=lambda x: isinstance(x, P))
    # Initialize the sharded moments: optimizer.init on the LOCAL slice in
    # shard_map so no device ever materializes full-size moments.
    opt_state = jax.jit(
        jax.shard_map(optimizer.init, mesh=mesh, in_specs=P("dp"),
                      out_specs=o_spec, check_vma=False),
        out_shardings=o_shard)(pvec0)

    p_shard_tree = jax.tree.map(lambda _: r_shard, params)
    f_shard = frame_sharding(mesh)
    batch_shardings = {"images": f_shard, "pose_enc_gt": f_shard,
                       "depth_gt": f_shard, "points_gt": f_shard}

    def local_update(pvec, gvec, opt_local):
        # runs in shard_map: each dp shard updates its 1/dp slice.
        updates, opt_local = optimizer.update(gvec, opt_local, pvec)
        pvec = optax.apply_updates(pvec, updates)
        return jax.lax.all_gather(pvec, "dp", tiled=True), opt_local

    upd = jax.shard_map(local_update, mesh=mesh,
                        in_specs=(P("dp"), P("dp"), o_spec),
                        out_specs=(P(), o_spec), check_vma=False)

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda q: vggt_loss(cfg, q, batch))(params)
        # Pin the grad tree replicated BEFORE the flatten: the flat
        # vector's P("dp") shard_map in_spec otherwise propagates a
        # dp-sharded layout backwards through the concatenate into the
        # backward graph, where XLA resolves the conflict with an
        # involuntary full rematerialization of small activations.
        grads = jax.lax.with_sharding_constraint(grads, p_shard_tree)
        pvec, opt_state = upd(flatten(params), flatten(grads), opt_state)
        return unflatten(pvec), opt_state, loss

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
