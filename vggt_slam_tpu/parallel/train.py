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
    # Optimizer moments are replicated for now; sharding them like params is
    # a later optimization (ZeRO-style) once multi-chip training matters.
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


def make_dryrun_batch(cfg: VGGTConfig, n_frames: int, image_hw):
    H, W = image_hw
    key = jax.random.PRNGKey(0)
    return {
        "images": jax.random.uniform(key, (n_frames, 3, H, W)),
        "pose_enc_gt": jnp.zeros((n_frames, 9)),
        "depth_gt": jnp.ones((n_frames, H, W)),
        "points_gt": jnp.zeros((n_frames, H, W, 3)),
    }
