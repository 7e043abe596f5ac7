"""Sharded multi-chip VGGT inference.

Single-chip inference covers the reference's operating envelope (it is a
single-GPU system - SURVEY.md section 2.4), but larger submaps at higher
resolutions exceed one chip's HBM/FLOPs; this helper jits the forward over a
("dp","tp") mesh: frames sharded over dp (the encoder, frame attention and
DPT heads are frame-parallel; XLA all-gathers at the global-attention
blocks), Megatron-style TP over qkv/mlp via the parallel.mesh rules, with
collectives riding ICI.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from vggt_slam_tpu.parallel.mesh import (frame_sharding, make_mesh,
                                         make_param_shardings, replicated)


def make_sharded_forward(model, params, mesh=None):
    """Return (forward_fn, sharded_params).

    forward_fn(sharded_params, images) runs the jitted forward with dp/tp
    shardings; `images` frame counts must be divisible by the dp axis.
    """
    if mesh is None:
        mesh = make_mesh()
    p_shard = make_param_shardings(params, mesh)
    params_sharded = jax.device_put(params, p_shard)
    f_shard = frame_sharding(mesh)

    out_shardings = dict(images=f_shard, pose_enc=f_shard, depth=f_shard,
                         depth_conf=f_shard,
                         world_points_cf=frame_sharding(mesh, axis=1),
                         world_points_conf=f_shard)

    fwd = jax.jit(model.apply, in_shardings=(p_shard, f_shard),
                  out_shardings=out_shardings)
    return fwd, params_sharded


def make_sharded_bucketed_model_fn(model, params, bucket_size: int,
                                   mesh=None, as_numpy: bool = True):
    """Sharded counterpart of models.vggt.model.make_bucketed_model_fn:
    a prediction callable that pads every submap batch to a fixed bucket
    (rounded up so the frame axis divides the dp mesh axis), passes a traced
    `valid_frames`, and runs the forward sharded over the ("dp","tp") mesh.
    Drop-in for the SLAM solver's model_fn (main.py --shard)."""
    import numpy as np
    if mesh is None:
        mesh = make_mesh()
    dp = mesh.shape["dp"]
    bucket = -(-bucket_size // dp) * dp

    p_shard = make_param_shardings(params, mesh)
    params_sharded = jax.device_put(params, p_shard)
    f_shard = frame_sharding(mesh)
    r_shard = replicated(mesh)
    f_shard_cf = frame_sharding(mesh, axis=1)  # (3, S, H, W): frames on ax 1
    out_shardings = dict(images=f_shard, pose_enc=f_shard, depth=f_shard,
                         depth_conf=f_shard, world_points_cf=f_shard_cf,
                         world_points_conf=f_shard)

    fwd = jax.jit(model.apply, in_shardings=(p_shard, f_shard, r_shard),
                  out_shardings=out_shardings)

    def model_fn(images):
        images = np.asarray(images, dtype=np.float32)
        S = images.shape[0]
        padded_len = bucket if S <= bucket else -(-S // dp) * dp
        pad = np.zeros((padded_len - S,) + images.shape[1:], np.float32)
        padded = jnp.asarray(np.concatenate([images, pad], axis=0))
        out = fwd(params_sharded, padded, jnp.int32(S))
        if as_numpy:
            host = {}
            for k, v in out.items():
                if k == "images":
                    continue
                if k == "world_points_cf":
                    host["world_points"] = np.moveaxis(
                        np.asarray(v[:, :S]), 0, -1)
                else:
                    host[k] = np.asarray(v[:S])
            return host
        return {k: (v[:, :S] if k == "world_points_cf" else v[:S])
                for k, v in out.items() if k != "images"}

    return model_fn
