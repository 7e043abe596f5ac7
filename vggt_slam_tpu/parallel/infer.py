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

# Output keys whose frame axis is axis 1 (channel-first (3,S,H,W) maps);
# everything else carries frames on axis 0.
_CF_KEYS = ("world_points_cf", "unproj_points_cf")


def _output_shardings(fn, mesh, *example_args):
    """Frame-sharding pytree matching fn's ACTUAL output structure.

    The model's output dict varies with its config (enable_point_head /
    enable_depth_head / with_unprojection), so the shardings are derived
    from jax.eval_shape rather than a hardcoded key list.
    """
    out_shape = jax.eval_shape(fn, *example_args)
    return {k: frame_sharding(mesh, axis=1 if k in _CF_KEYS else 0)
            for k in out_shape}


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

    dp = mesh.shape["dp"]
    example = jax.ShapeDtypeStruct((dp, 3, model.cfg.img_size,
                                    model.cfg.img_size), jnp.float32)
    out_shardings = _output_shardings(model.apply, mesh, params, example)

    fwd = jax.jit(model.apply, in_shardings=(p_shard, f_shard),
                  out_shardings=out_shardings)
    return fwd, params_sharded


def make_sharded_submap_forward(model, params, bucket_size: int, mesh=None,
                                with_unprojection: bool = False,
                                seq_parallel: bool = False,
                                image_hw=None):
    """Device-resident sharded forward: the piece of
    make_sharded_bucketed_model_fn below WITHOUT the host numpy boundary.

    Returns (fwd, params_sharded, bucket, mesh) where
    fwd(params_sharded, padded_images, valid_frames) is the jitted
    forward with dp/tp (and optionally ring/sequence-parallel) shardings;
    the caller keeps `padded_images` ((bucket, 3, H, W)) resident on
    device across calls — which is what a serving/bench loop needs
    (bench.py --shard measures this path; through the axon tunnel a
    per-step host upload would dominate the step).
    """
    import dataclasses

    from vggt_slam_tpu.ops import geometry

    if mesh is None:
        mesh = make_mesh()
    if seq_parallel:
        from vggt_slam_tpu.models.vggt.model import VGGT
        model = VGGT(dataclasses.replace(model.cfg, global_seq_mesh=mesh,
                                         global_seq_axis="dp"))
    dp = mesh.shape["dp"]
    bucket = -(-bucket_size // dp) * dp

    p_shard = make_param_shardings(params, mesh)
    params_sharded = jax.device_put(params, p_shard)
    f_shard = frame_sharding(mesh)
    r_shard = replicated(mesh)

    def _apply(params, images, valid_frames=None):
        out = dict(model.apply(params, images, valid_frames))
        if with_unprojection and "depth" in out:
            extr, intr = geometry.pose_encoding_to_extri_intri(
                out["pose_enc"], images.shape[-2:])
            out["extrinsic"], out["intrinsic"] = extr, intr
            out["unproj_points_cf"] = \
                geometry.unproject_depth_map_to_point_map_cf(
                    out["depth"][..., 0], extr, intr)
        return out

    H, W = image_hw if image_hw else (model.cfg.img_size,
                                      model.cfg.img_size)
    example = (jax.ShapeDtypeStruct((bucket, 3, H, W), jnp.float32),
               jax.ShapeDtypeStruct((), jnp.int32))
    out_shardings = _output_shardings(_apply, mesh, params, *example)

    fwd = jax.jit(_apply, in_shardings=(p_shard, f_shard, r_shard),
                  out_shardings=out_shardings)
    return fwd, params_sharded, bucket, mesh


def make_sharded_bucketed_model_fn(model, params, bucket_size: int,
                                   mesh=None, as_numpy: bool = True,
                                   with_unprojection: bool = False,
                                   seq_parallel: bool = False):
    """Sharded counterpart of models.vggt.model.make_bucketed_model_fn:
    a prediction callable that pads every submap batch to a fixed bucket
    (rounded up so the frame axis divides the dp mesh axis), passes a traced
    `valid_frames`, and runs the forward sharded over the ("dp","tp") mesh.
    Drop-in for the SLAM solver's model_fn (main.py --shard).

    `with_unprojection=True` mirrors the single-chip path: camera decode +
    depth unprojection run INSIDE the sharded jit (frame-parallel over dp),
    so sharded runs skip the per-submap host depth round-trip too.

    `seq_parallel=True` runs the exact global-attention path as RING
    attention over the dp axis (parallel/ring.py): tokens stay sharded and
    K/V chunks rotate via ppermute instead of XLA all-gathering the full
    S*P-token sequence onto every chip at each of the 24 global blocks.
    Only meaningful when the model is exact (global_kv_stride == 1); the
    merged path's reduced K/V set is cheap to all-gather and keeps the
    regular dispatch.
    """
    import numpy as np

    fwd, params_sharded, bucket, mesh = make_sharded_submap_forward(
        model, params, bucket_size, mesh=mesh,
        with_unprojection=with_unprojection, seq_parallel=seq_parallel)
    dp = mesh.shape["dp"]

    def _slice(k, v, S):
        return v[:, :S] if k in _CF_KEYS else v[:S]

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
                if k in _CF_KEYS:
                    host[k.replace("_cf", "")] = np.moveaxis(
                        np.asarray(v[:, :S]), 0, -1)
                else:
                    host[k] = np.asarray(v[:S])
            return host
        return {k: _slice(k, v, S) for k, v in out.items() if k != "images"}

    return model_fn
