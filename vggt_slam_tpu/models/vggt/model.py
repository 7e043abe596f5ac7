"""VGGT: feedforward multi-view geometry transformer (TPU-native).

Produces, for a submap of S frames in ONE forward pass, everything the SLAM
solver consumes (reference solver.py:469-480): camera pose encodings, depth
maps + confidence, world-frame point maps + confidence. Output dict keys and
shapes match the reference's post-squeeze contract:

    pose_enc           (S, 9)
    depth              (S, H, W, 1)
    depth_conf         (S, H, W)
    world_points_cf    (3, S, H, W)   - CHANNEL-FIRST on device; hosts
                                        restore (S, H, W, 3) with a free
                                        np.moveaxis view (a channels-last
                                        device buffer pads 3 -> 128 lanes,
                                        ~42x - ARCHITECTURE.md section 8)
    world_points_conf  (S, H, W)
    images             (S, 3, H, W)   - the (possibly padded) inputs
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from vggt_slam_tpu.models.vggt.config import VGGTConfig
from vggt_slam_tpu.models.vggt.aggregator import Aggregator
from vggt_slam_tpu.models.vggt.heads import (CameraHead, DPTHead,
                                             activate_depth, activate_points)


class VGGT(nn.Module):
    cfg: VGGTConfig

    @nn.compact
    def __call__(self, images: jax.Array, valid_frames=None) -> dict:
        cfg = self.cfg
        S, _, H, W = images.shape
        captured = Aggregator(cfg, name="aggregator")(images, valid_frames)
        out = {"images": images}

        pose_enc = CameraHead(cfg, name="camera_head")(
            captured[cfg.agg_depth - 1], valid_frames)
        out["pose_enc"] = pose_enc

        if cfg.enable_depth_head:
            raw = DPTHead(cfg, out_channels=2, name="depth_head")(
                captured, (H, W))
            depth, depth_conf = activate_depth(raw)
            out["depth"] = depth
            out["depth_conf"] = depth_conf

        if cfg.enable_point_head:
            raw = DPTHead(cfg, out_channels=4, name="point_head")(
                captured, (H, W))
            pts_cf, conf = activate_points(raw)
            out["world_points_cf"] = pts_cf
            out["world_points_conf"] = conf

        return out


def init_params(cfg: VGGTConfig, rng: jax.Array, sample_frames: int = 2,
                image_hw: Optional[tuple[int, int]] = None):
    H, W = image_hw if image_hw is not None else (cfg.img_size, cfg.img_size)
    model = VGGT(cfg)
    dummy = jnp.zeros((sample_frames, 3, H, W), dtype=jnp.float32)
    return model.init(rng, dummy)


def make_bucketed_model_fn(model: VGGT, params, bucket_size: int,
                           as_numpy: bool = True,
                           with_unprojection: bool = False):
    """Prediction callable with static-shape submap bucketing.

    Pads any (S, 3, H, W) batch with S <= bucket_size up to exactly
    bucket_size frames and passes `valid_frames=S`, so the jit program
    compiles ONCE per (bucket, resolution) instead of once per distinct
    frame count (variable keyframe counts, last-partial submaps, and
    0..max_loops appended loop frames all hit the same program). Outputs
    are sliced back to the true S.

    `as_numpy=False` returns device arrays WITHOUT forcing a host readback:
    the call only dispatches work, so the caller can overlap host-side work
    (image decode, keyframing, integrating the previous submap) with the
    forward and materialize later - the lever behind the pipelined SLAM
    loop (main.py --pipeline).

    Boundary layout: the model emits `world_points_cf` (3, S, H, W)
    channel-first (see the module docstring). With as_numpy=True the
    (S, H, W, 3) numpy contract is restored via a free moveaxis VIEW under
    the key `world_points`; with as_numpy=False the dict keeps
    `world_points_cf` and the consumer (slam/solver.collect_predictions)
    does the same on materialize.

    `with_unprojection=True` additionally decodes camera parameters and
    depth-unprojects world points INSIDE the same compiled program
    (`extrinsic` (S,3,4), `intrinsic` (S,3,3), `unproj_points_cf`
    (3,S,H,W)): the SLAM registration path (reference solver.py:249-263)
    then needs no depth round-trip and no per-submap-size recompiles -
    padded frames produce garbage camera rows that the [:S] slice drops.
    """
    import numpy as np

    from vggt_slam_tpu.ops import geometry

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

    fwd = jax.jit(_apply)

    _CF_KEYS = ("world_points_cf", "unproj_points_cf")

    def _slice(k, v, S):
        return v[:, :S] if k in _CF_KEYS else v[:S]

    def model_fn(images):
        images = np.asarray(images, dtype=np.float32)
        S = images.shape[0]
        if S > bucket_size:
            out = fwd(params, jnp.asarray(images))  # rare overflow: own compile
        else:
            pad = np.zeros((bucket_size - S,) + images.shape[1:], np.float32)
            padded = jnp.asarray(np.concatenate([images, pad], axis=0))
            # valid_frames is TRACED: every S <= bucket_size reuses one
            # compiled program.
            out = fwd(params, padded, jnp.int32(S))
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


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
