"""Voxelization: average per-point features over occupied voxels.

TPU-native counterpart of the reference's torch `unique`/`index_add_` path
(map.py:322-348) and its numpy fallback (map.py:349-362). Two paths:

* `voxelize_np`: exact host path using np.unique - matches the reference's
  output ordering (lexicographic unique coords) byte-for-byte; used by the
  persistence/provenance pipeline.
* `voxelize_device`: static-shape device path - sort-based segmenting over
  packed int64 voxel keys with `jax.ops.segment_sum`, returning padded
  (capacity, ...) arrays plus an occupancy count. Used when voxelization is
  fused into the on-device mapping step (no host sync).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def voxelize_np(points: np.ndarray, feats: np.ndarray, voxel_size: float):
    """Exact voxel-mean. Returns (centers (V,3) f32, feat_means (V,d) f32,
    inverse (N,) mapping point -> voxel index)."""
    coords = np.floor(points / voxel_size).astype(np.int64)
    unique_coords, inverse = np.unique(coords, axis=0, return_inverse=True)
    V = unique_coords.shape[0]
    d = feats.shape[-1]
    feat_sum = np.zeros((V, d), dtype=np.float32)
    counts = np.zeros((V,), dtype=np.int64)
    np.add.at(feat_sum, inverse, feats.astype(np.float32))
    np.add.at(counts, inverse, 1)
    feat_avg = feat_sum / counts[:, None]
    centers = ((unique_coords.astype(np.float32) + 0.5) * voxel_size)
    return centers.astype(np.float32), feat_avg, inverse


@functools.partial(jax.jit, static_argnames=("capacity",))
def voxelize_device(points: jax.Array, feats: jax.Array, mask: jax.Array,
                    voxel_size: float, capacity: int):
    """Masked voxel-mean with static output size.

    int32-only (TPU-friendly, no x64 requirement): points are lexsorted by
    integer voxel coordinate, runs of equal coordinates become segments, and
    features are segment-summed.

    Args:
        points: (N, 3) world points.
        feats: (N, d) features.
        mask: (N,) validity (invalid points are dropped).
        capacity: max voxels kept (first `capacity` in sorted coord order).
    Returns:
        centers (capacity, 3), feat_mean (capacity, d), counts (capacity,),
        num_voxels () - entries beyond num_voxels are zero.
    """
    coords = jnp.floor(points / voxel_size).astype(jnp.int32)
    # Invalid points get a sentinel coordinate sorting after everything.
    sentinel = jnp.int32(1 << 24)
    coords = jnp.where(mask.astype(bool)[:, None], coords, sentinel)

    order = jnp.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))
    coords_s = coords[order]
    feats_s = feats[order]
    valid_s = coords_s[:, 0] != sentinel

    changed = jnp.any(coords_s[1:] != coords_s[:-1], axis=1)
    new_seg = jnp.concatenate([jnp.ones((1,), jnp.int32),
                               changed.astype(jnp.int32)])
    seg_id = jnp.cumsum(new_seg) - 1  # (N,), 0-based
    # Voxels past capacity are dropped (callers pick capacity >= expected V).
    in_cap = (seg_id < capacity) & valid_s
    seg_id_c = jnp.where(in_cap, seg_id, capacity)  # overflow bucket

    w = in_cap.astype(feats.dtype)
    feat_sum = jax.ops.segment_sum(feats_s * w[:, None], seg_id_c,
                                   num_segments=capacity + 1)[:capacity]
    counts = jax.ops.segment_sum(w, seg_id_c, num_segments=capacity + 1)[:capacity]
    coord_per_seg = jax.ops.segment_max(
        jnp.where(in_cap[:, None], coords_s, -sentinel), seg_id_c,
        num_segments=capacity + 1)[:capacity]

    feat_mean = feat_sum / jnp.maximum(counts, 1.0)[:, None]
    occupied = counts > 0
    centers = (coord_per_seg.astype(jnp.float32) + 0.5) * voxel_size
    centers = jnp.where(occupied[:, None], centers, 0.0)
    feat_mean = feat_mean * occupied[:, None]
    num = jnp.sum(occupied.astype(jnp.int32))
    return centers, feat_mean, counts, num
