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


def _pack_coords(coords: jax.Array) -> jax.Array:
    """(N,3) int32 voxel coords -> (N,) int64 keys (21 bits/axis, offset)."""
    c = coords.astype(jnp.int64) + (1 << 20)
    return (c[:, 0] << 42) | (c[:, 1] << 21) | c[:, 2]


def _unpack_key(key: jax.Array) -> jax.Array:
    x = (key >> 42) & ((1 << 21) - 1)
    y = (key >> 21) & ((1 << 21) - 1)
    z = key & ((1 << 21) - 1)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int64) - (1 << 20)


@functools.partial(jax.jit, static_argnames=("capacity",))
def voxelize_device(points: jax.Array, feats: jax.Array, mask: jax.Array,
                    voxel_size: float, capacity: int):
    """Masked voxel-mean with static output size.

    Args:
        points: (N, 3) world points.
        feats: (N, d) features.
        mask: (N,) validity (invalid points are dropped).
        capacity: max voxels kept (first `capacity` in sorted key order).
    Returns:
        centers (capacity, 3), feat_mean (capacity, d), counts (capacity,),
        num_voxels () - entries beyond num_voxels are zero.
    """
    coords = jnp.floor(points / voxel_size).astype(jnp.int32)
    keys = _pack_coords(coords)
    # Invalid points get the sentinel max key so they sort to the end.
    sentinel = jnp.int64((1 << 62))
    keys = jnp.where(mask.astype(bool), keys, sentinel)

    order = jnp.argsort(keys)
    keys_s = keys[order]
    feats_s = feats[order]
    valid_s = (keys_s != sentinel)

    # Segment ids: increment where the key changes.
    new_seg = jnp.concatenate([jnp.ones((1,), jnp.int32),
                               (keys_s[1:] != keys_s[:-1]).astype(jnp.int32)])
    seg_id = jnp.cumsum(new_seg) - 1  # (N,), 0-based
    num_voxels_total = seg_id[-1] + 1
    # Voxels past capacity are dropped (callers pick capacity >= expected V).
    in_cap = (seg_id < capacity) & valid_s
    seg_id_c = jnp.where(in_cap, seg_id, capacity)  # overflow bucket

    w = in_cap.astype(feats.dtype)
    feat_sum = jax.ops.segment_sum(feats_s * w[:, None], seg_id_c,
                                   num_segments=capacity + 1)[:capacity]
    counts = jax.ops.segment_sum(w, seg_id_c, num_segments=capacity + 1)[:capacity]
    key_per_seg = jax.ops.segment_max(jnp.where(in_cap, keys_s, jnp.int64(-1)),
                                      seg_id_c, num_segments=capacity + 1)[:capacity]

    feat_mean = feat_sum / jnp.maximum(counts, 1.0)[:, None]
    occupied = counts > 0
    centers = (_unpack_key(jnp.maximum(key_per_seg, 0)).astype(jnp.float32) + 0.5
               ) * voxel_size
    centers = centers * occupied[:, None]
    feat_mean = feat_mean * occupied[:, None]
    # Count occupied segments directly (robust to the all-masked case, where
    # the sentinel segment would otherwise be counted).
    del num_voxels_total
    num = jnp.sum(occupied.astype(jnp.int32))
    return centers, feat_mean, counts, num
