"""Per-submap store: poses, frames, point maps, confidences, retrieval vectors.

Mirrors the reference `Submap` (vggt_slam/submap.py) including its
confidence-percentile policy (submap.py:38), SL(4) pose readout
(submap.py:92-104, done here by the batched jit in ops/geometry.py), and the
world-frame point export with confidence filtering and stride
(submap.py:155-188). Storage is host numpy; the hot transforms run on device.
"""
from __future__ import annotations

import os
import re

import numpy as np
import jax.numpy as jnp

from vggt_slam_tpu.ops import geometry, lie


def _wide_dtype():
    """float64 when x64 is enabled (CPU tests), else float32 (TPU default)."""
    import jax
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


class Submap:
    def __init__(self, submap_id: int):
        self.submap_id = submap_id
        self.H_world_map: np.ndarray | None = None
        self.poses: np.ndarray | None = None          # (S,4,4) cam->submap
        self.frames: np.ndarray | None = None         # (S,3,H,W) float [0,1]
        self.vggt_intrinsics: np.ndarray | None = None
        self.retrieval_vectors: np.ndarray | None = None
        self.colors: np.ndarray | None = None         # (S,H,W,3) uint8
        self.conf: np.ndarray | None = None           # (S,H,W)
        self.conf_masks: np.ndarray | None = None
        self.conf_threshold: float | None = None
        self.pointclouds: np.ndarray | None = None    # (S,H,W,3)
        self.last_non_loop_frame_index: int | None = None
        self.frame_ids: list[float] | None = None
        self.frame_names: list[str] | None = None
        self.frame_id_to_name: dict[str, str] | None = None
        self.semantic_embeddings: np.ndarray | None = None  # (S,H,W,d)

    # -- population ---------------------------------------------------------

    def add_all_poses(self, poses: np.ndarray) -> None:
        self.poses = np.asarray(poses)

    def add_all_points(self, points, colors, conf, conf_threshold_percentile,
                       intrinsics) -> None:
        self.pointclouds = np.asarray(points)
        self.colors = np.asarray(colors)
        self.conf = np.asarray(conf)
        self.conf_threshold = float(np.percentile(self.conf,
                                                  conf_threshold_percentile))
        self.vggt_intrinsics = np.asarray(intrinsics)

    def add_all_frames(self, frames) -> None:
        self.frames = np.asarray(frames)

    def add_all_semantic_embeddings(self, semantic_embeddings) -> None:
        if semantic_embeddings is None:
            self.semantic_embeddings = None
            return
        sem = np.asarray(semantic_embeddings)
        if sem.ndim != 4:
            raise ValueError(
                f"semantic_embeddings must be (S,H,W,d), got {sem.shape}")
        if self.pointclouds is not None and sem.shape[:3] != self.pointclouds.shape[:3]:
            raise ValueError(
                "semantic_embeddings spatial dims must match pointclouds: "
                f"{sem.shape[:3]} vs {self.pointclouds.shape[:3]}")
        self.semantic_embeddings = sem

    def set_frame_ids(self, file_paths: list[str]) -> None:
        """Extract numeric frame ids from filenames (reference submap.py:109)."""
        frame_ids, frame_names, id_to_name = [], [], {}
        for path in file_paths:
            filename = os.path.basename(path)
            m = re.search(r"\d+(?:\.\d+)?", filename)
            if not m:
                raise ValueError(f"No number found in image name: {filename}")
            fid = float(m.group())
            frame_ids.append(fid)
            frame_names.append(filename)
            id_to_name[str(fid)] = filename
        self.frame_ids = frame_ids
        self.frame_names = frame_names
        self.frame_id_to_name = id_to_name

    def set_last_non_loop_frame_index(self, idx: int) -> None:
        self.last_non_loop_frame_index = idx

    def set_reference_homography(self, H_world_map: np.ndarray) -> None:
        self.H_world_map = np.asarray(H_world_map)

    def set_all_retrieval_vectors(self, vecs) -> None:
        self.retrieval_vectors = np.asarray(vecs)

    add_all_retrieval_vectors = set_all_retrieval_vectors

    def set_conf_masks(self, conf_masks) -> None:
        self.conf_masks = np.asarray(conf_masks)

    # -- queries -------------------------------------------------------------

    def get_id(self) -> int:
        return self.submap_id

    def get_conf_threshold(self) -> float:
        return self.conf_threshold

    def get_frame_at_index(self, index: int):
        return self.frames[index]

    def get_last_non_loop_frame_index(self):
        return self.last_non_loop_frame_index

    def get_all_frames(self):
        return self.frames

    def get_all_retrieval_vectors(self):
        return self.retrieval_vectors

    def get_reference_homography(self) -> np.ndarray:
        return self.H_world_map

    def get_frame_pointcloud(self, pose_index: int) -> np.ndarray:
        return self.pointclouds[pose_index]

    def get_pose_subframe(self, pose_index: int) -> np.ndarray:
        return np.linalg.inv(self.poses[pose_index])

    def get_frame_ids(self):
        return self.frame_ids

    def get_all_poses_world(self, ignore_loop_closure_frames: bool = False
                            ) -> np.ndarray:
        """World SE(3) poses through the optimized SL(4) (submap.py:91-104)."""
        dt = _wide_dtype()
        poses = np.asarray(geometry.poses_world_from_submap(
            jnp.asarray(self.vggt_intrinsics, dtype=dt),
            jnp.asarray(self.poses, dtype=dt),
            jnp.asarray(self.H_world_map, dtype=dt)))
        if ignore_loop_closure_frames and self.last_non_loop_frame_index is not None:
            poses = poses[: self.last_non_loop_frame_index + 1]
        return poses

    # -- point export (submap.py:155-219 semantics) --------------------------

    def filter_data_by_confidence(self, data: np.ndarray, stride: int = 1):
        if stride == 1:
            return data[self.conf >= self.conf_threshold]
        conf_sub = self.conf[:, ::stride, ::stride]
        data_sub = data[:, ::stride, ::stride, ...]
        return data_sub[conf_sub >= self.conf_threshold]

    def _to_world(self, pts_flat: np.ndarray) -> np.ndarray:
        dt = _wide_dtype()
        return np.asarray(lie.apply_homography(
            jnp.asarray(self.H_world_map, dtype=dt),
            jnp.asarray(pts_flat, dtype=dt)))

    def get_points_in_world_frame(self, stride: int = 1) -> np.ndarray:
        pts = self.filter_data_by_confidence(self.pointclouds, stride)
        return self._to_world(pts.reshape(-1, 3))

    def get_points_colors(self, stride: int = 1) -> np.ndarray:
        return self.filter_data_by_confidence(self.colors, stride).reshape(-1, 3)

    def get_points_list_in_world_frame(self, ignore_loop_closure_frames=False):
        """Per-frame world point maps + ids + conf masks (submap.py:166-180)."""
        end_idx = self.pointclouds.shape[0]
        if ignore_loop_closure_frames and self.last_non_loop_frame_index is not None:
            end_idx = min(end_idx, self.last_non_loop_frame_index + 1)
        pts = self.pointclouds[:end_idx]
        # ONE batched transform for all frames (a per-frame device call
        # would pay the tunnel round trip S times at artifact-save time).
        world_all = self._to_world(pts.reshape(-1, 3)).reshape(pts.shape)
        point_list, frame_id_list, frame_conf_mask = [], [], []
        for index in range(end_idx):
            point_list.append(world_all[index])
            frame_id_list.append(self.frame_ids[index]
                                 if self.frame_ids is not None and
                                 index < len(self.frame_ids) else index)
            frame_conf_mask.append(self.conf_masks[index] >= self.conf_threshold)
        return point_list, frame_id_list, frame_conf_mask

    def get_semantic_voxel_in_world_frame(self, voxel_size: float,
                                          stride: int = 1,
                                          ignore_loop_closure_frames=False):
        """Voxel-average dense semantic features in world frame
        (reference submap.py:221-311)."""
        from vggt_slam_tpu.semantic.voxel_map import SemanticVoxel
        from vggt_slam_tpu.ops.voxel import voxelize_np

        if voxel_size <= 0.0:
            raise ValueError("voxel_size must be > 0")
        if self.pointclouds is None or self.semantic_embeddings is None \
                or self.H_world_map is None:
            raise RuntimeError("submap missing points/semantics/homography")

        end_idx = self.pointclouds.shape[0]
        if ignore_loop_closure_frames and self.last_non_loop_frame_index is not None:
            end_idx = min(end_idx, self.last_non_loop_frame_index + 1)
        pts = self.pointclouds[:end_idx]
        sem = self.semantic_embeddings[:end_idx]
        conf = self.conf[:end_idx]
        mask = conf >= self.conf_threshold
        pts_flat = pts[mask]
        sem_flat = sem[mask]
        if pts_flat.shape[0] == 0:
            return SemanticVoxel(voxel_size=voxel_size,
                                 centers_world=np.zeros((0, 3), np.float32),
                                 features=np.zeros((0, sem.shape[-1]), np.float32),
                                 contributors=[])
        frame_idx = np.broadcast_to(
            np.arange(end_idx, dtype=np.int32)[:, None, None], mask.shape)[mask]
        pts_world = self._to_world(pts_flat).astype(np.float32)
        centers, feats, inverse = voxelize_np(pts_world, sem_flat.astype(np.float32),
                                              voxel_size)
        contributors = [[] for _ in range(centers.shape[0])]
        sid = int(self.submap_id)
        for p_i, v_i in enumerate(inverse.tolist()):
            fi = int(frame_idx[p_i])
            fid = str(self.frame_ids[fi]) if (self.frame_ids is not None and
                                              fi < len(self.frame_ids)) else str(fi)
            contributors[v_i].append((sid, fid))
        return SemanticVoxel(voxel_size=voxel_size, centers_world=centers,
                             features=feats, contributors=contributors)
