"""Global map: dict of submaps + retrieval search + writers + voxel build.

Mirrors the reference `GraphMap` (vggt_slam/map.py): submap registry keyed by
id, brute-force retrieval matching (map.py:33-64, vectorized here), post-
optimization homography write-back (map.py:73-76), the TUM / npz / PCD
writers (map.py:85-168, with the Open3D PCD write replaced by the in-repo
pure-python writer), global semantic voxelization with the reference's
finite -> percentile-bbox -> coarse-occupancy outlier filters (map.py:218-297),
and COLMAP Sim(3) alignment (map.py:383-461).
"""
from __future__ import annotations

import os

import numpy as np

from vggt_slam_tpu.data.pcd import write_pcd
from vggt_slam_tpu.ops import lie
from vggt_slam_tpu.ops.voxel import voxelize_np
from vggt_slam_tpu.semantic.voxel_map import SemanticVoxel, SemanticVoxelMap
from vggt_slam_tpu.slam.alignment import parse_colmap_images_txt, rmse, umeyama_sim3_np


class GraphMap:
    def __init__(self):
        self.submaps: dict = {}

    def get_num_submaps(self) -> int:
        return len(self.submaps)

    def add_submap(self, submap) -> None:
        self.submaps[submap.get_id()] = submap

    def get_largest_key(self) -> int:
        if not self.submaps:
            return -1
        return max(self.submaps.keys())

    def get_submap(self, id):
        return self.submaps[id]

    def get_latest_submap(self):
        return self.get_submap(self.get_largest_key())

    def get_submaps(self):
        return self.submaps.values()

    def ordered_submaps_by_key(self):
        for k in sorted(self.submaps):
            yield self.submaps[k]

    # -- retrieval (map.py:33-64; vectorized L2 search) ----------------------

    def retrieve_best_score_frame(self, query_vector, current_submap_id,
                                  ignore_last_submap: bool = True):
        """Best (lowest-L2) frame over all older submaps, skipping the
        current and (optionally) previous submap."""
        best = (1000.0, 0, 0)
        q = np.asarray(query_vector, dtype=np.float32).reshape(-1)
        for key, submap in self.submaps.items():
            if key == current_submap_id:
                continue
            if ignore_last_submap and key == current_submap_id - 1:
                continue
            emb = np.asarray(submap.get_all_retrieval_vectors(), dtype=np.float32)
            if emb.size == 0:
                continue
            scores = np.linalg.norm(emb - q[None, :], axis=1)
            i = int(np.argmin(scores))
            if scores[i] < best[0]:
                best = (float(scores[i]), key, i)
        return best

    def get_frames_from_loops(self, loops):
        return [self.submaps[lp.detected_submap_id]
                .get_frame_at_index(lp.detected_submap_frame) for lp in loops]

    # -- optimization write-back --------------------------------------------

    def update_submap_homographies(self, graph) -> None:
        for key, submap in self.submaps.items():
            submap.set_reference_homography(graph.get_homography(key))

    # -- writers (map.py:85-168) --------------------------------------------

    def write_poses_to_file(self, file_name: str) -> None:
        """TUM format: frame_id x y z qx qy qz qw."""
        import jax.numpy as jnp
        parent = os.path.dirname(file_name)
        if parent:
            os.makedirs(parent, exist_ok=True)
        with open(file_name, "w") as f:
            for submap in self.ordered_submaps_by_key():
                poses = np.asarray(submap.get_all_poses_world(
                    ignore_loop_closure_frames=True))
                frame_ids = submap.get_frame_ids()
                assert len(poses) == len(frame_ids), \
                    "Number of poses and frame ids do not match"
                # ONE batched device call per submap - per-pose conversion
                # would pay the tunnel round trip for every row.
                qs = np.asarray(lie.rotmat_to_quat(
                    jnp.asarray(poses[:, :3, :3])))
                for fid, pose, q in zip(frame_ids, poses, qs):
                    x, y, z = pose[0:3, 3]
                    # our quat is (w,x,y,z); TUM wants (x,y,z,w)
                    row = np.array([float(fid), x, y, z, q[1], q[2], q[3], q[0]])
                    f.write(" ".join(f"{v:.8f}" for v in row) + "\n")

    def save_framewise_pointclouds(self, dir_name: str) -> None:
        os.makedirs(dir_name, exist_ok=True)
        for submap in self.ordered_submaps_by_key():
            pcs, fids, masks = submap.get_points_list_in_world_frame(
                ignore_loop_closure_frames=True)
            for fid, pc, mask in zip(fids, pcs, masks):
                np.savez(os.path.join(dir_name, f"{fid}.npz"),
                         pointcloud=pc, mask=mask)

    def save_frame_outputs(self, output_dir: str,
                           ignore_loop_closure_frames: bool = True) -> None:
        """Per-frame world point map + extrinsics + intrinsics npz
        (map.py:106-151)."""
        os.makedirs(output_dir, exist_ok=True)
        for submap in self.ordered_submaps_by_key():
            if submap.pointclouds is None or submap.H_world_map is None:
                continue
            end_idx = submap.pointclouds.shape[0]
            if ignore_loop_closure_frames and submap.last_non_loop_frame_index is not None:
                end_idx = min(end_idx, submap.last_non_loop_frame_index + 1)
            pcs, fids, masks = submap.get_points_list_in_world_frame(
                ignore_loop_closure_frames=ignore_loop_closure_frames)
            extr = submap.get_all_poses_world(
                ignore_loop_closure_frames=ignore_loop_closure_frames)
            intr = submap.vggt_intrinsics
            if len(pcs) != len(extr):
                print(f"Skipping submap {submap.get_id()}: "
                      f"{len(pcs)} point maps vs {len(extr)} extrinsics.")
                continue
            names = submap.frame_names
            for idx in range(min(end_idx, len(pcs))):
                if names is not None and idx < len(names):
                    stem = os.path.splitext(str(names[idx]))[0]
                    filename = f"{stem}.npz"
                else:
                    filename = f"{fids[idx]}.npz"
                np.savez(os.path.join(output_dir, filename),
                         point_map_world=pcs[idx], conf_mask=masks[idx],
                         extrinsic_world=extr[idx],
                         intrinsic=intr[idx] if intr is not None else None)

    def write_points_to_file(self, file_name: str) -> None:
        if not self.submaps:
            write_pcd(file_name, np.zeros((0, 3), np.float32),
                      np.zeros((0, 3), np.uint8))
            return
        pcd_all, colors_all = [], []
        for submap in self.ordered_submaps_by_key():
            pcd_all.append(submap.get_points_in_world_frame().reshape(-1, 3))
            colors_all.append(submap.get_points_colors())
        pts = np.concatenate(pcd_all, axis=0)
        colors = np.concatenate(colors_all, axis=0)
        if colors.max() > 1.0:
            colors = colors / 255.0
        write_pcd(file_name, pts, colors)

    # -- semantic voxelization (map.py:170-381) ------------------------------

    def build_semantic_voxel_map(self, voxel_size: float, stride: int = 1,
                                 ignore_loop_closure_frames: bool = True,
                                 deduplicate_contributors: bool = True
                                 ) -> SemanticVoxelMap:
        if voxel_size <= 0.0:
            raise ValueError("voxel_size must be > 0")
        if stride < 1:
            raise ValueError("stride must be >= 1")

        all_pts, all_feats, all_sids, all_fids = [], [], [], []
        frame_name_maps = {}
        for submap in self.ordered_submaps_by_key():
            if getattr(submap, "semantic_embeddings", None) is None:
                continue
            if submap.pointclouds is None or submap.conf is None \
                    or submap.conf_threshold is None or submap.H_world_map is None:
                continue
            end_idx = submap.pointclouds.shape[0]
            if ignore_loop_closure_frames and submap.last_non_loop_frame_index is not None:
                end_idx = min(end_idx, submap.last_non_loop_frame_index + 1)
            pts = submap.pointclouds[:end_idx]
            sem = submap.semantic_embeddings[:end_idx]
            conf = submap.conf[:end_idx]
            if stride > 1:
                pts = pts[:, ::stride, ::stride, :]
                sem = sem[:, ::stride, ::stride, :]
                conf = conf[:, ::stride, ::stride]
            mask = conf >= submap.conf_threshold
            pts_flat = pts[mask]
            sem_flat = sem[mask]
            if pts_flat.shape[0] == 0:
                continue
            frame_idx = np.broadcast_to(
                np.arange(end_idx, dtype=np.int32)[:, None, None],
                mask.shape)[mask]
            pts_world = submap._to_world(pts_flat).astype(np.float32)
            sid = int(submap.get_id())
            fid_strs = np.array([str(submap.frame_ids[int(i)])
                                 for i in frame_idx], dtype=object)

            # Per-submap outlier filters (reference map.py:245-282):
            # 1) non-finite
            finite = np.isfinite(pts_world).all(1) & np.isfinite(sem_flat).all(1)
            pts_world, sem_flat, fid_strs = \
                pts_world[finite], sem_flat[finite], fid_strs[finite]
            if pts_world.shape[0] == 0:
                continue
            # 2) robust percentile bbox
            lo = np.percentile(pts_world, 0.5, axis=0)
            hi = np.percentile(pts_world, 99.5, axis=0)
            bbox = (pts_world >= lo).all(1) & (pts_world <= hi).all(1)
            pts_world, sem_flat, fid_strs = \
                pts_world[bbox], sem_flat[bbox], fid_strs[bbox]
            if pts_world.shape[0] == 0:
                continue
            # 3) coarse-occupancy isolation filter
            coarse = float(voxel_size) * 3.0
            cc = np.floor(pts_world / coarse).astype(np.int64)
            _, inv, counts = np.unique(cc, axis=0, return_inverse=True,
                                       return_counts=True)
            dense = counts[inv] >= 10
            pts_world, sem_flat, fid_strs = \
                pts_world[dense], sem_flat[dense], fid_strs[dense]
            if pts_world.shape[0] == 0:
                continue

            all_pts.append(pts_world)
            all_feats.append(sem_flat.astype(np.float32))
            all_sids.append(np.full((pts_world.shape[0],), sid, np.int32))
            all_fids.append(fid_strs)
            if getattr(submap, "frame_id_to_name", None) is not None:
                frame_name_maps[str(sid)] = dict(submap.frame_id_to_name)

        if not all_pts:
            vox = SemanticVoxel(float(voxel_size), np.zeros((0, 3), np.float32),
                                np.zeros((0, 0), np.float32), [])
            return SemanticVoxelMap(vox, frame_name_maps=frame_name_maps)

        pts = np.concatenate(all_pts)
        feats = np.concatenate(all_feats)
        sids = np.concatenate(all_sids)
        fids = np.concatenate(all_fids)

        centers, feat_avg, inverse = voxelize_np(pts, feats, float(voxel_size))
        V = centers.shape[0]
        if deduplicate_contributors:
            sets = [set() for _ in range(V)]
            for p_i, v_i in enumerate(inverse.tolist()):
                sets[v_i].add((int(sids[p_i]), str(fids[p_i])))
            contributors = [sorted(s) for s in sets]
        else:
            contributors = [[] for _ in range(V)]
            for p_i, v_i in enumerate(inverse.tolist()):
                contributors[v_i].append((int(sids[p_i]), str(fids[p_i])))

        vox = SemanticVoxel(float(voxel_size), centers, feat_avg, contributors)
        return SemanticVoxelMap(vox, frame_name_maps=frame_name_maps)

    # -- global alignment (map.py:383-461) -----------------------------------

    def apply_similarity_transform(self, T_world_from_pred: np.ndarray) -> None:
        T = np.asarray(T_world_from_pred, dtype=np.float64)
        if T.shape != (4, 4):
            raise ValueError(f"T_world_from_pred must be 4x4, got {T.shape}")
        for submap in self.ordered_submaps_by_key():
            H = submap.get_reference_homography()
            if H is None:
                continue
            submap.set_reference_homography((T @ H).astype(np.float64))

    def align_scale_to_colmap(self, colmap_images_txt: str,
                              with_scale: bool = True,
                              ignore_loop_closure_frames: bool = True
                              ) -> np.ndarray:
        gt_centers = parse_colmap_images_txt(colmap_images_txt)
        pred_pts, gt_pts = [], []
        for submap in self.ordered_submaps_by_key():
            poses = submap.get_all_poses_world(
                ignore_loop_closure_frames=ignore_loop_closure_frames)
            if poses is None:
                continue
            names = submap.frame_names
            if names is None:
                id_to_name = submap.frame_id_to_name
                names = [id_to_name[str(f)] for f in submap.get_frame_ids()]
            if len(names) != poses.shape[0]:
                print(f"can't align submap {submap.get_id()}: "
                      f"{len(names)} names vs {poses.shape[0]} poses")
                continue
            for name, pose in zip(names, poses):
                base = str(name).split("/")[-1]
                if base in gt_centers:
                    pred_pts.append(pose[:3, 3].astype(np.float64))
                    gt_pts.append(gt_centers[base])
        if len(pred_pts) < 3:
            raise RuntimeError(
                f"Need >=3 matched frames for alignment; got {len(pred_pts)}.")
        pred = np.stack(pred_pts)
        gt = np.stack(gt_pts)
        before = rmse(pred, gt)
        s, R, t = umeyama_sim3_np(pred, gt, with_scale=with_scale)
        T = np.eye(4)
        T[:3, :3] = s * R
        T[:3, 3] = t
        after = rmse((s * (R @ pred.T)).T + t[None, :], gt)
        print(f"[align] matched frames: {len(pred_pts)}")
        print(f"[align] RMSE before: {before:.4f}  after: {after:.4f}")
        print(f"[align] scale: {s:.6f}")
        self.apply_similarity_transform(T)
        return T
