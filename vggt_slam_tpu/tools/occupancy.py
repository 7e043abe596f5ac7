"""2D occupancy mapping + trajectory navigability analysis.

Counterpart of reference get_occupancy.py: build an (x, y) occupancy grid
from a world-frame point cloud (cell blocked when its z-range exceeds
`height_thresh`, points above `ceiling_z` excluded - get_occupancy.py:130-179),
read a COLMAP trajectory restricted to a path list, unblock cells under the
trajectory, and classify straight-line segment navigability by cell sampling
(get_occupancy.py:182-208, 215-366). Headless; viser rendering optional.

CLI: python -m vggt_slam_tpu.tools.occupancy --pcd_path ... \
        --colmap_images_txt ... --path_txt ...
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from vggt_slam_tpu.data.pcd import read_pcd
from vggt_slam_tpu.slam.alignment import _quat_wxyz_to_rotmat


def get_T_zup_from_xleft_ydown_zin() -> np.ndarray:
    """Dataset frame (x left, y down, z inward) -> right-handed z-up."""
    T = np.eye(4, dtype=np.float64)
    T[:3, :3] = np.array([[-1.0, 0.0, 0.0],
                          [0.0, 0.0, -1.0],
                          [0.0, -1.0, 0.0]])
    return T


def apply_T_world(T: np.ndarray, pts_xyz: np.ndarray) -> np.ndarray:
    pts = np.asarray(pts_xyz, dtype=np.float64)
    out = pts @ T[:3, :3].T + T[:3, 3]
    return out.astype(np.float32)


def parse_colmap_images_txt_poses(images_txt_path: str) -> Dict[str, np.ndarray]:
    """COLMAP images.txt -> {basename: cam2world (4,4)}."""
    poses: Dict[str, np.ndarray] = {}
    with open(images_txt_path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) < 10:
                continue
            try:
                qw, qx, qy, qz = map(float, parts[1:5])
                tx, ty, tz = map(float, parts[5:8])
                name = parts[9]
            except ValueError:
                continue
            R_cw = _quat_wxyz_to_rotmat(qw, qx, qy, qz)
            t_cw = np.array([tx, ty, tz])
            T = np.eye(4)
            T[:3, :3] = R_cw.T
            T[:3, 3] = -R_cw.T @ t_cw
            poses[name.split("/")[-1]] = T
    return poses


def load_path_list(path_txt: str) -> List[str]:
    with open(path_txt) as f:
        return [os.path.basename(s.strip()) for s in f if s.strip()]


def build_occupancy_from_pointcloud(points_xyz: np.ndarray, voxel_size: float,
                                    ceiling_z: float, height_thresh: float):
    """Returns (centers (M,3), is_blocked (M,), cell_keys (M,2), minz (M,))."""
    pts = np.asarray(points_xyz, dtype=np.float32)
    pts = pts[np.isfinite(pts).all(axis=1)]
    pts = pts[pts[:, 2] <= ceiling_z]
    if pts.shape[0] == 0:
        return (np.zeros((0, 3), np.float32), np.zeros((0,), bool),
                np.zeros((0, 2), np.int64), np.zeros((0,), np.float32))

    ix = np.floor(pts[:, 0] / voxel_size).astype(np.int64)
    iy = np.floor(pts[:, 1] / voxel_size).astype(np.int64)
    uniq, inv = np.unique(np.stack([ix, iy], axis=1), axis=0,
                          return_inverse=True)
    m = uniq.shape[0]
    z = pts[:, 2].astype(np.float32)
    minz = np.full((m,), np.inf, np.float32)
    maxz = np.full((m,), -np.inf, np.float32)
    np.minimum.at(minz, inv, z)
    np.maximum.at(maxz, inv, z)
    is_blocked = (maxz - minz) > float(height_thresh)

    centers = np.zeros((m, 3), np.float32)
    centers[:, 0] = (uniq[:, 0] + 0.5) * voxel_size
    centers[:, 1] = (uniq[:, 1] + 0.5) * voxel_size
    centers[:, 2] = minz + voxel_size * 0.5
    return centers, is_blocked, uniq, minz


def segment_is_navigable(p0, p1, voxel_size: float,
                         blocked_cells: Dict[Tuple[int, int], bool],
                         unknown_is_free: bool = True) -> bool:
    """Straight-line XY navigability by sampling occupancy cells."""
    p0 = np.asarray(p0, np.float32).reshape(3)
    p1 = np.asarray(p1, np.float32).reshape(3)
    d = float(np.linalg.norm(p1[:2] - p0[:2]))
    n = max(2, int(np.ceil(d / (voxel_size * 0.5))) + 1)
    ts = np.linspace(0.0, 1.0, n, dtype=np.float32)
    for t in ts:
        x = p0[0] + (p1[0] - p0[0]) * t
        y = p0[1] + (p1[1] - p0[1]) * t
        key = (int(np.floor(x / voxel_size)), int(np.floor(y / voxel_size)))
        if key not in blocked_cells:
            if unknown_is_free:
                continue
            return False
        if blocked_cells[key]:
            return False
    return True


@dataclass
class NavigabilityResult:
    details: List[bool]
    navigability: bool


def compute_navigability(pcd_path: str, colmap_images_txt: str, path_txt: str,
                         voxel_size: float = 0.2, ceiling_z: float = 1.0,
                         height_thresh: float = 0.2,
                         unknown_is_free: bool = False,
                         transform_to_zup: bool = True) -> NavigabilityResult:
    """Headless navigability evaluation (get_occupancy.py:215-366)."""
    for p in (pcd_path, colmap_images_txt, path_txt):
        if not os.path.exists(p):
            raise FileNotFoundError(p)

    pts, _ = read_pcd(pcd_path)
    if transform_to_zup:
        pts = apply_T_world(get_T_zup_from_xleft_ydown_zin(), pts)

    centers, blocked, cell_keys, _ = build_occupancy_from_pointcloud(
        pts, voxel_size, ceiling_z, height_thresh)
    blocked_cells = {(int(k[0]), int(k[1])): bool(b)
                     for k, b in zip(cell_keys, blocked)}

    poses_by_name = parse_colmap_images_txt_poses(colmap_images_txt)
    path_names = load_path_list(path_txt)
    traj_T = [poses_by_name[n] for n in path_names if n in poses_by_name]
    missing = len(path_names) - len(traj_T)
    if missing:
        print(f"[warn] Missing {missing}/{len(path_names)} images from COLMAP.")
    if len(traj_T) < 2:
        raise RuntimeError("Need at least 2 poses from path.txt.")

    traj = np.stack(traj_T)
    if transform_to_zup:
        traj = get_T_zup_from_xleft_ydown_zin()[None] @ traj
    traj_pts = traj[:, :3, 3].astype(np.float32)

    # Cells under the trajectory are free by definition.
    cell_index = {(int(k[0]), int(k[1])): i for i, k in enumerate(cell_keys)}
    for p in traj_pts:
        key = (int(np.floor(p[0] / voxel_size)), int(np.floor(p[1] / voxel_size)))
        if key in cell_index and blocked_cells.get(key, False):
            blocked[cell_index[key]] = False
            blocked_cells[key] = False

    details = [
        segment_is_navigable(traj_pts[i], traj_pts[i + 1], voxel_size,
                             blocked_cells, unknown_is_free)
        for i in range(traj_pts.shape[0] - 1)
    ]
    nav = bool(np.all(details))
    print(f"segments: {len(details)}  navigable: {int(np.sum(details))}  "
          f"blocked: {len(details) - int(np.sum(details))}  overall: {nav}")
    return NavigabilityResult(details=details, navigability=nav)


def main():
    import argparse

    p = argparse.ArgumentParser(description="Occupancy + navigability")
    p.add_argument("--pcd_path", type=str, required=True)
    p.add_argument("--colmap_images_txt", type=str, required=True)
    p.add_argument("--path_txt", type=str, required=True)
    p.add_argument("--voxel_size", type=float, default=0.2)
    p.add_argument("--ceiling_z", type=float, default=1.0)
    p.add_argument("--height_thresh", type=float, default=0.2)
    p.add_argument("--unknown_is_free", action="store_true")
    p.add_argument("--no_zup_transform", action="store_true")
    args = p.parse_args()
    res = compute_navigability(
        args.pcd_path, args.colmap_images_txt, args.path_txt,
        voxel_size=args.voxel_size, ceiling_z=args.ceiling_z,
        height_thresh=args.height_thresh,
        unknown_is_free=args.unknown_is_free,
        transform_to_zup=not args.no_zup_transform)
    print(f"Navigability: {res.navigability}")


if __name__ == "__main__":
    main()
