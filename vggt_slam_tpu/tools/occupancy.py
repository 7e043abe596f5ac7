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


def segment_sample_overlay(traj_pts: np.ndarray, voxel_size: float,
                           blocked_cells: Dict[Tuple[int, int], bool],
                           cell_center_z: Dict[Tuple[int, int], float],
                           floor_z: float, unknown_is_free: bool = False):
    """Per-segment navigability plus renderable sample dots.

    For every consecutive trajectory pair, samples the straight XY line at
    half-cell steps; each sample snaps to its occupancy cell's z (+0.2 m for
    visibility) and is colored green (free) / purple (blocked) - reference
    get_occupancy.py:556-601. Returns (points (M,3) f32, colors (M,3) f32,
    per-segment navigable list). Pure numpy so it is testable headless.
    """
    seg_pts, seg_cols, navigable = [], [], []
    vs = float(voxel_size)
    for i in range(traj_pts.shape[0] - 1):
        p0, p1 = traj_pts[i], traj_pts[i + 1]
        navigable.append(segment_is_navigable(
            p0, p1, vs, blocked_cells, unknown_is_free))
        dxy = float(np.linalg.norm(p1[:2] - p0[:2]))
        n = max(2, int(np.ceil(dxy / (vs * 0.5))) + 1)
        ts = np.linspace(0.0, 1.0, n, dtype=np.float32)
        for t in ts:
            x = float(p0[0] + (p1[0] - p0[0]) * t)
            y = float(p0[1] + (p1[1] - p0[1]) * t)
            key = (int(np.floor(x / vs)), int(np.floor(y / vs)))
            blk = blocked_cells.get(key, not unknown_is_free)
            zc = cell_center_z.get(key, floor_z + vs * 0.5)
            seg_pts.append([x, y, zc + 0.2])
            seg_cols.append([0.6, 0.0, 0.8] if blk else [0.0, 1.0, 0.0])
    pts = np.asarray(seg_pts, np.float32).reshape(-1, 3)
    cols = np.asarray(seg_cols, np.float32).reshape(-1, 3)
    return pts, cols, navigable


@dataclass
class NavigabilityResult:
    details: List[bool]
    navigability: bool


def _prepare_scene(pcd_path: str, colmap_images_txt: str, path_txt: str,
                   voxel_size: float, ceiling_z: float, height_thresh: float,
                   transform_to_zup: bool) -> dict:
    """Shared loading for the headless evaluator and the viser viewer:
    point cloud (+z-up transform), occupancy grid, trajectory restricted to
    the path list (same transform), trajectory cells force-unblocked."""
    for p in (pcd_path, colmap_images_txt, path_txt):
        if not os.path.exists(p):
            raise FileNotFoundError(p)

    pts, colors = read_pcd(pcd_path)
    if transform_to_zup:
        pts = apply_T_world(get_T_zup_from_xleft_ydown_zin(), pts)

    centers, blocked, cell_keys, _ = build_occupancy_from_pointcloud(
        pts, voxel_size, ceiling_z, height_thresh)
    blocked_cells = {(int(k[0]), int(k[1])): bool(b)
                     for k, b in zip(cell_keys, blocked)}
    cell_center_z = {(int(k[0]), int(k[1])): float(c[2])
                     for k, c in zip(cell_keys, centers)}

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
    n_unblocked = 0
    for p in traj_pts:
        key = (int(np.floor(p[0] / voxel_size)),
               int(np.floor(p[1] / voxel_size)))
        if key in cell_index and blocked_cells.get(key, False):
            blocked[cell_index[key]] = False
            blocked_cells[key] = False
            n_unblocked += 1
    if n_unblocked:
        print(f"Unblocked {n_unblocked} occupancy cells under trajectory.")

    return dict(pts=pts, colors=colors, centers=centers, blocked=blocked,
                cell_keys=cell_keys, blocked_cells=blocked_cells,
                cell_center_z=cell_center_z, traj=traj, traj_pts=traj_pts)


def compute_navigability(pcd_path: str, colmap_images_txt: str, path_txt: str,
                         voxel_size: float = 0.2, ceiling_z: float = 1.0,
                         height_thresh: float = 0.2,
                         unknown_is_free: bool = False,
                         transform_to_zup: bool = True) -> NavigabilityResult:
    """Headless navigability evaluation (get_occupancy.py:215-366)."""
    scene = _prepare_scene(pcd_path, colmap_images_txt, path_txt,
                           voxel_size, ceiling_z, height_thresh,
                           transform_to_zup)
    traj_pts, blocked_cells = scene["traj_pts"], scene["blocked_cells"]
    details = [
        segment_is_navigable(traj_pts[i], traj_pts[i + 1], voxel_size,
                             blocked_cells, unknown_is_free)
        for i in range(traj_pts.shape[0] - 1)
    ]
    nav = bool(np.all(details))
    print(f"segments: {len(details)}  navigable: {int(np.sum(details))}  "
          f"blocked: {len(details) - int(np.sum(details))}  overall: {nav}")
    return NavigabilityResult(details=details, navigability=nav)


def visualize_occupancy(args) -> None:
    """Viser rendering of the occupancy scene (get_occupancy.py:371-626):
    occupancy cells (gray free / red blocked), ceiling-filtered raw points,
    trajectory dots (orange, blue start, green end), optional camera
    frames+frustums, and per-segment navigability sample dots."""
    import viser
    import viser.transforms as viser_tf

    scene = _prepare_scene(args.pcd_path, args.colmap_images_txt,
                           args.path_txt, args.voxel_size, args.ceiling_z,
                           args.height_thresh, not args.no_zup_transform)
    centers, blocked = scene["centers"], scene["blocked"]
    pts, colors, traj_pts = scene["pts"], scene["colors"], scene["traj_pts"]

    server = viser.ViserServer(host="0.0.0.0", port=int(args.port))

    # Occupancy cells, subsampled to the render cap.
    cvis, bvis = centers, blocked
    if centers.shape[0] > args.max_cubes:
        idx = np.random.choice(centers.shape[0], args.max_cubes,
                               replace=False)
        cvis, bvis = centers[idx], blocked[idx]
        print(f"[warn] subsampling cells {centers.shape[0]} -> {args.max_cubes}")
    cell_colors = np.full((cvis.shape[0], 3), 0.8, np.float32)
    cell_colors[bvis] = (1.0, 0.0, 0.0)
    server.scene.add_point_cloud(
        "occupancy/cells", points=cvis, colors=cell_colors,
        point_size=float(args.voxel_size * 0.8), point_shape="rounded")

    # Raw points under the ceiling, strided.
    zmask = pts[:, 2] <= args.ceiling_z
    vpts = pts[zmask][::args.vis_stride]
    if colors is not None:
        vcols = np.asarray(colors)[zmask][::args.vis_stride]
        if vcols.dtype != np.uint8 and vcols.max() <= 1.0:
            vcols = (vcols * 255).astype(np.uint8)
    else:
        vcols = np.full((vpts.shape[0], 3), 160, np.uint8)
    server.scene.add_point_cloud(
        "occupancy/points", points=vpts, colors=vcols,
        point_size=float(args.voxel_size * 0.5), point_shape="rounded")

    # Trajectory: orange dots, blue start, green end.
    tcols = np.tile(np.array([1.0, 0.5, 0.0], np.float32),
                    (traj_pts.shape[0], 1))
    tcols[0], tcols[-1] = (0.0, 0.0, 1.0), (0.0, 1.0, 0.0)
    server.scene.add_point_cloud(
        "trajectory/points", points=traj_pts, colors=tcols,
        point_size=float(args.traj_point_size), point_shape="diamond")

    if args.show_camera_frames:
        for i, T in enumerate(scene["traj"]):
            Tw = viser_tf.SE3.from_matrix(np.asarray(T)[:3, :])
            server.scene.add_frame(
                f"trajectory/frame_{i}", wxyz=Tw.rotation().wxyz,
                position=Tw.translation(), axes_length=0.05,
                axes_radius=0.002, origin_radius=0.002)
            server.scene.add_camera_frustum(
                f"trajectory/frustum_{i}", fov=1.0, aspect=1.0, scale=0.08,
                wxyz=Tw.rotation().wxyz, position=Tw.translation(),
                color=tuple(float(v) for v in tcols[i]))

    floor_z = float(np.percentile(pts[:, 2], 1)) if pts.shape[0] else 0.0
    seg_pts, seg_cols, navigable = segment_sample_overlay(
        traj_pts, args.voxel_size, scene["blocked_cells"],
        scene["cell_center_z"], floor_z, args.unknown_is_free)
    if seg_pts.shape[0]:
        server.scene.add_point_cloud(
            "trajectory/segments", points=seg_pts, colors=seg_cols,
            point_size=float(max(args.segment_point_size,
                                 args.voxel_size * 0.4)),
            point_shape="circle")
    nav = np.asarray(navigable)
    print(f"segments: {nav.size}  navigable: {int(nav.sum())}  "
          f"blocked: {int(nav.size - nav.sum())}  overall: {bool(nav.all())}")
    print(f"Visualization ready: http://localhost:{args.port}  "
          "Press Enter to exit...")
    try:
        input()
    except (KeyboardInterrupt, EOFError):
        pass


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
    p.add_argument("--visualize", action="store_true",
                   help="render the scene in viser instead of headless eval")
    p.add_argument("--port", type=int, default=8090)
    p.add_argument("--max_cubes", type=int, default=60000)
    p.add_argument("--show_camera_frames", action="store_true")
    p.add_argument("--traj_point_size", type=float, default=0.1)
    p.add_argument("--segment_point_size", type=float, default=0.01)
    p.add_argument("--vis_stride", type=int, default=4)
    args = p.parse_args()
    if args.visualize:
        visualize_occupancy(args)
        return
    res = compute_navigability(
        args.pcd_path, args.colmap_images_txt, args.path_txt,
        voxel_size=args.voxel_size, ceiling_z=args.ceiling_z,
        height_thresh=args.height_thresh,
        unknown_is_free=args.unknown_is_free,
        transform_to_zup=not args.no_zup_transform)
    print(f"Navigability: {res.navigability}")


if __name__ == "__main__":
    main()
