"""Offline visualization of saved SLAM results.

Counterpart of reference visualize_results.py: load the saved artifacts
(result.pcd, frame_output/*.npz point maps + world extrinsics, TUM pose log,
optional semantic voxel dir), apply the percentile bounding-box crop
(visualize_results.py:201-211), and render in viser (camera frustums +
point cloud + optional voxel layer on a second port / side-by-side X
offset). Headless mode prints artifact statistics so the tool still works
without viser installed.
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from vggt_slam_tpu.data.pcd import read_pcd


def percentile_bbox_crop(points: np.ndarray, colors: np.ndarray | None,
                         lo_pct: float = 0.5, hi_pct: float = 99.5):
    """Drop points outside the [lo, hi] percentile box per axis."""
    lo = np.percentile(points, lo_pct, axis=0)
    hi = np.percentile(points, hi_pct, axis=0)
    mask = (points >= lo).all(axis=1) & (points <= hi).all(axis=1)
    return points[mask], (colors[mask] if colors is not None else None)


def load_frame_outputs(frame_output_dir: str):
    """Load frame_output/*.npz -> (point_maps, conf_masks, extrinsics, names)."""
    pts, masks, extr, names = [], [], [], []
    for path in sorted(glob.glob(os.path.join(frame_output_dir, "*.npz"))):
        d = np.load(path, allow_pickle=True)
        pts.append(d["point_map_world"])
        masks.append(d["conf_mask"])
        extr.append(d["extrinsic_world"])
        names.append(os.path.splitext(os.path.basename(path))[0])
    return pts, masks, extr, names


def load_tum_poses(path: str) -> np.ndarray:
    """TUM log -> (N, 8) [t x y z qx qy qz qw]."""
    return np.loadtxt(path).reshape(-1, 8)


def main():
    p = argparse.ArgumentParser(description="Visualize saved SLAM results")
    p.add_argument("--pcd_path", default=None)
    p.add_argument("--frame_output_dir", default=None)
    p.add_argument("--pose_log", default=None)
    p.add_argument("--voxel_dir", default=None)
    p.add_argument("--crop_percentile", type=float, default=99.5)
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--voxel_port", type=int, default=8081)
    p.add_argument("--voxel_x_offset", type=float, default=0.0,
                   help="side-by-side X offset for the voxel layer")
    p.add_argument("--point_size", type=float, default=0.003)
    p.add_argument("--stride", type=int, default=1)
    p.add_argument("--headless", action="store_true",
                   help="print stats only (default when viser is missing)")
    args = p.parse_args()

    points = colors = None
    if args.pcd_path:
        points, colors = read_pcd(args.pcd_path)
        n0 = points.shape[0]
        points, colors = percentile_bbox_crop(
            points, colors, 100 - args.crop_percentile, args.crop_percentile)
        print(f"pcd: {n0} points -> {points.shape[0]} after bbox crop")
        if args.stride > 1:
            points = points[::args.stride]
            colors = colors[::args.stride] if colors is not None else None

    extr = None
    if args.frame_output_dir:
        pts_list, masks, extr, names = load_frame_outputs(args.frame_output_dir)
        print(f"frame_output: {len(pts_list)} frames "
              f"(e.g. {names[:3]}), point map {pts_list[0].shape}")
        if points is None and pts_list:
            stacked = [pm[m] for pm, m in zip(pts_list, masks)]
            points = np.concatenate(stacked, axis=0)
            print(f"merged frame point maps: {points.shape[0]} points")

    if args.pose_log:
        tum = load_tum_poses(args.pose_log)
        print(f"pose log: {tum.shape[0]} poses, "
              f"trajectory length {np.linalg.norm(np.diff(tum[:, 1:4], axis=0), axis=1).sum():.2f}")

    vm = None
    if args.voxel_dir:
        from vggt_slam_tpu.semantic.voxel_map import SemanticVoxelMap
        vm = SemanticVoxelMap.load_from_directory(args.voxel_dir)
        print(f"voxel map: {vm.get_centers_world().shape[0]} voxels, "
              f"dim {vm.get_features().shape[-1]}")

    try:
        import viser  # noqa: F401
        has_viser = not args.headless
    except ImportError:
        has_viser = False
        print("(viser not installed - headless stats only)")

    if not has_viser:
        return

    from vggt_slam_tpu.viz.viser_viewer import ViserViewer, show_voxels
    viewer = ViserViewer(port=args.port)
    if points is not None:
        viewer.add_point_cloud(points, colors if colors is not None else
                               np.full_like(points, 180, dtype=np.uint8),
                               name="result", point_size=args.point_size)
    if extr:
        for i, T in enumerate(extr):
            from vggt_slam_tpu.viz import viser_viewer as vv
            import viser.transforms as viser_tf
            Tw = viser_tf.SE3.from_matrix(np.asarray(T)[:3, :4])
            viewer.server.scene.add_frame(
                f"traj/frame_{i}", wxyz=Tw.rotation().wxyz,
                position=Tw.translation(), axes_length=0.05, axes_radius=0.002)
    if vm is not None:
        show_voxels(vm, port=args.voxel_port, keep_alive=False,
                    x_offset=args.voxel_x_offset)
    print("Viser running. Press Enter to exit...")
    try:
        input()
    except (KeyboardInterrupt, EOFError):
        pass


if __name__ == "__main__":
    main()
