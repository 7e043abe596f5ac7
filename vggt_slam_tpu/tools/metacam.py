"""MetaCam data tooling: LAS point clouds -> PCD/PLY with frame fixups.

Counterpart of reference metacam_to_pcd.py: read a (colorized) LAS file,
apply the fixed dataset-frame rotation into the z-up convention
(metacam_to_pcd.py:10-22), and write PCD (packed RGB) / PLY using the
in-repo writers (the reference's ASCII PCD writer at
metacam_to_pcd.py:160-190 is replaced by the binary writer in data/pcd.py).
`laspy` is an optional dependency: absent, the tool converts .pcd/.ply/.npz
inputs only.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from vggt_slam_tpu.data.pcd import read_pcd, write_pcd, write_ply

# Dataset frame (x left, y down, z inward) -> z-up right-handed.
T_FIX = np.array([[-1.0, 0.0, 0.0],
                  [0.0, 0.0, -1.0],
                  [0.0, -1.0, 0.0]])


def load_las(path: str):
    try:
        import laspy
    except ImportError as e:
        raise ImportError(
            "laspy is not installed in this environment; convert the LAS "
            "file to .pcd/.ply externally or install laspy") from e
    las = laspy.read(path)
    pts = np.stack([np.asarray(las.x), np.asarray(las.y),
                    np.asarray(las.z)], axis=1).astype(np.float64)
    colors = None
    if all(hasattr(las, c) for c in ("red", "green", "blue")):
        colors = np.stack([np.asarray(las.red), np.asarray(las.green),
                           np.asarray(las.blue)], axis=1)
        if colors.max() > 255:
            colors = (colors / 256).astype(np.uint8)  # 16-bit LAS color
        else:
            colors = colors.astype(np.uint8)
    return pts, colors


def load_points(path: str):
    ext = os.path.splitext(path)[1].lower()
    if ext == ".las" or ext == ".laz":
        return load_las(path)
    if ext == ".pcd":
        return read_pcd(path)
    if ext == ".npz":
        d = np.load(path)
        return d["points"], d.get("colors")
    raise ValueError(f"unsupported point cloud format: {ext}")


def process_point_cloud(points: np.ndarray, colors, rotate_to_zup: bool = True,
                        voxel_size: float = 0.0):
    """Frame fixup + optional voxel downsample (metacam_to_pcd.py:74-129)."""
    pts = np.asarray(points, dtype=np.float64)
    if rotate_to_zup:
        pts = pts @ T_FIX.T
    if voxel_size > 0:
        coords = np.floor(pts / voxel_size).astype(np.int64)
        _, idx = np.unique(coords, axis=0, return_index=True)
        pts = pts[idx]
        colors = colors[idx] if colors is not None else None
    return pts.astype(np.float32), colors


def main():
    p = argparse.ArgumentParser(description="MetaCam LAS -> PCD/PLY")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True, help=".pcd or .ply path")
    p.add_argument("--no_rotate", action="store_true")
    p.add_argument("--voxel_size", type=float, default=0.0)
    args = p.parse_args()

    pts, colors = load_points(args.input)
    pts, colors = process_point_cloud(pts, colors,
                                      rotate_to_zup=not args.no_rotate,
                                      voxel_size=args.voxel_size)
    ext = os.path.splitext(args.output)[1].lower()
    if ext == ".pcd":
        write_pcd(args.output, pts, colors)
    elif ext == ".ply":
        write_ply(args.output, pts, colors)
    else:
        raise ValueError(f"unsupported output format: {ext}")
    print(f"wrote {pts.shape[0]} points -> {args.output}")


if __name__ == "__main__":
    main()
