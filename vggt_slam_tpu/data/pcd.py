"""Point-cloud file I/O (PCD / PLY) in pure Python.

Replaces the reference's Open3D dependency for map export
(reference map.py:154-168 `write_points_to_file` -> result.pcd) with a
self-contained binary PCD writer/reader compatible with the PCL format the
reference emits (x y z + packed float rgb), plus a binary PLY writer.
"""
from __future__ import annotations

import os
import struct

import numpy as np


def pack_rgb(colors: np.ndarray) -> np.ndarray:
    """(N,3) float [0,1] or uint8 -> (N,) float32 PCL packed RGB."""
    c = np.asarray(colors)
    if c.dtype != np.uint8:
        c = np.clip(c * 255.0 if c.max() <= 1.0 + 1e-6 else c, 0, 255).astype(np.uint8)
    packed = (c[:, 0].astype(np.uint32) << 16) | \
             (c[:, 1].astype(np.uint32) << 8) | c[:, 2].astype(np.uint32)
    return packed.view(np.float32)


def unpack_rgb(rgb_f32: np.ndarray) -> np.ndarray:
    packed = np.ascontiguousarray(rgb_f32).view(np.uint32)
    r = (packed >> 16) & 0xFF
    g = (packed >> 8) & 0xFF
    b = packed & 0xFF
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def write_pcd(path: str, points: np.ndarray, colors: np.ndarray | None = None,
              binary: bool = True) -> None:
    """Write (N,3) points (+ optional (N,3) colors) as a PCL .pcd file."""
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    pts = np.asarray(points, dtype=np.float32).reshape(-1, 3)
    n = pts.shape[0]
    has_rgb = colors is not None
    fields = "x y z rgb" if has_rgb else "x y z"
    sizes = "4 4 4 4" if has_rgb else "4 4 4"
    types = "F F F F" if has_rgb else "F F F"
    counts = "1 1 1 1" if has_rgb else "1 1 1"
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        f"FIELDS {fields}\n"
        f"SIZE {sizes}\n"
        f"TYPE {types}\n"
        f"COUNT {counts}\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\n"
        f"DATA {'binary' if binary else 'ascii'}\n"
    )
    if has_rgb:
        data = np.concatenate([pts, pack_rgb(colors)[:, None]], axis=1)
    else:
        data = pts
    with open(path, "wb") as f:
        f.write(header.encode())
        if binary:
            f.write(np.ascontiguousarray(data, dtype=np.float32).tobytes())
        else:
            np.savetxt(f, data, fmt="%.6f")


def read_pcd(path: str):
    """Read a .pcd written by write_pcd (or PCL). Returns (points, colors|None)."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode(errors="replace").strip()
            if line.startswith("#"):
                continue
            key, _, val = line.partition(" ")
            header[key] = val
            if key == "DATA":
                break
        fields = header["FIELDS"].split()
        n = int(header["POINTS"])
        ncols = len(fields)
        if header["DATA"] == "binary":
            raw = np.frombuffer(f.read(4 * n * ncols), dtype=np.float32)
            data = raw.reshape(n, ncols)
        else:
            data = np.loadtxt(f, dtype=np.float32).reshape(n, ncols)
    pts = data[:, :3]
    colors = None
    if "rgb" in fields:
        colors = unpack_rgb(data[:, fields.index("rgb")].copy())
    return pts, colors


def write_ply(path: str, points: np.ndarray, colors: np.ndarray | None = None) -> None:
    """Write a binary-little-endian PLY (xyz float + optional uchar rgb)."""
    pts = np.asarray(points, dtype=np.float32).reshape(-1, 3)
    n = pts.shape[0]
    has_rgb = colors is not None
    lines = ["ply", "format binary_little_endian 1.0", f"element vertex {n}",
             "property float x", "property float y", "property float z"]
    if has_rgb:
        lines += ["property uchar red", "property uchar green", "property uchar blue"]
    lines.append("end_header")
    with open(path, "wb") as f:
        f.write(("\n".join(lines) + "\n").encode())
        if has_rgb:
            c = np.asarray(colors)
            if c.dtype != np.uint8:
                c = np.clip(c * 255.0 if c.max() <= 1.0 + 1e-6 else c, 0, 255
                            ).astype(np.uint8)
            rec = np.empty(n, dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)])
            rec["xyz"] = pts
            rec["rgb"] = c
            f.write(rec.tobytes())
        else:
            f.write(pts.tobytes())
