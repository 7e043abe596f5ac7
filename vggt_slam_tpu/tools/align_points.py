"""Global point-cloud registration: coarse alignment + scaled ICP refine.

Counterpart of reference scripts/align_points.py (FPFH + RANSAC global
registration followed by scaled ICP, align_points.py:33-58) without the
Open3D dependency: coarse alignment comes from a scale-normalized
principal-axes + centroid fit refined over 24 axis-sign hypotheses by
nearest-neighbor RMSE, then point-to-point ICP; the Sim(3) scale is
estimated from the clouds' RMS radii. Extracts (s, R, t) like the
reference does from its 4x4 result.
"""
from __future__ import annotations

import argparse
import itertools

import numpy as np

from vggt_slam_tpu.data.pcd import read_pcd
from vggt_slam_tpu.evals.geometry_eval import icp_point_to_point, nn_distances


def _principal_axes(pts: np.ndarray) -> np.ndarray:
    c = pts - pts.mean(0)
    _, _, vt = np.linalg.svd(c, full_matrices=False)
    return vt  # rows = principal directions


def coarse_align(src: np.ndarray, dst: np.ndarray):
    """Scale + rotation + translation guess via principal axes with sign
    disambiguation by NN-RMSE over the 24 proper axis assignments."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    rs = np.sqrt(((src - mu_s) ** 2).sum(1).mean())
    rd = np.sqrt(((dst - mu_d) ** 2).sum(1).mean())
    s = rd / (rs + 1e-12)

    A = _principal_axes(src)
    B = _principal_axes(dst)
    sub = src[np.random.default_rng(0).choice(len(src),
                                              min(2000, len(src)),
                                              replace=False)]
    best = (np.inf, None)
    for perm in itertools.permutations(range(3)):
        for signs in itertools.product([1, -1], repeat=3):
            Bp = B[list(perm)] * np.asarray(signs)[:, None]
            R = Bp.T @ A
            if np.linalg.det(R) < 0:
                continue
            t = mu_d - s * (R @ mu_s)
            moved = s * (sub - mu_s) @ R.T + s * (R @ mu_s) + (mu_d - s * (R @ mu_s))
            err = float(np.mean(nn_distances(moved, dst)))
            if err < best[0]:
                best = (err, (s, R, t))
    return best[1]


def register_point_clouds(src: np.ndarray, dst: np.ndarray,
                          icp_dist: float | None = None):
    """Full pipeline. Returns (s, R, t) with dst ~= s R src + t."""
    s, R, t = coarse_align(src, dst)
    scaled = s * (R @ src.T).T + t
    if icp_dist is None:
        icp_dist = 2.0 * float(np.median(nn_distances(
            scaled[:: max(1, len(scaled) // 2000)], dst)))
    T = icp_point_to_point(scaled, dst, max_corr_dist=max(icp_dist, 1e-6))
    R_final = T[:3, :3] @ R
    t_final = T[:3, :3] @ t + T[:3, 3]
    return s, R_final, t_final


def main():
    p = argparse.ArgumentParser(description="Register two point clouds (Sim3)")
    p.add_argument("--source", required=True)
    p.add_argument("--target", required=True)
    p.add_argument("--max_points", type=int, default=50000)
    args = p.parse_args()

    src, _ = read_pcd(args.source)
    dst, _ = read_pcd(args.target)
    rng = np.random.default_rng(0)
    if len(src) > args.max_points:
        src = src[rng.choice(len(src), args.max_points, replace=False)]
    if len(dst) > args.max_points:
        dst = dst[rng.choice(len(dst), args.max_points, replace=False)]
    s, R, t = register_point_clouds(src, dst)
    aligned = s * (R @ src.T).T + t
    rmse = float(np.sqrt((nn_distances(aligned, dst) ** 2).mean()))
    print(f"scale: {s:.6f}")
    print(f"R:\n{np.round(R, 6)}")
    print(f"t: {np.round(t, 6)}")
    print(f"post-ICP NN RMSE: {rmse:.6f}")


if __name__ == "__main__":
    main()
