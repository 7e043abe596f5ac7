"""7-Scenes dense geometry evaluation.

Counterpart of reference evals/eval7_scenes_dense.py: build a ground-truth
point cloud by backprojecting the Kinect depth frames at the VGGT evaluation
resolution (392x518, eval7_scenes_dense.py:20-41), associate the estimated
TUM trajectory with GT poses, Sim(3)-align the estimate
(eval7_scenes_dense.py:133-141), transform the predicted dense cloud, refine
with ICP (eval7_scenes_dense.py:176-193), and score chamfer-RMSE accuracy /
completeness (eval7_scenes_dense.py:200-202).

Expected layout (standard 7-Scenes sequence dump):
  seq_dir/frame-XXXXXX.color.png
  seq_dir/frame-XXXXXX.depth.png   (16-bit mm, 65535 = invalid)
  seq_dir/frame-XXXXXX.pose.txt    (4x4 cam->world)
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from vggt_slam_tpu.evals.ate import ate, load_tum
from vggt_slam_tpu.evals.geometry_eval import (backproject_depth, chamfer,
                                               icp_point_to_point)
from vggt_slam_tpu.slam.alignment import umeyama_sim3_np

# Kinect intrinsics used by 7-Scenes, rescaled below to the eval resolution.
K_7SCENES = np.array([[585.0, 0.0, 320.0],
                      [0.0, 585.0, 240.0],
                      [0.0, 0.0, 1.0]])
EVAL_HW = (392, 518)


def vggt_resize_K(K: np.ndarray, src_hw=(480, 640), dst_hw=EVAL_HW):
    sy = dst_hw[0] / src_hw[0]
    sx = dst_hw[1] / src_hw[1]
    K2 = K.copy()
    K2[0] *= sx
    K2[1] *= sy
    return K2


def load_7scenes(seq_dir: str, stride: int = 10, max_depth: float = 4.0,
                 point_stride: int = 4):
    """GT world point cloud + TUM-style trajectory from a 7-Scenes dump."""
    import cv2

    depth_files = sorted(glob.glob(os.path.join(seq_dir, "*.depth.png")))
    pts_all, c2ws, frame_ids = [], [], []
    K = vggt_resize_K(K_7SCENES)
    for i, dpath in enumerate(depth_files[::stride]):
        stem = dpath[: -len(".depth.png")]
        pose_path = stem + ".pose.txt"
        if not os.path.exists(pose_path):
            continue
        c2w = np.loadtxt(pose_path).reshape(4, 4)
        depth = cv2.imread(dpath, cv2.IMREAD_UNCHANGED).astype(np.float32)
        depth[depth == 65535] = 0
        depth /= 1000.0
        depth = cv2.resize(depth, (EVAL_HW[1], EVAL_HW[0]),
                           interpolation=cv2.INTER_NEAREST)
        pts = backproject_depth(depth, K, c2w, max_depth=max_depth,
                                stride=point_stride)
        pts_all.append(pts)
        c2ws.append(c2w)
        frame_ids.append(float(os.path.basename(stem).split("-")[-1]))

    # One batched quaternion conversion (a per-frame device call would pay
    # the tunnel round trip for every GT frame).
    from vggt_slam_tpu.ops import lie
    import jax.numpy as jnp
    c2ws = np.asarray(c2ws)
    qs = np.asarray(lie.rotmat_to_quat(jnp.asarray(c2ws[:, :3, :3])))
    rows = [[fid, *c2w[:3, 3], q[1], q[2], q[3], q[0]]
            for fid, c2w, q in zip(frame_ids, c2ws, qs)]
    return np.concatenate(pts_all, axis=0), np.asarray(rows)


def evaluate_sequence(seq_dir: str, est_tum_path: str,
                      frame_output_dir: str | None = None,
                      est_pcd_path: str | None = None,
                      max_gt_points: int = 2_000_000,
                      max_est_points: int = 2_000_000,
                      icp_dist: float = 0.10,
                      gt_stride: int = 10) -> dict:
    gt_pts, gt_tum = load_7scenes(seq_dir, stride=gt_stride)
    est_tum = load_tum(est_tum_path)
    traj = ate(gt_tum, est_tum, align_scale=True, max_diff=0.5)

    # Predicted dense cloud: merged frame_output point maps or a pcd.
    if frame_output_dir:
        from vggt_slam_tpu.tools.visualize_results import load_frame_outputs
        pcs, masks, _, _ = load_frame_outputs(frame_output_dir)
        est_pts = np.concatenate([pm[m] for pm, m in zip(pcs, masks)], axis=0)
    elif est_pcd_path:
        from vggt_slam_tpu.data.pcd import read_pcd
        est_pts, _ = read_pcd(est_pcd_path)
    else:
        raise ValueError("need frame_output_dir or est_pcd_path")

    rng = np.random.default_rng(0)
    if len(gt_pts) > max_gt_points:
        gt_pts = gt_pts[rng.choice(len(gt_pts), max_gt_points, replace=False)]
    if len(est_pts) > max_est_points:
        est_pts = est_pts[rng.choice(len(est_pts), max_est_points,
                                     replace=False)]

    # Apply the trajectory Sim(3) to the predicted cloud, then ICP refine.
    # recompute alignment transform exactly as ate() does
    from vggt_slam_tpu.evals.ate import associate
    ri, ei = associate(gt_tum[:, 0], est_tum[:, 0], max_diff=0.5)
    s, R, t = umeyama_sim3_np(est_tum[ei, 1:4], gt_tum[ri, 1:4])
    est_aligned = s * (R @ est_pts.T).T + t
    T = icp_point_to_point(est_aligned[:: max(1, len(est_aligned) // 200000)],
                           gt_pts, max_corr_dist=icp_dist)
    est_refined = (T[:3, :3] @ est_aligned.T).T + T[:3, 3]

    metrics = chamfer(est_refined, gt_pts)
    metrics.update(ate_rmse=traj.rmse, ate_pairs=traj.n_pairs,
                   align_scale=float(s))
    return metrics


def main():
    p = argparse.ArgumentParser(description="7-Scenes dense geometry eval")
    p.add_argument("--seq_dir", required=True)
    p.add_argument("--est_tum", required=True)
    p.add_argument("--frame_output_dir", default=None)
    p.add_argument("--est_pcd", default=None)
    p.add_argument("--icp_dist", type=float, default=0.10)
    p.add_argument("--gt_stride", type=int, default=10,
                   help="use every Nth GT depth frame")
    args = p.parse_args()
    m = evaluate_sequence(args.seq_dir, args.est_tum,
                          frame_output_dir=args.frame_output_dir,
                          est_pcd_path=args.est_pcd, icp_dist=args.icp_dist,
                          gt_stride=args.gt_stride)
    for k, v in m.items():
        print(f"{k}: {v:.6f}" if isinstance(v, float) else f"{k}: {v}")


if __name__ == "__main__":
    main()
