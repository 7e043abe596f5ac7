import numpy as np

from vggt_slam_tpu.evals.ate import ate, associate, ATEResult
from vggt_slam_tpu.evals.geometry_eval import (backproject_depth, chamfer,
                                               icp_point_to_point)
from vggt_slam_tpu.tools.occupancy import (build_occupancy_from_pointcloud,
                                           segment_is_navigable,
                                           segment_sample_overlay)


def make_tum(ts, centers):
    out = np.zeros((len(ts), 8))
    out[:, 0] = ts
    out[:, 1:4] = centers
    out[:, 7] = 1.0  # identity quat (x y z w)
    return out


class TestATE:
    def test_perfect_alignment_zero_error(self):
        rng = np.random.default_rng(0)
        ts = np.arange(20) * 0.1
        gt_c = rng.normal(size=(20, 3))
        # estimate is a Sim3-warped version of gt
        from vggt_slam_tpu.ops import lie
        import jax.numpy as jnp
        R = np.asarray(lie.so3_exp(jnp.asarray([0.3, -0.2, 0.5])))
        est_c = 0.5 * (R @ gt_c.T).T + np.array([1, 2, 3])
        r = ate(make_tum(ts, gt_c), make_tum(ts, est_c))
        assert r.rmse < 1e-5
        assert abs(r.scale - 2.0) < 1e-6  # est->gt scale

    def test_noise_gives_expected_magnitude(self):
        rng = np.random.default_rng(1)
        ts = np.arange(50) * 0.1
        gt_c = np.cumsum(rng.normal(size=(50, 3)), axis=0)
        est_c = gt_c + rng.normal(scale=0.05, size=gt_c.shape)
        r = ate(make_tum(ts, gt_c), make_tum(ts, est_c))
        assert 0.02 < r.rmse < 0.12

    def test_association_tolerance(self):
        ts_gt = np.arange(10) * 1.0
        ts_est = ts_gt + 0.5  # all outside 0.02 tolerance
        ri, ei = associate(ts_gt, ts_est, max_diff=0.02)
        assert len(ri) == 0
        ri, ei = associate(ts_gt, ts_est, max_diff=0.6)
        assert len(ri) > 0


class TestChamfer:
    def test_identical_clouds_zero(self):
        pts = np.random.default_rng(2).normal(size=(500, 3))
        m = chamfer(pts, pts)
        assert m["chamfer"] == 0.0 and m["chamfer_rmse"] == 0.0

    def test_offset_cloud(self):
        pts = np.random.default_rng(3).uniform(size=(2000, 3)) * 5
        m = chamfer(pts + [0.01, 0, 0], pts)
        assert 0 < m["accuracy"] <= 0.011


class TestICP:
    def test_recovers_rigid_transform(self):
        from vggt_slam_tpu.ops import lie
        import jax.numpy as jnp
        rng = np.random.default_rng(4)
        src = rng.uniform(-1, 1, size=(800, 3))
        T_gt = np.asarray(lie.se3_exp(jnp.asarray([0.05, -0.03, 0.02,
                                                   0.04, 0.02, -0.03])))
        dst = (T_gt[:3, :3] @ src.T).T + T_gt[:3, 3]
        T = icp_point_to_point(src, dst, max_corr_dist=0.3)
        np.testing.assert_allclose(T, T_gt, atol=1e-4)


class TestBackproject:
    def test_roundtrip_with_projection(self):
        K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
        depth = np.full((48, 64), 2.0)
        c2w = np.eye(4)
        pts = backproject_depth(depth, K, c2w)
        assert pts.shape == (48 * 64, 3)
        np.testing.assert_allclose(pts[:, 2], 2.0)

    def test_drops_invalid(self):
        K = np.eye(3)
        depth = np.zeros((4, 4))
        depth[0, 0] = 1.0
        depth[1, 1] = 100.0  # beyond max_depth
        pts = backproject_depth(depth, K, np.eye(4), max_depth=10.0)
        assert pts.shape[0] == 1


class TestOccupancy:
    def test_blocked_cell_detection(self):
        # floor points + one tall obstacle column
        rng = np.random.default_rng(5)
        floor = np.stack([rng.uniform(0, 1, 500), rng.uniform(0, 1, 500),
                          rng.uniform(0, 0.05, 500)], axis=1)
        pillar = np.stack([np.full(50, 0.25), np.full(50, 0.25),
                           np.linspace(0, 0.9, 50)], axis=1)
        pts = np.concatenate([floor, pillar])
        centers, blocked, keys, minz = build_occupancy_from_pointcloud(
            pts, voxel_size=0.5, ceiling_z=2.5, height_thresh=0.10)
        blocked_cells = {(int(k[0]), int(k[1])): bool(b)
                         for k, b in zip(keys, blocked)}
        assert blocked_cells[(0, 0)] is True       # pillar cell
        assert blocked_cells[(1, 1)] is False      # pure floor

    def test_segment_navigability(self):
        blocked = {(0, 0): False, (1, 0): True, (2, 0): False}
        free_path = segment_is_navigable([0.25, 0.25, 0], [0.25, 0.4, 0],
                                         0.5, blocked)
        assert free_path
        through_wall = segment_is_navigable([0.25, 0.25, 0], [1.25, 0.25, 0],
                                            0.5, blocked)
        assert not through_wall

    def test_segment_sample_overlay(self):
        blocked = {(0, 0): False, (1, 0): True, (2, 0): False}
        cell_z = {k: 0.25 for k in blocked}
        traj = np.array([[0.25, 0.25, 0.0], [1.25, 0.25, 0.0]], np.float32)
        pts, cols, nav = segment_sample_overlay(
            traj, 0.5, blocked, cell_z, floor_z=0.0)
        assert nav == [False]
        assert pts.shape == cols.shape and pts.shape[1] == 3
        # samples snap to cell-center z + 0.2 for visibility
        assert np.allclose(pts[:, 2], 0.45)
        green = np.all(cols == np.array([0.0, 1.0, 0.0]), axis=1)
        assert green.any() and (~green).any()  # free start, blocked middle
        # sample in the blocked cell is the purple one
        in_blocked = np.floor(pts[:, 0] / 0.5).astype(int) == 1
        assert not green[in_blocked].any()


class TestDense7Scenes:
    def test_end_to_end_on_synthetic_dump(self, tmp_path):
        """Synthetic 7-Scenes-format sequence: GT depth+poses written to
        disk, the 'estimate' derived from the same geometry -> near-zero
        chamfer and ATE through the full evaluate_sequence path."""
        import cv2
        from vggt_slam_tpu.evals.dense_7scenes import (EVAL_HW, K_7SCENES,
                                                       evaluate_sequence,
                                                       vggt_resize_K)
        from vggt_slam_tpu.evals.geometry_eval import backproject_depth
        import jax.numpy as jnp
        from vggt_slam_tpu.ops import lie

        rng = np.random.default_rng(0)
        seq = tmp_path / "seq"
        seq.mkdir()
        est_dir = tmp_path / "frame_output"
        est_dir.mkdir()
        K_eval = vggt_resize_K(K_7SCENES)
        tum_rows = []
        for i in range(4):
            # smooth synthetic depth in meters at Kinect res, mm on disk
            yy, xx = np.meshgrid(np.linspace(0, 1, 480),
                                 np.linspace(0, 1, 640), indexing="ij")
            depth_m = 2.0 + 0.5 * np.sin(3 * xx + i) * np.cos(2 * yy)
            c2w = np.eye(4)
            c2w[:3, 3] = [0.1 * i, 0.05 * i, 0.0]
            cv2.imwrite(str(seq / f"frame-{i:06d}.depth.png"),
                        (depth_m * 1000).astype(np.uint16))
            np.savetxt(str(seq / f"frame-{i:06d}.pose.txt"), c2w)

            # estimate: backproject the saved depth at eval res with the
            # same pose -> identical world geometry
            d_eval = cv2.resize(depth_m.astype(np.float32),
                                (EVAL_HW[1], EVAL_HW[0]),
                                interpolation=cv2.INTER_NEAREST)
            pts = backproject_depth(d_eval, K_eval, c2w, max_depth=4.0,
                                    stride=4)
            pm = np.zeros(EVAL_HW + (3,), np.float32)
            n = min(len(pts), EVAL_HW[0] * EVAL_HW[1])
            pm.reshape(-1, 3)[:n] = pts[:n]
            mask = np.zeros(EVAL_HW, bool)
            mask.reshape(-1)[:n] = True
            np.savez(str(est_dir / f"{i:06d}.npz"), point_map_world=pm,
                     conf_mask=mask, extrinsic_world=c2w,
                     intrinsic=K_eval)
            q = np.asarray(lie.rotmat_to_quat(jnp.asarray(c2w[:3, :3])))
            tum_rows.append([float(i), *c2w[:3, 3], q[1], q[2], q[3], q[0]])
        est_tum = tmp_path / "poses.txt"
        np.savetxt(str(est_tum), np.asarray(tum_rows))

        m = evaluate_sequence(str(seq), str(est_tum),
                              frame_output_dir=str(est_dir), gt_stride=1)
        assert m["ate_rmse"] < 1e-6
        assert m["rmse_accuracy"] < 0.02, m
        assert m["rmse_completeness"] < 0.02, m


class TestMaskQuality:
    """Mask-proposer quality harness (evals/mask_eval.py): synthetic scenes
    with exact GT segments quantify the weight-free Felzenszwalb stand-in
    for SAM2 automatic mask generation (VERDICT round-2 item 6)."""

    def test_scene_has_objects_and_exact_labels(self):
        from vggt_slam_tpu.evals.mask_eval import make_shape_scene
        img, labels = make_shape_scene(0, hw=(120, 160), n_objects=4)
        assert img.shape == (120, 160, 3) and img.dtype == np.uint8
        assert labels.max() >= 3  # occlusion can erase at most rarely
        # perfect proposals score 1.0
        from vggt_slam_tpu.evals.mask_eval import mask_quality
        masks = [{"segmentation": labels == i}
                 for i in range(1, labels.max() + 1)]
        q = mask_quality(masks, labels)
        assert q["mean_best_iou"] == 1.0 and q["recall_at_50"] == 1.0

    def test_felzenszwalb_beats_grid(self):
        from vggt_slam_tpu.evals.mask_eval import evaluate_proposers
        rows = {r["proposer"]: r
                for r in evaluate_proposers(n_scenes=4, hw=(120, 160))}
        fz, grid = rows["felzenszwalb"], rows["grid8"]
        # committed full-size run (evals/results/mask_quality.csv):
        # fz 0.91 mean best IoU / 0.99 recall@0.5 vs grid 0.25 / 0.008
        assert fz["mean_best_iou"] > 0.6 > grid["mean_best_iou"]
        assert fz["recall_at_50"] > 0.8 > grid["recall_at_50"]
