"""Tests for the aux tools: undistortion, point-cloud registration,
semantic embedder, MetaCam conversion, result-viewer helpers."""
import os

import numpy as np
import pytest


class TestFisheyeUndistort:
    def test_center_ray_preserved(self):
        from vggt_slam_tpu.tools.undistort import FisheyeModel
        # synthetic fisheye: checkerboard distorted through the model, then
        # undistorted - the center region must match the ideal pinhole view.
        K = np.array([[300.0, 0, 320], [0, 300.0, 240], [0, 0, 1.0]])
        D = np.array([-0.01, 0.02, -0.015, 0.003])
        model = FisheyeModel(K=K, D=D, image_size=(640, 480))
        img = np.zeros((480, 640, 3), np.uint8)
        img[::40, :, :] = 255
        img[:, ::40, :] = 255
        out, K_new = model.undistort(img, out_size=256, fov_deg=60.0)
        assert out.shape == (256, 256, 3)
        # new intrinsics: principal point at center, f from FOV
        assert abs(K_new[0, 2] - 128.0) < 1e-6
        f_expected = 128.0 / np.tan(np.radians(30.0))
        assert abs(K_new[0, 0] - f_expected) < 1e-6

    def test_radtan_identity_when_undistorted(self, tmp_path):
        import cv2
        from vggt_slam_tpu.tools.undistort import undistort_folder_radtan
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
        src = tmp_path / "in"
        dst = tmp_path / "out"
        src.mkdir()
        cv2.imwrite(str(src / "0.png"), img)
        K = np.array([[100.0, 0, 80], [0, 100.0, 60], [0, 0, 1]])
        n = undistort_folder_radtan(str(src), str(dst), K=K, D=np.zeros(5))
        assert n == 1
        out = cv2.imread(str(dst / "0.png"))
        # zero distortion -> output equals input
        np.testing.assert_array_equal(out, img)


class TestRegisterPointClouds:
    def test_recovers_sim3(self):
        from vggt_slam_tpu.tools.align_points import register_point_clouds
        rng = np.random.default_rng(0)
        src = rng.uniform(-1, 1, (800, 3)).astype(np.float64)
        src[:, 2] *= 0.3  # anisotropic so principal axes are well-defined
        src[:, 1] *= 0.7
        ang = 0.4
        R_gt = np.array([[np.cos(ang), -np.sin(ang), 0],
                         [np.sin(ang), np.cos(ang), 0],
                         [0, 0, 1.0]])
        s_gt, t_gt = 1.6, np.array([0.5, -0.2, 0.9])
        dst = s_gt * (R_gt @ src.T).T + t_gt
        s, R, t = register_point_clouds(src, dst)
        aligned = s * (R @ src.T).T + t
        rms = np.sqrt(((aligned - dst) ** 2).sum(1).mean())
        assert rms < 1e-2, rms
        assert abs(s - s_gt) / s_gt < 0.02


class TestSemanticEmbedder:
    def test_fallback_pipeline_shapes(self):
        from vggt_slam_tpu.semantic.embedder import SemanticEmbedder
        rng = np.random.default_rng(0)
        img = rng.uniform(size=(100, 140, 3)).astype(np.float32)
        emb = SemanticEmbedder(target_hw=(64, 64))
        out = emb.embed_image(img)
        assert out.shape[:2] == (64, 64)
        assert out.shape[2] > 1
        assert np.isfinite(out).all()
        # every pixel painted (grid masks tile the image)
        assert (np.abs(out).sum(axis=2) > 0).mean() > 0.99

    def test_folder_sharding(self, tmp_path):
        import cv2
        from vggt_slam_tpu.semantic.embedder import SemanticEmbedder
        src = tmp_path / "imgs"
        src.mkdir()
        rng = np.random.default_rng(1)
        for i in range(4):
            cv2.imwrite(str(src / f"{i}.png"),
                        rng.integers(0, 255, (50, 60, 3)).astype(np.uint8))
        emb = SemanticEmbedder(target_hw=(32, 32))
        out = tmp_path / "emb"
        n0 = emb.embed_folder_to_npz(str(src), str(out), shard_index=0,
                                     num_shards=2)
        n1 = emb.embed_folder_to_npz(str(src), str(out), shard_index=1,
                                     num_shards=2)
        assert n0 == 2 and n1 == 2
        files = sorted(os.listdir(out))
        assert len(files) == 4
        d = np.load(out / files[0])
        assert d["embedding"].shape[:2] == (32, 32)

    def test_bbox_expand_clamps_and_changes_crop(self):
        from vggt_slam_tpu.semantic.embedder import SemanticEmbedder
        rng = np.random.default_rng(2)
        img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
        seg = np.zeros((64, 64), bool)
        seg[20:30, 20:30] = True
        tight = SemanticEmbedder(target_hw=(64, 64))._crop(img, seg)
        wide = SemanticEmbedder(target_hw=(64, 64),
                                bbox_expand_pct=0.5)._crop(img, seg)
        corner = np.zeros((64, 64), bool)
        corner[0:4, 0:4] = True  # expansion must clamp at the border
        edge = SemanticEmbedder(target_hw=(64, 64),
                                bbox_expand_pct=2.0)._crop(img, corner)
        assert tight.shape == wide.shape == edge.shape
        assert np.abs(tight - wide).max() > 0  # context changed the crop
        import pytest
        with pytest.raises(ValueError):
            SemanticEmbedder(bbox_expand_pct=-0.1)

    def test_masks_overlay_and_visualization(self, tmp_path):
        import cv2
        from vggt_slam_tpu.semantic.embedder import (SemanticEmbedder,
                                                     render_masks_overlay)
        rng = np.random.default_rng(3)
        img = rng.uniform(size=(48, 48, 3)).astype(np.float32)
        seg = np.zeros((48, 48), bool)
        seg[:24] = True
        vis = render_masks_overlay(img, [{"segmentation": seg, "area": 1}],
                                   alpha=0.5)
        assert vis.dtype == np.uint8 and vis.shape == (48, 48, 3)
        base = np.clip(img * 255, 0, 255).astype(np.uint8)
        assert not np.array_equal(vis[:24], base[:24])   # blended
        assert np.array_equal(vis[24:], base[24:])       # untouched
        out = tmp_path / "vis" / "frame.masks.png"
        SemanticEmbedder(target_hw=(48, 48)).save_masks_visualization(
            img, str(out))
        assert cv2.imread(str(out)).shape == (48, 48, 3)

    def test_best_match_from_text(self):
        """Text-query machinery (reference :300-323): with a mock encoder
        pair whose similarity is engineered, the best mask index and score
        come back deterministically."""
        from vggt_slam_tpu.semantic.embedder import SemanticEmbedder

        def two_masks(img):
            h, w = img.shape[:2]
            a = np.zeros((h, w), bool); a[:, :w // 2] = True
            b = np.zeros((h, w), bool); b[:, w // 2:] = True
            return [{"segmentation": a, "area": int(a.sum())},
                    {"segmentation": b, "area": int(b.sum()) + 1}]

        def crop_enc(crops):
            # mask 0 (sorted 2nd, smaller area) -> e1; mask 1 -> e0
            basis = np.eye(2, 4, dtype=np.float32)
            return basis[:len(crops)]

        def text_enc(texts):
            return np.array([[0.0, 1.0, 0.0, 0.0]], np.float32)

        emb = SemanticEmbedder(mask_generator=two_masks,
                               crop_encoder=crop_enc, text_encoder=text_enc,
                               target_hw=(32, 32))
        idx, seg, score = emb.best_match_from_text(
            np.zeros((32, 32, 3), np.float32), "right half")
        assert idx == 1 and seg is not None
        assert score == 1.0
        # no masks -> sentinel
        emb2 = SemanticEmbedder(mask_generator=lambda im: [],
                                target_hw=(32, 32))
        idx, seg, score = emb2.best_match_from_text(
            np.zeros((32, 32, 3), np.float32), "x")
        assert idx == -1 and seg is None and score == -1.0


class TestFelzenszwalb:
    """Native graph-based segmentation: the weight-free SAM2 stand-in
    (reference semantic_embedder.py:56-67 runs SAM2AutomaticMaskGenerator;
    here segment proposals must follow image boundaries, not a grid)."""

    @staticmethod
    def _scene(h=120, w=160, noise=5.0, seed=0):
        rng = np.random.default_rng(seed)
        img = np.full((h, w, 3), 40.0, np.float32)
        rects = {"r": (10, 60, 10, 70), "g": (70, 110, 30, 100),
                 "b": (25, 100, 110, 150)}
        for color, (y0, y1, x0, x1) in zip(
                ([200, 30, 30], [30, 200, 30], [30, 30, 200]),
                rects.values()):
            img[y0:y1, x0:x1] = color
        img += rng.normal(0, noise, img.shape).astype(np.float32)
        return np.clip(img, 0, 255), rects

    def test_segments_recover_regions(self):
        from vggt_slam_tpu.native import felzenszwalb as fz
        if not fz.available():
            pytest.skip("no native compiler")
        img, rects = self._scene()
        labels, n = fz.segment(img, k=300, min_size=100, sigma=0.8)
        assert labels.shape == img.shape[:2] and n >= 4
        for y0, y1, x0, x1 in rects.values():
            gt = np.zeros(img.shape[:2], bool)
            gt[y0:y1, x0:x1] = True
            best = max((((labels == lab) & gt).sum() /
                        ((labels == lab) | gt).sum())
                       for lab in np.unique(labels))
            assert best > 0.85, best

    def test_embeddings_follow_segment_boundaries(self):
        """Dense embeddings from the default (felzenszwalb) proposer must
        be segment-shaped: constant within a region, different across the
        region boundary - the property the grid fallback lacks."""
        from vggt_slam_tpu.native import felzenszwalb as fz
        from vggt_slam_tpu.semantic.embedder import (
            SemanticEmbedder, felzenszwalb_mask_generator)
        if not fz.available():
            pytest.skip("no native compiler")
        img, _ = self._scene(noise=2.0)
        emb = SemanticEmbedder(target_hw=img.shape[:2])
        assert emb.mask_generator is felzenszwalb_mask_generator
        out = emb.embed_image(img / 255.0)
        # interior of the red rectangle: one embedding vector
        inner = out[20:50, 20:60].reshape(-1, out.shape[-1])
        assert np.abs(inner - inner[0]).max() < 1e-6
        # across the boundary to background: different vector
        bg = out[5, 5]
        assert np.abs(inner[0] - bg).max() > 1e-3

    @pytest.mark.slow
    def test_multiproc_matches_serial(self, tmp_path):
        import cv2
        from vggt_slam_tpu.semantic.embedder import (
            SemanticEmbedder, embed_folder_multiproc)
        src = tmp_path / "imgs"
        src.mkdir()
        rng = np.random.default_rng(3)
        for i in range(4):
            cv2.imwrite(str(src / f"{i}.png"),
                        rng.integers(0, 255, (40, 50, 3)).astype(np.uint8))
        serial = tmp_path / "serial"
        SemanticEmbedder(target_hw=(32, 32)).embed_folder_to_npz(
            str(src), str(serial))
        par = tmp_path / "par"
        embed_folder_multiproc(str(src), str(par), num_procs=2,
                               target_size=32)
        files = sorted(os.listdir(serial))
        assert files == sorted(os.listdir(par))
        for f in files:
            a = np.load(serial / f)["embedding"]
            b = np.load(par / f)["embedding"]
            np.testing.assert_array_equal(a, b)


class TestMetacam:
    def test_process_point_cloud_zup(self):
        from vggt_slam_tpu.tools.metacam import process_point_cloud
        pts = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float64)
        colors = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
        out_pts, out_colors = process_point_cloud(pts, colors,
                                                  rotate_to_zup=True)
        assert out_pts.shape == (2, 3)
        assert out_colors.shape == (2, 3)
        # rotation preserves norms
        np.testing.assert_allclose(np.linalg.norm(out_pts, axis=1),
                                   np.linalg.norm(pts, axis=1), atol=1e-12)


class TestVisualizeResults:
    def test_percentile_bbox_crop(self):
        from vggt_slam_tpu.tools.visualize_results import percentile_bbox_crop
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(1000, 3)).astype(np.float32)
        pts[0] = [100, 100, 100]  # outlier
        out, _ = percentile_bbox_crop(pts, None, 0.5, 99.5)
        assert out.shape[0] < 1000
        assert np.abs(out).max() < 50

    def test_load_pose_file_and_images(self, tmp_path):
        import cv2
        from vggt_slam_tpu.tools.visualize_results import (
            load_matched_images, load_pose_file)

        # two frames: identity and a 90-degree yaw with translation
        s = np.sqrt(0.5)
        lines = ["# comment",
                 "frame_a 0 0 0 0 0 0 1",
                 f"frame_b 1 2 3 0 0 {s:.8f} {s:.8f}"]
        pose_path = tmp_path / "poses.txt"
        pose_path.write_text("\n".join(lines) + "\n")
        extr, ids = load_pose_file(str(pose_path))
        assert ids == ["frame_a", "frame_b"]
        assert extr.shape == (2, 3, 4)
        assert np.allclose(extr[0], np.eye(4)[:3])
        R_expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)
        assert np.allclose(extr[1, :, :3], R_expected, atol=1e-6)
        assert np.allclose(extr[1, :, 3], [1, 2, 3])

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        for i, stem in enumerate(["frame_a", "frame_b"]):
            cv2.imwrite(str(img_dir / f"{stem}.png"),
                        np.full((12, 16, 3), 40 * (i + 1), np.uint8))
        imgs = load_matched_images(str(img_dir), ids)
        assert imgs.shape == (2, 3, 12, 16)
        assert np.allclose(imgs[1], 80 / 255.0, atol=1e-2)


class TestSynthSequence:
    def test_loop_groundtruth_matches_frames(self, tmp_path):
        """On the loop path, t=0.25 and t=0.75 share x but have opposite-
        sign y. The old abs(y) viewport indexing rendered those frames
        identical while groundtruth said the camera moved — this guards
        the signed-y fix."""
        import cv2
        from vggt_slam_tpu.tools.synth_sequence import generate_sequence

        names = generate_sequence(str(tmp_path / "seq"), n_frames=9,
                                  size=(160, 120), loop=True, step_px=30.0,
                                  tum_layout=True)
        gt = np.loadtxt(tmp_path / "seq" / "groundtruth.txt")
        assert gt[:, 2].min() < 0  # signed y reaches negative
        f2 = cv2.imread(names[2]).astype(np.int32)
        f6 = cv2.imread(names[6]).astype(np.int32)
        assert np.abs(f2 - f6).mean() > 1.0


class TestTrainStateResume:
    """train_tiny's full-state crash-resume (r4: the axon worker crashes
    every ~200 steps of sustained small64 training; param-only resume
    restarted Adam moments + the LR schedule each attempt)."""

    def test_opt_state_round_trip_continues_schedule(self, tmp_path):
        import jax
        import jax.numpy as jnp
        import optax

        from vggt_slam_tpu.tools.train_tiny import (load_train_state,
                                                    save_train_state)

        params = {"w": jnp.ones((3, 4)), "b": {"c": jnp.zeros((2,))}}
        sched = optax.warmup_cosine_decay_schedule(0.0, 3e-4, 10, 100, 3e-6)
        tx = optax.chain(optax.clip_by_global_norm(1.0),
                         optax.adamw(sched, weight_decay=0.01))
        st = tx.init(params)
        g = jax.tree.map(lambda x: x + 0.1, params)
        for _ in range(3):
            up, st = tx.update(g, st, params)
            params = optax.apply_updates(params, up)
        path = str(tmp_path / "opt.npz")
        save_train_state(st, 3, path)
        st2, step = load_train_state(tx.init(params), path)
        assert step == 3
        # The restored state must drive the NEXT update identically -
        # i.e. Adam moments and the schedule's step count both survived.
        up1, _ = tx.update(g, st, params)
        up2, _ = tx.update(g, st2, params)
        for a, b in zip(jax.tree_util.tree_leaves(up1),
                        jax.tree_util.tree_leaves(up2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_shape_mismatch_raises(self, tmp_path):
        import jax.numpy as jnp
        import optax
        import pytest

        from vggt_slam_tpu.tools.train_tiny import (load_train_state,
                                                    save_train_state)

        tx = optax.adam(1e-3)
        st = tx.init({"w": jnp.ones((3,))})
        path = str(tmp_path / "opt.npz")
        save_train_state(st, 1, path)
        with pytest.raises(ValueError, match="shape mismatch"):
            load_train_state(tx.init({"w": jnp.ones((4,))}), path)
