import numpy as np
import jax
import jax.numpy as jnp

from vggt_slam_tpu.ops import geometry, lie

jax.config.update("jax_enable_x64", True)


def rand_extri_intri(rng, S=4, H=392, W=518):
    xi = rng.uniform(-0.8, 0.8, size=(S, 6))
    T = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    extr = T[:, :3, :]
    K = np.zeros((S, 3, 3))
    f = rng.uniform(300, 600, size=S)
    K[:, 0, 0] = f
    K[:, 1, 1] = f * rng.uniform(0.95, 1.05, size=S)
    K[:, 0, 2] = W / 2
    K[:, 1, 2] = H / 2
    K[:, 2, 2] = 1.0
    return extr, K


class TestPoseEncoding:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        H, W = 392, 518
        extr, K = rand_extri_intri(rng, 6, H, W)
        enc = geometry.extri_intri_to_pose_encoding(jnp.asarray(extr), jnp.asarray(K), (H, W))
        extr2, K2 = geometry.pose_encoding_to_extri_intri(enc, (H, W))
        np.testing.assert_allclose(np.asarray(extr2), extr, atol=1e-9)
        np.testing.assert_allclose(np.asarray(K2)[:, 0, 0], K[:, 0, 0], rtol=1e-9)
        np.testing.assert_allclose(np.asarray(K2)[:, 1, 1], K[:, 1, 1], rtol=1e-9)


class TestUnproject:
    def test_consistency_with_projection(self):
        rng = np.random.default_rng(1)
        S, H, W = 2, 28, 37
        extr, K = rand_extri_intri(rng, S, H, W)
        depth = rng.uniform(1.0, 5.0, size=(S, H, W, 1))
        pts = np.asarray(geometry.unproject_depth_map_to_point_map(
            jnp.asarray(depth), jnp.asarray(extr), jnp.asarray(K)))
        # Reproject each point; must land on its own pixel with its own depth.
        for s in range(S):
            flat = pts[s].reshape(-1, 3)
            pix, z = geometry.project_points(
                jnp.asarray(flat), jnp.asarray(extr[s]), jnp.asarray(K[s]))
            uu, vv = np.meshgrid(np.arange(W), np.arange(H))
            expected = np.stack([uu.ravel(), vv.ravel()], axis=-1)
            np.testing.assert_allclose(np.asarray(pix), expected, atol=1e-6)
            np.testing.assert_allclose(np.asarray(z), depth[s, ..., 0].ravel(), atol=1e-8)

    def test_identity_cam_depth_is_z(self):
        H, W = 8, 8
        K = np.eye(3)
        K[0, 2] = W / 2
        K[1, 2] = H / 2
        extr = np.hstack([np.eye(3), np.zeros((3, 1))])
        depth = np.full((1, H, W, 1), 2.0)
        pts = np.asarray(geometry.unproject_depth_map_to_point_map(
            jnp.asarray(depth), jnp.asarray(extr[None]), jnp.asarray(K[None])))
        np.testing.assert_allclose(pts[0, :, :, 2], 2.0, atol=1e-12)


class TestProjectionDecomposition:
    def test_rq(self):
        rng = np.random.default_rng(2)
        M = rng.normal(size=(5, 3, 3))
        K, R = geometry.rq_decomposition(jnp.asarray(M))
        K, R = np.asarray(K), np.asarray(R)
        np.testing.assert_allclose(K @ R, M, atol=1e-9)
        for i in range(5):
            assert np.allclose(R[i] @ R[i].T, np.eye(3), atol=1e-9)
            assert np.all(np.diag(K[i]) > 0)
            assert np.allclose(K[i], np.triu(K[i]), atol=1e-12)

    def test_matches_cv2(self):
        cv2 = __import__("cv2")
        rng = np.random.default_rng(3)
        extr, K = rand_extri_intri(rng, 4)
        P = K @ extr
        Kd, Rd, Cd = geometry.decompose_projection_matrix(jnp.asarray(P))
        for i in range(4):
            cal, rot, trans = cv2.decomposeProjectionMatrix(P[i])[0:3]
            np.testing.assert_allclose(np.asarray(Kd[i]) / np.asarray(Kd[i])[2, 2],
                                       cal / cal[2, 2], atol=1e-6)
            np.testing.assert_allclose(np.asarray(Rd[i]), rot, atol=1e-6)
            c_ref = (trans[:3, 0] / trans[3, 0])
            c_got = np.asarray(Cd[i][:3] / Cd[i][3])
            np.testing.assert_allclose(c_got, c_ref, atol=1e-6)

    def test_poses_world_identity_homography(self):
        # With H = I the recovered world poses must equal cam2world.
        rng = np.random.default_rng(4)
        extr, K = rand_extri_intri(rng, 3)
        c2w = np.asarray(lie.se3_inverse(jnp.asarray(extr)))
        poses = np.asarray(geometry.poses_world_from_submap(
            jnp.asarray(K), jnp.asarray(c2w), jnp.eye(4)))
        np.testing.assert_allclose(poses, c2w, atol=1e-8)

    def test_poses_world_through_sl4(self):
        # Pose recovery through a mild projective H: reproject-consistency.
        rng = np.random.default_rng(5)
        extr, K = rand_extri_intri(rng, 2)
        c2w = np.asarray(lie.se3_inverse(jnp.asarray(extr)))
        Hsl4 = np.asarray(lie.sl4_exp(jnp.asarray(rng.uniform(-0.05, 0.05, 15))))
        poses = np.asarray(geometry.poses_world_from_submap(
            jnp.asarray(K), jnp.asarray(c2w), jnp.asarray(Hsl4)))
        assert np.all(np.isfinite(poses))
        # Rotation block must be orthonormal-ish (it comes from inv(R) of RQ).
        for i in range(2):
            RtR = poses[i, :3, :3] @ poses[i, :3, :3].T
            np.testing.assert_allclose(RtR, np.eye(3), atol=1e-6)


class TestUmeyama:
    def test_recovers_known_sim3(self):
        rng = np.random.default_rng(6)
        src = rng.normal(size=(50, 3))
        R_gt = np.asarray(lie.so3_exp(jnp.asarray(rng.uniform(-1, 1, 3))))
        s_gt, t_gt = 2.5, np.array([1.0, -2.0, 0.5])
        dst = s_gt * (R_gt @ src.T).T + t_gt
        s, R, t = geometry.umeyama_sim3(jnp.asarray(src), jnp.asarray(dst))
        np.testing.assert_allclose(float(s), s_gt, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-9)
        np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-8)

    def test_no_scale_mode(self):
        rng = np.random.default_rng(7)
        src = rng.normal(size=(30, 3))
        dst = 3.0 * src  # scale mismatch on purpose
        s, R, t = geometry.umeyama_sim3(jnp.asarray(src), jnp.asarray(dst),
                                        with_scale=False)
        assert float(s) == 1.0

    def test_matches_reference_impl(self):
        # Cross-check against the reference's numpy Umeyama (alignment.py:73).
        rng = np.random.default_rng(8)
        src = rng.normal(size=(40, 3))
        dst = rng.normal(size=(40, 3)) + src * 1.7
        s, R, t = geometry.umeyama_sim3(jnp.asarray(src), jnp.asarray(dst))
        # reference-style computation
        mu_s, mu_d = src.mean(0), dst.mean(0)
        X, Y = src - mu_s, dst - mu_d
        cov = (Y.T @ X) / 40
        U, S, Vt = np.linalg.svd(cov)
        Rr = U @ Vt
        if np.linalg.det(Rr) < 0:
            U[:, -1] *= -1
            Rr = U @ Vt
        sr = S.sum() / ((X * X).sum() / 40 + 1e-12)
        tr = mu_d - sr * (Rr @ mu_s)
        np.testing.assert_allclose(float(s), sr, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(R), Rr, atol=1e-9)
        np.testing.assert_allclose(np.asarray(t), tr, atol=1e-9)


class TestNaNDepth:
    def test_nan_depth_stays_local(self):
        # one NaN depth pixel must not contaminate other frames/pixels
        depth = np.ones((2, 8, 10, 1))
        depth[0, 2, 3, 0] = np.nan
        extr = np.tile(np.eye(4)[:3], (2, 1, 1))
        intr = np.tile(np.array([[10.0, 0, 5], [0, 10.0, 4], [0, 0, 1.0]]),
                       (2, 1, 1))
        pts = np.asarray(geometry.unproject_depth_map_to_point_map(
            jnp.asarray(depth), jnp.asarray(extr), jnp.asarray(intr)))
        assert np.isnan(pts[0, 2, 3]).all()
        finite_mask = np.ones((2, 8, 10), bool)
        finite_mask[0, 2, 3] = False
        assert np.isfinite(pts[finite_mask]).all()
