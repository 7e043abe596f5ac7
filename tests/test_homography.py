import numpy as np
import jax
import jax.numpy as jnp

from vggt_slam_tpu.ops import homography, lie

jax.config.update("jax_enable_x64", True)


def random_sl4(rng, scale=0.1):
    xi = rng.uniform(-scale, scale, size=15)
    return np.asarray(lie.sl4_exp(jnp.asarray(xi)))


def make_points(rng, n=200):
    return rng.uniform(-1, 1, size=(n, 3)) + np.array([0, 0, 3.0])


class TestDLT:
    def test_exact_recovery_minimal(self):
        rng = np.random.default_rng(0)
        H_gt = random_sl4(rng)
        X = make_points(rng, 5)
        Y = np.asarray(lie.apply_homography(jnp.asarray(H_gt), jnp.asarray(X)))
        H_est = np.asarray(homography.estimate_3d_homography(
            jnp.asarray(X[None]), jnp.asarray(Y[None])))[0]
        np.testing.assert_allclose(H_est / H_est[3, 3] * H_gt[3, 3], H_gt, atol=1e-6)

    def test_exact_recovery_batch(self):
        rng = np.random.default_rng(1)
        B = 16
        Hs = np.stack([random_sl4(rng) for _ in range(B)])
        X = np.stack([make_points(rng, 8) for _ in range(B)])
        Y = np.asarray(lie.apply_homography(jnp.asarray(Hs)[:, None, :, :].squeeze(1),
                                            jnp.asarray(X)))
        H_est = np.asarray(homography.estimate_3d_homography(jnp.asarray(X), jnp.asarray(Y)))
        for i in range(B):
            Hn = H_est[i] * (Hs[i][3, 3] / H_est[i][3, 3])
            np.testing.assert_allclose(Hn, Hs[i], atol=1e-5)

    def test_unit_det_output(self):
        rng = np.random.default_rng(2)
        H_gt = random_sl4(rng)
        X = make_points(rng, 5)
        Y = np.asarray(lie.apply_homography(jnp.asarray(H_gt), jnp.asarray(X)))
        H_est = np.asarray(homography.estimate_3d_homography(
            jnp.asarray(X[None]), jnp.asarray(Y[None])))[0]
        np.testing.assert_allclose(np.linalg.det(H_est), 1.0, atol=1e-6)

    def test_degenerate_fallback_identity(self):
        # All points identical -> rank-deficient system -> identity fallback.
        X = np.ones((1, 5, 3))
        Y = np.ones((1, 5, 3)) * 2.0
        H_est = np.asarray(homography.estimate_3d_homography(jnp.asarray(X), jnp.asarray(Y)))
        assert np.all(np.isfinite(H_est))


class TestRansac:
    def test_recovers_under_outliers(self):
        rng = np.random.default_rng(3)
        H_gt = random_sl4(rng, scale=0.15)
        X = make_points(rng, 400)
        Y = np.array(lie.apply_homography(jnp.asarray(H_gt), jnp.asarray(X)))
        # 30% outliers
        n_out = 120
        Y[:n_out] += rng.uniform(0.5, 1.0, size=(n_out, 3))
        H, count = homography.ransac_projective(
            jnp.asarray(X), jnp.asarray(Y), key=jax.random.PRNGKey(0))
        H = np.asarray(H)
        assert count >= 250
        err = np.linalg.norm(
            np.asarray(lie.apply_homography(jnp.asarray(H), jnp.asarray(X[n_out:])))
            - Y[n_out:], axis=-1)
        assert np.median(err) < 1e-3

    def test_respects_weight_mask(self):
        rng = np.random.default_rng(4)
        H_gt = random_sl4(rng, scale=0.1)
        X = make_points(rng, 300)
        Y = np.array(lie.apply_homography(jnp.asarray(H_gt), jnp.asarray(X)))
        # Corrupt masked-out points completely; mask must protect the fit.
        w = np.ones(300)
        w[:150] = 0.0
        Y[:150] = rng.normal(size=(150, 3)) * 10
        H, count = homography.ransac_projective(
            jnp.asarray(X), jnp.asarray(Y), jnp.asarray(w), key=jax.random.PRNGKey(1))
        err = np.linalg.norm(
            np.asarray(lie.apply_homography(jnp.asarray(np.asarray(H)), jnp.asarray(X[150:])))
            - Y[150:], axis=-1)
        assert np.median(err) < 1e-3
        assert count <= 150.0 + 1e-6  # masked points can never count

    def test_se3_subset(self):
        # SE(3) is a subgroup of SL(4); RANSAC should recover rigid motions too.
        rng = np.random.default_rng(5)
        T_gt = np.asarray(lie.se3_exp(jnp.asarray(rng.uniform(-0.5, 0.5, size=6))))
        X = make_points(rng, 200)
        Y = (T_gt[:3, :3] @ X.T).T + T_gt[:3, 3]
        H, _ = homography.ransac_projective(
            jnp.asarray(X), jnp.asarray(Y), key=jax.random.PRNGKey(2))
        H = np.asarray(H)
        np.testing.assert_allclose(H / np.abs(H[3, 3]), T_gt, atol=1e-4)


class TestPlanarDegeneracy:
    def test_coplanar_points_fall_back_to_identity(self):
        # All correspondences on one plane: the 3D homography is not unique
        # (any member of the 2D-homography family fits); the reference's
        # null-space check falls back to identity (h_solve.py:79-93).
        rng = np.random.default_rng(0)
        X = rng.uniform(-1, 1, (1, 12, 3)).astype(np.float32)
        X[..., 2] = 0.7  # coplanar
        Y = X + np.float32([0.1, -0.2, 0.0])  # consistent planar motion
        H = np.asarray(homography.estimate_3d_homography(jnp.asarray(X), jnp.asarray(Y)))
        np.testing.assert_allclose(H[0], np.eye(4), atol=1e-6)

    def test_non_planar_unaffected_by_null_check(self):
        rng = np.random.default_rng(1)
        X = rng.uniform(-1, 1, (1, 12, 3)).astype(np.float32) + [0, 0, 3]
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.2, -0.1, 0.3]
        Xh = np.concatenate([X, np.ones_like(X[..., :1])], axis=-1)
        Y = (Xh @ T.T)[..., :3]
        H = np.asarray(homography.estimate_3d_homography(jnp.asarray(X), jnp.asarray(Y)))
        pred = np.asarray(lie.apply_homography(jnp.asarray(H), jnp.asarray(X)))
        np.testing.assert_allclose(pred, Y, atol=1e-3)


class TestDtypeRobustness:
    def test_bf16_point_maps_upcast(self):
        # the model emits bf16 point maps; the DLT SVD has no bf16 kernel
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.uniform(-1, 1, (500, 3)) + [0, 0, 3], jnp.bfloat16)
        T = np.eye(4); T[:3, 3] = [0.2, -0.1, 0.3]
        Xf = np.asarray(X, np.float64)
        Y = (np.concatenate([Xf, np.ones((500, 1))], 1) @ T.T)[:, :3]
        H, inl = homography.ransac_projective(
            X, jnp.asarray(Y, jnp.bfloat16), None,
            key=jax.random.PRNGKey(0), threshold=0.05)
        assert np.isfinite(np.asarray(H, np.float32)).all()
        assert float(inl) > 400
