import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vggt_slam_tpu.ops import lie

jax.config.update("jax_enable_x64", True)


def rng(seed=0):
    return np.random.default_rng(seed)


class TestSO3:
    def test_exp_log_roundtrip(self):
        w = jnp.asarray(rng(1).uniform(-2, 2, size=(64, 3)))
        R = lie.so3_exp(w)
        # Valid rotations
        eye = jnp.eye(3)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2),
                                   jnp.broadcast_to(eye, R.shape), atol=1e-10)
        w2 = lie.so3_log(R)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=1e-8)

    def test_log_small_angle(self):
        w = jnp.asarray([[1e-9, -2e-9, 3e-10]])
        np.testing.assert_allclose(np.asarray(lie.so3_log(lie.so3_exp(w))), np.asarray(w),
                                   atol=1e-12)

    def test_log_near_pi(self):
        axis = np.array([0.3, -0.5, 0.81])
        axis /= np.linalg.norm(axis)
        w = jnp.asarray([axis * (np.pi - 1e-5)])
        R = lie.so3_exp(w)
        w2 = lie.so3_log(R)
        np.testing.assert_allclose(np.asarray(lie.so3_exp(w2)), np.asarray(R), atol=5e-5)

    def test_quat_roundtrip(self):
        w = jnp.asarray(rng(2).uniform(-2, 2, size=(32, 3)))
        R = lie.so3_exp(w)
        q = lie.rotmat_to_quat(R)
        R2 = lie.quat_to_rotmat(q)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-9)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(rng(3).uniform(-1.5, 1.5, size=(64, 6)))
        T = lie.se3_exp(xi)
        np.testing.assert_allclose(np.asarray(lie.se3_log(T)), np.asarray(xi), atol=1e-8)

    def test_inverse(self):
        xi = jnp.asarray(rng(4).uniform(-1, 1, size=(8, 6)))
        T = lie.se3_exp(xi)
        Ti = lie.se3_inverse(T)
        np.testing.assert_allclose(np.asarray(T @ Ti),
                                   np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-10)

    def test_inverse_accepts_3x4(self):
        xi = jnp.asarray(rng(5).uniform(-1, 1, size=(3, 6)))
        T = lie.se3_exp(xi)
        Ti = lie.se3_inverse(T[..., :3, :])
        np.testing.assert_allclose(np.asarray(T @ Ti),
                                   np.broadcast_to(np.eye(4), (3, 4, 4)), atol=1e-10)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = np.asarray(rng(6).uniform(-1.0, 1.0, size=(64, 7)))
        xi[:, 6] = rng(7).uniform(-0.8, 0.8, size=64)  # scale exponent
        xi = jnp.asarray(xi)
        T = lie.sim3_exp(xi)
        np.testing.assert_allclose(np.asarray(lie.sim3_log(T)), np.asarray(xi), atol=1e-6)

    def test_scale_extraction(self):
        xi = jnp.asarray([[0.0] * 6 + [0.5]])
        T = lie.sim3_exp(xi)
        np.testing.assert_allclose(np.asarray(T[0, :3, :3]),
                                   np.exp(0.5) * np.eye(3), atol=1e-9)

    def test_zero(self):
        T = lie.sim3_exp(jnp.zeros((1, 7)))
        np.testing.assert_allclose(np.asarray(T[0]), np.eye(4), atol=1e-12)


class TestMatrixFuncs:
    def test_expm_vs_scipy(self):
        from scipy.linalg import expm as sexpm
        A = rng(8).normal(size=(16, 4, 4)) * 0.8
        E = np.asarray(lie.expm(jnp.asarray(A)))
        for i in range(16):
            np.testing.assert_allclose(E[i], sexpm(A[i]), atol=1e-9)

    def test_logm_roundtrip(self):
        A = rng(9).normal(size=(16, 4, 4)) * 0.3
        A = A - np.trace(A, axis1=-2, axis2=-1)[:, None, None] / 4 * np.eye(4)
        H = np.asarray(lie.expm(jnp.asarray(A)))
        L = np.asarray(lie.logm(jnp.asarray(H)))
        np.testing.assert_allclose(L, A, atol=1e-7)


class TestSL4:
    def test_basis_is_traceless_and_independent(self):
        B = np.asarray(lie.sl4_basis(jnp.float64))
        assert B.shape == (15, 4, 4)
        np.testing.assert_allclose(np.trace(B, axis1=-2, axis2=-1), 0, atol=0)
        assert np.linalg.matrix_rank(B.reshape(15, 16)) == 15

    def test_hat_vee_roundtrip(self):
        xi = jnp.asarray(rng(10).uniform(-1, 1, size=(32, 15)))
        np.testing.assert_allclose(np.asarray(lie.sl4_vee(lie.sl4_hat(xi))),
                                   np.asarray(xi), atol=1e-12)

    def test_exp_has_unit_det(self):
        xi = jnp.asarray(rng(11).uniform(-0.5, 0.5, size=(32, 15)))
        H = lie.sl4_exp(xi)
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(H)), 1.0, atol=1e-9)

    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(rng(12).uniform(-0.4, 0.4, size=(32, 15)))
        H = lie.sl4_exp(xi)
        np.testing.assert_allclose(np.asarray(lie.sl4_log(H)), np.asarray(xi), atol=1e-7)

    def test_log_of_reference_style_homography(self):
        # The synthetic SL4 transforms from reference graph.py:99-117.
        H12 = np.array([[1.0, 0.1, 0.0, 2.0],
                        [0.0, 1.0, 0.0, 3.0],
                        [0.0, 0.0, 1.0, 5.0],
                        [0.001, 0.002, 0.0, 1.0]])
        Hn = np.asarray(lie.sl4_normalize(jnp.asarray(H12)))
        np.testing.assert_allclose(np.linalg.det(Hn), 1.0, atol=1e-10)
        xi = lie.sl4_log(jnp.asarray(Hn))
        H2 = np.asarray(lie.sl4_exp(xi))
        np.testing.assert_allclose(H2, Hn, atol=1e-7)

    def test_normalize_sign(self):
        H = -np.eye(4)  # det = 1 already but negative scale
        Hn = np.asarray(lie.sl4_normalize(jnp.asarray(H)))
        np.testing.assert_allclose(np.linalg.det(Hn), 1.0, atol=1e-10)


class TestApplyHomography:
    def test_identity(self):
        X = jnp.asarray(rng(13).normal(size=(10, 3)))
        np.testing.assert_allclose(np.asarray(lie.apply_homography(jnp.eye(4), X)),
                                   np.asarray(X), atol=1e-12)

    def test_matches_manual(self):
        H = np.asarray(rng(14).normal(size=(4, 4))) + 2 * np.eye(4)
        X = rng(15).normal(size=(20, 3))
        Xh = np.hstack([X, np.ones((20, 1))])
        expected = (H @ Xh.T).T
        expected = expected[:, :3] / expected[:, 3:]
        got = np.asarray(lie.apply_homography(jnp.asarray(H), jnp.asarray(X)))
        np.testing.assert_allclose(got, expected, atol=1e-9)

    def test_batched(self):
        H = jnp.asarray(rng(16).normal(size=(5, 4, 4))) + 2 * jnp.eye(4)
        X = jnp.asarray(rng(17).normal(size=(20, 3)))
        got = lie.apply_homography(H, X[None, :, :])
        assert got.shape == (5, 20, 3)
        for i in range(5):
            np.testing.assert_allclose(np.asarray(got[i]),
                                       np.asarray(lie.apply_homography(H[i], X)), atol=1e-9)


class TestInv44:
    def test_matches_linalg_inv(self):
        rng = np.random.default_rng(0)
        M = rng.normal(size=(64, 4, 4))
        M += 4.0 * np.eye(4)  # well-conditioned
        out = np.asarray(lie.inv44(jnp.asarray(M)))
        ref = np.linalg.inv(M)
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)

    def test_identity_products(self):
        rng = np.random.default_rng(1)
        M = rng.normal(size=(8, 4, 4)) + 3.0 * np.eye(4)
        out = np.asarray(lie.inv44(jnp.asarray(M)) @ jnp.asarray(M))
        np.testing.assert_allclose(out, np.broadcast_to(np.eye(4), out.shape),
                                   atol=1e-5)
