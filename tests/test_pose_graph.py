"""Pose-graph LM solver tests.

The SL(4) chain test ports the reference's only optimization self-test
(graph.py:89-159): 5 nodes composed from known homographies, noisy initial
values, odometry + one loop-closure factor, tight anchor prior; after LM the
estimates must match ground truth.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vggt_slam_tpu.ops import lie
from vggt_slam_tpu.slam.graph import PoseGraph

jax.config.update("jax_enable_x64", True)


# Synthetic SL(4) transforms with the same structure as reference graph.py:99-117.
H12 = np.array([[1.0, 0.1, 0.0, 2.0],
                [0.0, 1.0, 0.0, 3.0],
                [0.0, 0.0, 1.0, 5.0],
                [0.001, 0.002, 0.0, 1.0]])
H23 = np.array([[0.9, 0.2, 0.0, 1.5],
                [0.1, 1.1, 0.0, -2.0],
                [0.0, 0.0, 0.8, 4.0],
                [0.002, 0.003, 0.0005, 1.0]])
H34 = np.array([[1.05, -0.1, 0.0, 3.0],
                [0.2, 0.95, 0.0, 1.0],
                [0.0, 0.0, 0.9, 2.5],
                [0.0015, -0.001, 0.0003, 1.0]])
H45 = np.array([[0.98, 0.05, 0.0, -1.0],
                [-0.05, 1.02, 0.0, 2.0],
                [0.0, 0.0, 1.1, 0.5],
                [0.0008, 0.0015, -0.0002, 1.0]])


def nrm(H):
    det = np.linalg.det(H)
    return H / (np.sign(det) * np.abs(det) ** 0.25)


class TestSL4Chain:
    pytestmark = pytest.mark.slow
    def test_reference_synthetic_graph(self):
        rng = np.random.default_rng(seed=42)
        rels = [nrm(H) for H in (H12, H23, H34, H45)]
        gt = [np.eye(4)]
        for R in rels:
            gt.append(gt[-1] @ R)
        gt = [nrm(G) for G in gt]
        H52 = nrm(np.linalg.inv(gt[4]) @ gt[1])

        pg = PoseGraph("sl4")
        for i, pose in enumerate(gt, 1):
            noise = rng.uniform(-0.1, 0.1, size=15)
            noisy = pose @ np.asarray(lie.sl4_exp(jnp.asarray(noise)))
            pg.add_homography(i, noisy)
        pg.add_prior_factor(1, np.eye(4), pg.anchor_noise)
        pg.add_between_factor(1, 2, rels[0], pg.relative_noise)
        pg.add_between_factor(2, 3, rels[1], pg.relative_noise)
        pg.add_between_factor(3, 4, rels[2], pg.relative_noise)
        pg.add_between_factor(4, 5, rels[3], pg.relative_noise)
        pg.add_between_factor(5, 2, H52, pg.relative_noise)  # loop closure

        err = pg.optimize()
        assert err < 1e-12
        for i, G in enumerate(gt, 1):
            est = pg.get_homography(i)
            np.testing.assert_allclose(est, G, atol=1e-6)

    def test_duplicate_node_ignored(self):
        pg = PoseGraph("sl4")
        pg.add_homography(0, np.eye(4))
        pg.add_homography(0, 2 * np.eye(4))  # silently ignored (graph.py:37-39)
        np.testing.assert_allclose(pg.get_homography(0), np.eye(4))

    def test_factor_requires_nodes(self):
        pg = PoseGraph("sl4")
        pg.add_homography(0, np.eye(4))
        try:
            pg.add_between_factor(0, 1, np.eye(4))
            assert False
        except ValueError:
            pass


class TestSE3Chain:
    pytestmark = pytest.mark.slow
    def test_loop_correction(self):
        rng = np.random.default_rng(7)
        rels = [np.asarray(lie.se3_exp(jnp.asarray(rng.uniform(-0.5, 0.5, 6))))
                for _ in range(4)]
        gt = [np.eye(4)]
        for R in rels:
            gt.append(gt[-1] @ R)
        loop = np.linalg.inv(gt[4]) @ gt[1]

        pg = PoseGraph("se3")
        for i, pose in enumerate(gt):
            noisy = pose @ np.asarray(lie.se3_exp(jnp.asarray(rng.uniform(-0.08, 0.08, 6))))
            pg.add_homography(i, noisy)
        pg.add_prior_factor(0, np.eye(4))
        for k in range(4):
            pg.add_between_factor(k, k + 1, rels[k])
        pg.add_between_factor(4, 1, loop)
        err = pg.optimize()
        assert err < 1e-12
        for i, G in enumerate(gt):
            np.testing.assert_allclose(pg.get_homography(i), G, atol=1e-6)

    def test_anchor_is_respected(self):
        pg = PoseGraph("se3")
        anchor = np.asarray(lie.se3_exp(jnp.asarray([1.0, 2.0, 3.0, 0.1, 0.2, 0.3])))
        pg.add_homography(0, np.eye(4))
        pg.add_homography(1, np.eye(4))
        pg.add_prior_factor(0, anchor)
        rel = np.asarray(lie.se3_exp(jnp.asarray([0.5, 0, 0, 0, 0, 0])))
        pg.add_between_factor(0, 1, rel)
        pg.optimize()
        np.testing.assert_allclose(pg.get_homography(0), anchor, atol=1e-5)
        np.testing.assert_allclose(pg.get_homography(1), anchor @ rel, atol=1e-4)


class TestSim3Chain:
    pytestmark = pytest.mark.slow
    def test_scale_drift_correction(self):
        rng = np.random.default_rng(11)
        xis = rng.uniform(-0.3, 0.3, size=(4, 7))
        rels = [np.asarray(lie.sim3_exp(jnp.asarray(x))) for x in xis]
        gt = [np.eye(4)]
        for R in rels:
            gt.append(gt[-1] @ R)
        loop = np.linalg.inv(gt[4]) @ gt[0]

        pg = PoseGraph("sim3")
        for i, pose in enumerate(gt):
            noisy = pose @ np.asarray(lie.sim3_exp(jnp.asarray(rng.uniform(-0.05, 0.05, 7))))
            pg.add_homography(i, noisy)
        pg.add_prior_factor(0, np.eye(4))
        for k in range(4):
            pg.add_between_factor(k, k + 1, rels[k])
        pg.add_between_factor(4, 0, loop)
        err = pg.optimize()
        assert err < 1e-10
        for i, G in enumerate(gt):
            np.testing.assert_allclose(pg.get_homography(i), G, atol=1e-5)


class TestBucketGrowth:
    pytestmark = pytest.mark.slow
    def test_incremental_optimize_like_slam_loop(self):
        # Mirror the SLAM driver: add a node + odometry factor per "submap",
        # re-optimizing the whole graph each time (main.py:119 semantics).
        rng = np.random.default_rng(3)
        pg = PoseGraph("sl4")
        gt = [np.eye(4)]
        pg.add_homography(0, np.eye(4))
        pg.add_prior_factor(0, np.eye(4))
        for k in range(1, 12):
            xi = rng.uniform(-0.2, 0.2, size=15)
            rel = np.asarray(lie.sl4_exp(jnp.asarray(xi)))
            gt.append(nrm(gt[-1] @ rel))
            noisy = gt[-1] @ np.asarray(lie.sl4_exp(jnp.asarray(rng.uniform(-0.05, 0.05, 15))))
            pg.add_homography(k, noisy)
            pg.add_between_factor(k - 1, k, rel)
            pg.optimize()
        for k in range(12):
            np.testing.assert_allclose(pg.get_homography(k), gt[k], atol=1e-5)
