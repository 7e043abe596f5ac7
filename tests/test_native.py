"""Tests for the native C++ KD-tree and the profiling utils."""
import time

import numpy as np
import pytest

from vggt_slam_tpu.native import kdtree as nk


@pytest.mark.skipif(not nk.available(), reason="no g++/compiled lib")
class TestNativeKDTree:
    def test_exact_agreement_with_brute_force(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1, 1, (2000, 3)).astype(np.float32)
        q = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
        tree = nk.KDTree(pts)
        d, i = tree.query(q)
        # brute force reference
        d2 = np.linalg.norm(q[:, None, :] - pts[None, :, :], axis=-1)
        bi = d2.argmin(axis=1)
        bd = d2.min(axis=1)
        np.testing.assert_allclose(d, bd, atol=1e-5)
        # indices may differ only at exact ties
        mismatch = i != bi
        if mismatch.any():
            np.testing.assert_allclose(d[mismatch], bd[mismatch], atol=1e-6)

    def test_geometry_eval_uses_consistent_distances(self):
        from vggt_slam_tpu.evals.geometry_eval import nn_distances
        rng = np.random.default_rng(1)
        a = rng.uniform(size=(300, 3)).astype(np.float32)
        b = a + 0.001
        d = nn_distances(a, b)
        assert d.shape == (300,)
        assert float(d.max()) < 0.01

    def test_query_own_points_zero(self):
        rng = np.random.default_rng(2)
        pts = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
        tree = nk.KDTree(pts)
        d, i = tree.query(pts)
        np.testing.assert_allclose(d, 0.0, atol=1e-6)
        np.testing.assert_array_equal(i, np.arange(100))


class TestStageTimer:
    def test_accumulates_and_reports(self):
        from vggt_slam_tpu.utils.profiling import StageTimer
        t = StageTimer()
        for _ in range(3):
            with t.stage("work"):
                time.sleep(0.01)
        with t.stage("other"):
            pass
        s = t.summary()
        assert s["work"]["count"] == 3
        assert s["work"]["total_s"] >= 0.03
        assert "other" in s
        assert "work" in t.report()

    def test_sync_returns_scalar(self):
        import jax.numpy as jnp
        from vggt_slam_tpu.utils.profiling import sync
        out = sync({"a": jnp.ones((4,)), "b": [jnp.zeros((2, 2))], "c": "str"})
        assert out == 4.0
