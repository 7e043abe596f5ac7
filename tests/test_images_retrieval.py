import numpy as np
import jax
import jax.numpy as jnp

from vggt_slam_tpu.data import images as di


class TestPreprocess:
    def test_target_hw_landscape(self):
        # 640x480 -> (392, 518): height rounded to patch multiple
        assert di.preprocessed_hw(480, 640) == (392, 518)
        # square -> (518, 518)
        assert di.preprocessed_hw(1000, 1000) == (518, 518)
        # portrait capped at 518 rows
        assert di.preprocessed_hw(1200, 600) == (518, 518)

    def test_preprocess_array_shape_and_range(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, size=(480, 640, 3)).astype(np.uint8)
        out = di.preprocess_array(img)
        assert out.shape == (3, 392, 518)
        assert out.dtype == np.float32
        assert 0.0 <= out.min() and out.max() <= 1.0

    def test_batch_uniform(self, tmp_path):
        import cv2
        paths = []
        for i in range(3):
            p = str(tmp_path / f"f{i}.png")
            cv2.imwrite(p, np.random.default_rng(i).integers(
                0, 256, (480, 640, 3)).astype(np.uint8))
            paths.append(p)
        batch = di.load_and_preprocess_images(paths)
        assert batch.shape == (3, 3, 392, 518)

    def test_numeric_sort(self):
        names = ["a/10.png", "a/2.png", "a/1.5.png"]
        assert di.sort_images_by_number(names) == \
            ["a/1.5.png", "a/2.png", "a/10.png"]


class TestSALAD:
    def test_descriptor_contract(self):
        from vggt_slam_tpu.models.retrieval import SALAD, SALADConfig
        cfg = SALADConfig.tiny()
        model = SALAD(cfg)
        x = jnp.asarray(np.random.default_rng(0).uniform(
            size=(2, 3, cfg.input_size, cfg.input_size)), dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        desc = model.apply(params, x)
        D = cfg.token_dim + cfg.num_clusters * cfg.cluster_dim
        assert desc.shape == (2, D)
        np.testing.assert_allclose(np.asarray(jnp.linalg.norm(desc, axis=1)),
                                   1.0, atol=1e-5)

    def test_resizes_arbitrary_input(self):
        from vggt_slam_tpu.models.retrieval import SALAD, SALADConfig
        cfg = SALADConfig.tiny()
        model = SALAD(cfg)
        x = jnp.zeros((1, 3, 100, 130))
        params = model.init(jax.random.PRNGKey(0), x)
        desc = model.apply(params, x)
        assert desc.shape[0] == 1

    def test_sinkhorn_rows_sum_to_one(self):
        from vggt_slam_tpu.models.retrieval import sinkhorn_log
        rng = np.random.default_rng(1)
        scores = jnp.asarray(rng.normal(size=(50, 9)))  # 8 clusters + dustbin
        a = sinkhorn_log(scores, iters=3)
        full = jnp.exp(jax.nn.logsumexp(  # includes dustbin
            scores - jax.nn.logsumexp(scores, axis=-1, keepdims=True), axis=-1))
        # rows of (clusters+dustbin) sum to 1; cluster part is <= 1
        assert float(a.sum(axis=-1).max()) <= 1.0 + 1e-5


class TestLoopQueue:
    def test_keeps_most_similar_and_orders(self):
        # Overflow evicts the LEAST similar (largest L2); results come back
        # most-similar first (reference loop_closure.py:39-52 heap logic).
        from vggt_slam_tpu.slam.loop_closure import LoopMatch, LoopMatchQueue
        q = LoopMatchQueue(max_size=2)
        for score in (0.5, 0.1, 0.3):
            q.add(LoopMatch(score, 1, 0, 0, 0))
        out = q.get_matches()
        assert [m.similarity_score for m in out] == [0.1, 0.3]

    def test_zero_budget(self):
        from vggt_slam_tpu.slam.loop_closure import LoopMatch, LoopMatchQueue
        q = LoopMatchQueue(max_size=0)
        q.add(LoopMatch(0.1, 1, 0, 0, 0))
        assert q.get_matches() == []
