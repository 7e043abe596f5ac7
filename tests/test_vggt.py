import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vggt_slam_tpu.models.vggt.config import VGGTConfig
from vggt_slam_tpu.models.vggt.model import VGGT, init_params, param_count

pytestmark = pytest.mark.slow  # full tiny-model forwards


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = VGGTConfig.tiny()
    rng = jax.random.PRNGKey(0)
    params = init_params(cfg, rng, sample_frames=2, image_hw=(56, 70))
    return cfg, params


class TestForward:
    def test_output_contract(self, tiny_setup):
        cfg, params = tiny_setup
        S, H, W = 3, 56, 70
        imgs = jnp.asarray(np.random.default_rng(0).uniform(size=(S, 3, H, W)),
                           dtype=jnp.float32)
        out = VGGT(cfg).apply(params, imgs)
        assert out["pose_enc"].shape == (S, 9)
        assert out["depth"].shape == (S, H, W, 1)
        assert out["depth_conf"].shape == (S, H, W)
        assert out["world_points_cf"].shape == (3, S, H, W)
        assert out["world_points_conf"].shape == (S, H, W)
        assert out["images"].shape == (S, 3, H, W)
        for k, v in out.items():
            assert bool(jnp.all(jnp.isfinite(v))), f"non-finite in {k}"
        # Contract guarantees: positive depth, conf >= 1. The pose encoding
        # is RAW (linear activations, matching the released camera head);
        # quaternion normalization happens in quat_to_rotmat downstream.
        assert float(out["depth"].min()) > 0
        assert float(out["depth_conf"].min()) >= 1

    def test_jit_forward(self, tiny_setup):
        cfg, params = tiny_setup
        imgs = jnp.zeros((2, 3, 56, 70))
        fwd = jax.jit(lambda p, x: VGGT(cfg).apply(p, x))
        out = fwd(params, imgs)
        assert out["pose_enc"].shape == (2, 9)

    def test_single_frame(self, tiny_setup):
        cfg, params = tiny_setup
        imgs = jnp.zeros((1, 3, 56, 70))
        out = VGGT(cfg).apply(params, imgs)
        assert out["pose_enc"].shape == (1, 9)

    def test_frame_count_changes_output(self, tiny_setup):
        # Global attention must actually mix frames: frame 0's depth should
        # differ when a second (different) frame is present.
        cfg, params = tiny_setup
        rng = np.random.default_rng(1)
        f0 = rng.uniform(size=(1, 3, 56, 70)).astype(np.float32)
        f1 = rng.uniform(size=(1, 3, 56, 70)).astype(np.float32)
        out_single = VGGT(cfg).apply(params, jnp.asarray(f0))
        out_pair = VGGT(cfg).apply(params, jnp.asarray(np.concatenate([f0, f1])))
        d = np.abs(np.asarray(out_single["depth"][0]) -
                   np.asarray(out_pair["depth"][0])).max()
        assert d > 1e-6

    def test_first_frame_token_specialization(self, tiny_setup):
        # Swapping frame order changes outputs (frame 0 has its own tokens).
        cfg, params = tiny_setup
        rng = np.random.default_rng(2)
        a = rng.uniform(size=(1, 3, 56, 70)).astype(np.float32)
        b = rng.uniform(size=(1, 3, 56, 70)).astype(np.float32)
        out_ab = VGGT(cfg).apply(params, jnp.asarray(np.concatenate([a, b])))
        out_ba = VGGT(cfg).apply(params, jnp.asarray(np.concatenate([b, a])))
        # frame "a"'s pose_enc differs depending on its position
        d = np.abs(np.asarray(out_ab["pose_enc"][0]) -
                   np.asarray(out_ba["pose_enc"][1])).max()
        assert d > 1e-6

    def test_param_count_tiny(self, tiny_setup):
        cfg, params = tiny_setup
        n = param_count(params)
        assert 1e4 < n < 5e6


class TestFullSizeShapes:
    def test_1b_config_param_count(self):
        # Structure-only check: count params analytically via eval_shape
        # (no giant allocation).
        cfg = VGGTConfig.vggt_1b()
        rng = jax.random.PRNGKey(0)

        shapes = jax.eval_shape(
            lambda r: init_params(cfg, r, sample_frames=1, image_hw=(392, 518)),
            rng)
        n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
        # VGGT-1B is ~1.2-1.3B params; ours must land in that class.
        assert 0.9e9 < n < 1.6e9, f"param count {n/1e9:.2f}B out of range"


class TestBucketing:
    def test_padded_forward_matches_unpadded(self, tiny_setup):
        # The key bucketing invariant: padding frames + valid_frames masking
        # must leave the valid frames' outputs unchanged.
        cfg, params = tiny_setup
        rng = np.random.default_rng(3)
        imgs = jnp.asarray(rng.uniform(size=(2, 3, 56, 70)), dtype=jnp.float32)
        out_ref = VGGT(cfg).apply(params, imgs)
        padded = jnp.concatenate(
            [imgs, jnp.asarray(rng.uniform(size=(2, 3, 56, 70)),
                               dtype=jnp.float32)], axis=0)
        out_pad = VGGT(cfg).apply(params, padded, valid_frames=2)
        for k in ("pose_enc", "depth", "world_points_cf", "depth_conf"):
            # world_points_cf is channel-first: its frame axis is 1
            sl = (slice(None), slice(0, 2)) if k == "world_points_cf" \
                else slice(0, 2)
            # rtol absorbs batch-size-dependent XLA conv scheduling noise
            # (~1e-6 relative, amplified by the expm1 point activation); a
            # genuine padding leak shows up as O(1) absolute differences.
            np.testing.assert_allclose(
                np.asarray(out_pad[k][sl]), np.asarray(out_ref[k]),
                rtol=1e-5, atol=1e-5, err_msg=k)

    def test_bucketed_model_fn(self, tiny_setup):
        from vggt_slam_tpu.models.vggt.model import make_bucketed_model_fn
        cfg, params = tiny_setup
        fn = make_bucketed_model_fn(VGGT(cfg), params, bucket_size=4)
        rng = np.random.default_rng(4)
        for S in (2, 3, 4):
            out = fn(rng.uniform(size=(S, 3, 56, 70)).astype(np.float32))
            assert out["pose_enc"].shape == (S, 9)
            assert out["depth"].shape == (S, 56, 70, 1)
        # smaller-S outputs equal a direct forward
        imgs = rng.uniform(size=(3, 3, 56, 70)).astype(np.float32)
        direct = VGGT(cfg).apply(params, jnp.asarray(imgs))
        via_fn = fn(imgs)
        np.testing.assert_allclose(via_fn["pose_enc"],
                                   np.asarray(direct["pose_enc"]), atol=1e-5)


class TestStaticSoftmax:
    def test_static_global_softmax_matches_online(self):
        # Wiring test: global_softmax="static" threads through the
        # aggregator to the flash kernel. At tiny global N the kernel takes
        # the single-block path where the mode is a no-op, so outputs must
        # be bit-identical; multi-block numerics are covered in
        # tests/test_attention.py::TestAgreement::test_static_softmax_*.
        cfg_on = VGGTConfig.tiny(attn_impl="flash")
        cfg_st = VGGTConfig.tiny(attn_impl="flash", global_softmax="static")
        rng = jax.random.PRNGKey(0)
        params = init_params(cfg_on, rng, sample_frames=2, image_hw=(56, 70))
        imgs = jnp.asarray(
            np.random.default_rng(0).uniform(size=(3, 3, 56, 70)),
            dtype=jnp.float32)
        out_on = VGGT(cfg_on).apply(params, imgs)
        out_st = VGGT(cfg_st).apply(params, imgs)
        np.testing.assert_array_equal(np.asarray(out_st["depth"]),
                                      np.asarray(out_on["depth"]))


class TestGlobalKVMerging:
    @pytest.mark.parametrize("merge", ["sim", "stride"])
    def test_merged_forward_runs_and_is_close(self, merge):
        # stride-2 K/V merging keeps the output contract; with smooth
        # (low-frequency) token content the merged attention should be a
        # reasonable approximation, and padding must still mask correctly.
        cfg = VGGTConfig.tiny(global_kv_stride=2, global_merge=merge)
        cfg_full = VGGTConfig.tiny()
        rng = jax.random.PRNGKey(0)
        params = init_params(cfg_full, rng, sample_frames=2, image_hw=(56, 70))
        imgs = jnp.asarray(np.random.default_rng(0).uniform(size=(3, 3, 56, 70)),
                           dtype=jnp.float32)
        out_m = VGGT(cfg).apply(params, imgs)       # same params, merged attn
        out_f = VGGT(cfg_full).apply(params, imgs)
        assert out_m["pose_enc"].shape == (3, 9)
        for k, v in out_m.items():
            assert bool(jnp.all(jnp.isfinite(v))), k
        # not identical (it's an approximation) but same order of magnitude
        d = np.abs(np.asarray(out_m["depth"]) - np.asarray(out_f["depth"]))
        assert d.mean() < 10.0

    def test_fatal_merge_family_guard(self):
        """The measured worker-fatal family (sim merge, stride>=16, narrow
        agg) must raise an explanatory error on the TPU backend instead of
        wedging the chip (ARCHITECTURE.md §9, r4 bisect); CPU runs, the
        flagship width, stride 8, and the env override are unaffected."""
        import os

        from vggt_slam_tpu.models.vggt.aggregator import (
            _check_fatal_merge_family)
        small16 = VGGTConfig.small(global_kv_stride=16, global_merge="sim",
                                   attn_impl="flash")
        with pytest.raises(RuntimeError, match="fatal"):
            _check_fatal_merge_family(small16, "tpu")
        # not fatal: CPU backend, stride 8 at D=32, flagship width, and
        # the chunked-XLA fallback (every measured crash ran the flash
        # fusion context; chunked+sim ran a full eval sequence clean).
        _check_fatal_merge_family(small16, "cpu")
        _check_fatal_merge_family(
            VGGTConfig.small(global_kv_stride=8, global_merge="sim",
                             attn_impl="flash"), "tpu")
        _check_fatal_merge_family(
            VGGTConfig.vggt_1b(global_kv_stride=16, global_merge="sim",
                               attn_impl="flash"), "tpu")
        _check_fatal_merge_family(
            VGGTConfig.small64(global_kv_stride=8, global_merge="sim",
                               attn_impl="chunked"), "tpu")
        # small64 (D=64) extends the family DOWN to stride 8 under flash
        # (r4: 2/2 worker crashes at the eval config, clean at stride 1).
        with pytest.raises(RuntimeError, match="fatal"):
            _check_fatal_merge_family(
                VGGTConfig.small64(global_kv_stride=16, global_merge="sim",
                                   attn_impl="flash"), "tpu")
        with pytest.raises(RuntimeError, match="fatal"):
            _check_fatal_merge_family(
                VGGTConfig.small64(global_kv_stride=8, global_merge="sim",
                                   attn_impl="flash"), "tpu")
        os.environ["VGGT_ALLOW_FATAL_MERGE"] = "1"
        try:
            _check_fatal_merge_family(small16, "tpu")
        finally:
            del os.environ["VGGT_ALLOW_FATAL_MERGE"]
        # The guard sits on the forward path: a CPU forward of the guarded
        # config still runs (backend-gated).
        cfg = VGGTConfig.tiny(global_kv_stride=16, global_merge="sim")
        params = init_params(VGGTConfig.tiny(), jax.random.PRNGKey(0),
                             sample_frames=2, image_hw=(56, 70))
        out = VGGT(cfg).apply(params, jnp.zeros((2, 3, 56, 70)))
        assert out["pose_enc"].shape == (2, 9)

    def test_sim_merge_at_least_as_faithful_as_stride(self):
        """Similarity merging (FastVGGT's method) preserves dropped-token
        mass; at the same K/V budget its aggregator output should sit at
        least as close to exact attention as plain subsampling (averaged
        over tokens)."""
        cfg_full = VGGTConfig.tiny()
        rng = jax.random.PRNGKey(0)
        params = init_params(cfg_full, rng, sample_frames=2, image_hw=(56, 70))
        imgs = jnp.asarray(
            np.random.default_rng(5).uniform(size=(4, 3, 56, 70)),
            dtype=jnp.float32)
        ref = VGGT(cfg_full).apply(params, imgs)["pose_enc"]
        errs = {}
        for merge in ("sim", "stride"):
            cfg = VGGTConfig.tiny(global_kv_stride=2, global_merge=merge)
            out = VGGT(cfg).apply(params, imgs)["pose_enc"]
            errs[merge] = float(jnp.mean(jnp.abs(out - ref)))
        assert errs["sim"] <= errs["stride"] * 1.25, errs

    @pytest.mark.parametrize("merge", ["sim", "stride"])
    def test_merged_padding_invariance(self, merge):
        cfg = VGGTConfig.tiny(global_kv_stride=2, global_merge=merge)
        rng = jax.random.PRNGKey(1)
        params = init_params(cfg, rng, sample_frames=2, image_hw=(56, 70))
        rr = np.random.default_rng(2)
        imgs = jnp.asarray(rr.uniform(size=(2, 3, 56, 70)), dtype=jnp.float32)
        out_ref = VGGT(cfg).apply(params, imgs, valid_frames=2)
        padded = jnp.concatenate(
            [imgs, jnp.asarray(rr.uniform(size=(2, 3, 56, 70)),
                               dtype=jnp.float32)], axis=0)
        out_pad = VGGT(cfg).apply(params, padded, valid_frames=2)
        np.testing.assert_allclose(np.asarray(out_pad["pose_enc"][:2]),
                                   np.asarray(out_ref["pose_enc"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_pad["depth"][:2]),
                                   np.asarray(out_ref["depth"]), atol=1e-5)


class TestWithUnprojection:
    def test_in_jit_unprojection_matches_geometry(self, tiny_setup):
        from vggt_slam_tpu.models.vggt.model import make_bucketed_model_fn
        from vggt_slam_tpu.ops import geometry
        cfg, params = tiny_setup
        fn = make_bucketed_model_fn(VGGT(cfg), params, bucket_size=4,
                                    with_unprojection=True)
        imgs = np.random.default_rng(7).uniform(
            size=(3, 3, 56, 70)).astype(np.float32)
        out = fn(imgs)
        assert out["extrinsic"].shape == (3, 3, 4)
        assert out["intrinsic"].shape == (3, 3, 3)
        assert out["unproj_points"].shape == (3, 56, 70, 3)
        # must equal the standalone decode + unprojection
        extr, intr = geometry.pose_encoding_to_extri_intri(
            jnp.asarray(out["pose_enc"]), (56, 70))
        ref = geometry.unproject_depth_map_to_point_map(
            jnp.asarray(out["depth"]), extr, intr)
        np.testing.assert_allclose(out["extrinsic"], np.asarray(extr),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(out["unproj_points"], np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
