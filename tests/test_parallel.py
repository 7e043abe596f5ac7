"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vggt_slam_tpu.models.vggt.config import VGGTConfig
from vggt_slam_tpu.models.vggt.model import VGGT, init_params
from vggt_slam_tpu.parallel.mesh import make_mesh, make_param_shardings
from vggt_slam_tpu.parallel.infer import make_sharded_forward
from vggt_slam_tpu.parallel.train import make_dryrun_batch, make_train_step

pytestmark = pytest.mark.slow  # 8-device mesh + sharded model tests


@pytest.fixture(scope="module")
def setup(cpu_devices):
    cfg = VGGTConfig.tiny(agg_dim=64, enc_dim=64, agg_heads=4, enc_heads=4)
    params = init_params(cfg, jax.random.PRNGKey(0), 1, (56, 70))
    return cfg, params


class TestMesh:
    def test_mesh_shape(self, cpu_devices):
        mesh = make_mesh(cpu_devices)
        assert mesh.shape == {"dp": 4, "tp": 2}

    def test_param_rules_applied(self, setup, cpu_devices):
        cfg, params = setup
        mesh = make_mesh(cpu_devices)
        shardings = make_param_shardings(params, mesh)
        flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
        tp_sharded = [p for p, s in flat if "tp" in str(s.spec)]
        assert len(tp_sharded) > 0  # qkv/mlp kernels picked up the rules


class TestShardedInference:
    def test_matches_single_device(self, setup, cpu_devices):
        cfg, params = setup
        mesh = make_mesh(cpu_devices)
        model = VGGT(cfg)
        imgs = jnp.asarray(np.random.default_rng(0).uniform(
            size=(4, 3, 56, 70)), dtype=jnp.float32)  # 4 frames / dp=4
        fwd, p_sharded = make_sharded_forward(model, params, mesh)
        out_sharded = fwd(p_sharded, imgs)
        out_ref = model.apply(params, imgs)
        np.testing.assert_allclose(np.asarray(out_sharded["pose_enc"]),
                                   np.asarray(out_ref["pose_enc"]), atol=2e-3)
        np.testing.assert_allclose(np.asarray(out_sharded["depth"]),
                                   np.asarray(out_ref["depth"]),
                                   rtol=2e-2, atol=2e-3)


class TestShardedBucketedModelFn:
    def test_matches_single_device_bucketed(self, setup, cpu_devices):
        from vggt_slam_tpu.models.vggt.model import make_bucketed_model_fn
        from vggt_slam_tpu.parallel.infer import make_sharded_bucketed_model_fn
        cfg, params = setup
        mesh = make_mesh(cpu_devices)  # dp=4 -> bucket 5 rounds up to 8
        model = VGGT(cfg)
        fn_ref = make_bucketed_model_fn(model, params, bucket_size=5)
        fn_sh = make_sharded_bucketed_model_fn(model, params, bucket_size=5,
                                               mesh=mesh)
        rng = np.random.default_rng(7)
        for S in (3, 5):
            imgs = rng.uniform(size=(S, 3, 56, 70)).astype(np.float32)
            a = fn_ref(imgs)
            b = fn_sh(imgs)
            assert b["pose_enc"].shape == (S, 9)
            np.testing.assert_allclose(b["pose_enc"], a["pose_enc"],
                                       atol=2e-3, err_msg=f"S={S}")
            np.testing.assert_allclose(b["depth"], a["depth"],
                                       rtol=2e-2, atol=2e-3)


class TestRingAttention:
    """Sequence-parallel exact attention (parallel/ring.py): K/V chunks
    rotate via ppermute with online log-sum-exp merging across ring steps.
    Parity against the full-sequence reference on the 8-device mesh."""

    def _qkv(self, N, H=2, D=16, seed=0):
        rng = np.random.default_rng(seed)
        return tuple(jnp.asarray(rng.normal(size=(1, H, N, D)), jnp.float32)
                     for _ in range(3))

    def test_matches_naive(self, cpu_devices):
        from vggt_slam_tpu.ops.attention import naive_attention
        from vggt_slam_tpu.parallel.ring import ring_self_attention
        mesh = make_mesh(cpu_devices, tp=1)  # dp=8
        q, k, v = self._qkv(8 * 48)
        out = ring_self_attention(q, k, v, mesh, axis="dp")
        ref = naive_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-6)

    def test_valid_len_masking(self, cpu_devices):
        from vggt_slam_tpu.ops.attention import naive_attention
        from vggt_slam_tpu.parallel.ring import ring_self_attention
        mesh = make_mesh(cpu_devices, tp=1)
        q, k, v = self._qkv(8 * 48, seed=1)
        for vl in (300, 10):  # straddling chunk; all-but-first-chunk masked
            out = ring_self_attention(q, k, v, mesh, axis="dp",
                                      valid_len=jnp.int32(vl))
            ref = naive_attention(q, k[:, :, :vl], v[:, :, :vl])
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-6, err_msg=f"valid_len={vl}")

    def test_indivisible_tokens_pad_and_mask(self, cpu_devices):
        """Token counts that don't divide the ring size are padded to the
        next multiple and the pad keys masked - parity must still hold."""
        from vggt_slam_tpu.ops.attention import naive_attention
        from vggt_slam_tpu.parallel.ring import ring_self_attention
        mesh = make_mesh(cpu_devices, tp=1)
        for N in (8 * 48 + 4, 100, 13):
            q, k, v = self._qkv(N, seed=N)
            out = ring_self_attention(q, k, v, mesh, axis="dp")
            ref = naive_attention(q, k, v)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-6, err_msg=f"N={N}")

    def test_indivisible_with_valid_len(self, cpu_devices):
        from vggt_slam_tpu.ops.attention import naive_attention
        from vggt_slam_tpu.parallel.ring import ring_self_attention
        mesh = make_mesh(cpu_devices, tp=1)
        q, k, v = self._qkv(8 * 48 + 17, seed=3)
        vl = 100
        out = ring_self_attention(q, k, v, mesh, axis="dp",
                                  valid_len=jnp.int32(vl))
        ref = naive_attention(q, k[:, :, :vl], v[:, :, :vl])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-6)

    def test_flash_stats_merge_matches_naive(self):
        """The stats-returning flash kernel (interpret mode) merged across
        disjoint K/V chunks with the ring recurrence reproduces the full
        softmax - validating both the kernel's (m, l) contract and the
        exp2-domain merge used on TPU rings."""
        from vggt_slam_tpu.ops.attention import (flash_attention,
                                                 naive_attention)
        rng = np.random.default_rng(7)
        B, H, N, D = 1, 2, 96, 16
        q, k, v = (jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
                   for _ in range(3))
        n_chunks = 4
        Nl = N // n_chunks
        m = jnp.full((B, H, N, 1), -1e30, jnp.float32)
        l = jnp.zeros((B, H, N, 1), jnp.float32)
        acc = jnp.zeros((B, H, N, D), jnp.float32)
        for c in range(n_chunks):
            kc = k[:, :, c * Nl:(c + 1) * Nl]
            vc = v[:, :, c * Nl:(c + 1) * Nl]
            o_s, m_s, l_s = flash_attention(q, kc, vc, interpret=True,
                                            return_stats=True)
            m_s, l_s = m_s[..., None], l_s[..., None]
            m_new = jnp.maximum(m, m_s)
            c_prev = jnp.exp2(m - m_new)
            c_s = l_s * jnp.exp2(m_s - m_new)
            acc = acc * c_prev + o_s.astype(jnp.float32) * c_s
            l = l * c_prev + c_s
            m = m_new
        out = acc / jnp.maximum(l, 1e-30)
        ref = naive_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_flash_stats_multiblock_masked(self):
        """Stats mode on the multi-k-block path (online and static softmax)
        with a traced valid_len: (m, l) must describe the same softmax the
        normalized output used."""
        from vggt_slam_tpu.ops.attention import (flash_attention,
                                                 naive_attention)
        rng = np.random.default_rng(11)
        B, H, N, D = 1, 2, 512, 16
        q, k, v = (jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
                   for _ in range(3))
        vl = 300
        for softmax in ("online", "static"):
            o, m, l = flash_attention(q, k, v, valid_len=jnp.int32(vl),
                                      block_q=128, block_k=128,
                                      interpret=True, return_stats=True,
                                      softmax=softmax)
            ref = naive_attention(q, k[:, :, :vl], v[:, :, :vl])
            np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                                       atol=2e-5, err_msg=softmax)
            # Reconstruct the unnormalized row sums and check them against
            # the true logits: sum_k exp2(s_k - m) == l.
            import math as _math
            logits2 = np.einsum(
                "bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k[:, :, :vl]),
            ) * (_math.log2(_math.e) / _math.sqrt(D))
            l_ref = np.sum(np.exp2(logits2 - np.asarray(m)[..., None]),
                           axis=-1)
            np.testing.assert_allclose(np.asarray(l), l_ref, rtol=1e-4,
                                       err_msg=softmax)

    def test_packed_layout_matches_bhnd(self, cpu_devices):
        """layout="packed" ((B, N, H*D), token axis 1 sharded) must agree
        with the bhnd ring and the naive reference — including bucket
        masking and token counts that don't divide the ring."""
        from vggt_slam_tpu.ops.attention import naive_attention
        from vggt_slam_tpu.parallel.ring import ring_self_attention
        mesh = make_mesh(cpu_devices, tp=1)  # dp=8
        H, D = 2, 16
        for N, vl in ((8 * 48, None), (8 * 48, 300), (100, None),
                      (8 * 48 + 17, 100)):
            q, k, v = self._qkv(N, H=H, D=D, seed=N + 1)

            def pack(t):
                return jnp.swapaxes(t, 1, 2).reshape(1, t.shape[2], H * D)

            vlj = None if vl is None else jnp.int32(vl)
            out = ring_self_attention(pack(q), pack(k), pack(v), mesh,
                                      axis="dp", valid_len=vlj,
                                      layout="packed", num_heads=H)
            kv_n = N if vl is None else vl
            ref = pack(naive_attention(q, k[:, :, :kv_n], v[:, :, :kv_n]))
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-6, err_msg=f"N={N} vl={vl}")

    def test_packed_model_ring_matches_single_device(self, setup,
                                                     cpu_devices):
        """Full model with attn_impl='flash' + ring: the attention module
        must route through the PACKED ring path (pre-applied rope/LN,
        layout='packed') and still match the unsharded forward. The inner
        op on CPU meshes is the packed einsum with the flash stats
        contract; kernel-level packed-stats parity is asserted in
        tests/test_attention.py."""
        import dataclasses as dc

        from vggt_slam_tpu.models.vggt.model import make_bucketed_model_fn
        from vggt_slam_tpu.parallel.infer import make_sharded_bucketed_model_fn
        cfg, params = setup
        cfg_flash = dc.replace(cfg, attn_impl="flash")
        mesh = make_mesh(cpu_devices)  # dp=4, tp=2
        model = VGGT(cfg_flash)
        fn_ref = make_bucketed_model_fn(VGGT(cfg), params, bucket_size=3)
        fn_sp = make_sharded_bucketed_model_fn(model, params, bucket_size=3,
                                               mesh=mesh, seq_parallel=True)
        rng = np.random.default_rng(21)
        imgs = rng.uniform(size=(3, 3, 56, 70)).astype(np.float32)
        a = fn_ref(imgs)
        b = fn_sp(imgs)
        np.testing.assert_allclose(b["pose_enc"], a["pose_enc"], atol=2e-3)
        np.testing.assert_allclose(b["depth"], a["depth"], rtol=2e-2,
                                   atol=2e-3)

    def test_seq_parallel_model_matches_single_device(self, setup,
                                                      cpu_devices):
        """Full model with ring global attention (seq_parallel=True,
        exact path) agrees with the unsharded bucketed forward."""
        from vggt_slam_tpu.models.vggt.model import make_bucketed_model_fn
        from vggt_slam_tpu.parallel.infer import make_sharded_bucketed_model_fn
        cfg, params = setup
        mesh = make_mesh(cpu_devices)  # dp=4, tp=2
        model = VGGT(cfg)
        fn_ref = make_bucketed_model_fn(model, params, bucket_size=5)
        fn_sp = make_sharded_bucketed_model_fn(model, params, bucket_size=5,
                                               mesh=mesh, seq_parallel=True)
        rng = np.random.default_rng(9)
        for S in (3, 5):
            imgs = rng.uniform(size=(S, 3, 56, 70)).astype(np.float32)
            a = fn_ref(imgs)
            b = fn_sp(imgs)
            np.testing.assert_allclose(b["pose_enc"], a["pose_enc"],
                                       atol=2e-3, err_msg=f"S={S}")
            np.testing.assert_allclose(b["depth"], a["depth"],
                                       rtol=2e-2, atol=2e-3)


class TestPipelineParallel:
    """GPipe-style pipeline over the aggregator depth axis (parallel/pp.py):
    stacked stage params sharded P("pp"), scene microbatches hopping stages
    via ppermute, dp running independent pipelines over scene shards."""

    def _batch(self, cfg, B, S, hw, seed=3):
        from vggt_slam_tpu.parallel.pp import make_pp_dryrun_batch
        b = make_pp_dryrun_batch(cfg, B, S, hw)
        rng = np.random.default_rng(seed)
        b["images"] = jnp.asarray(
            rng.uniform(size=b["images"].shape), jnp.float32)
        b["pose_enc_gt"] = jnp.asarray(
            rng.normal(size=b["pose_enc_gt"].shape) * 0.1, jnp.float32)
        b["depth_gt"] = jnp.asarray(
            rng.uniform(0.5, 2.0, b["depth_gt"].shape), jnp.float32)
        return b

    def test_loss_matches_serial(self, setup, cpu_devices):
        """pp x dp pipelined loss == mean of per-scene serial losses."""
        from vggt_slam_tpu.parallel.mesh import make_pp_mesh
        from vggt_slam_tpu.parallel.pp import pp_vggt_loss, to_pp_params
        from vggt_slam_tpu.parallel.train import vggt_loss
        cfg, params = setup
        mesh = make_pp_mesh(cpu_devices, pp=2)  # pp=2, dp=4; L=4 -> 2/stage
        batch = self._batch(cfg, B=8, S=2, hw=(56, 70))
        loss_pp = float(jax.jit(
            lambda p, b: pp_vggt_loss(cfg, p, b, mesh))(
                to_pp_params(cfg, params), batch))
        serial = [float(vggt_loss(cfg, params, jax.tree.map(
            lambda a, i=i: a[i], batch))) for i in range(8)]
        np.testing.assert_allclose(loss_pp, np.mean(serial),
                                   rtol=1e-5, atol=1e-6)

    def test_four_stage_pipeline(self, setup, cpu_devices):
        """pp=4 (one depth pair per stage), dp=2, M=2 microbatches."""
        from vggt_slam_tpu.parallel.mesh import make_pp_mesh
        from vggt_slam_tpu.parallel.pp import pp_vggt_loss, to_pp_params
        from vggt_slam_tpu.parallel.train import vggt_loss
        cfg, params = setup
        mesh = make_pp_mesh(cpu_devices, pp=4)
        batch = self._batch(cfg, B=4, S=2, hw=(56, 70), seed=5)
        loss_pp = float(jax.jit(
            lambda p, b: pp_vggt_loss(cfg, p, b, mesh))(
                to_pp_params(cfg, params), batch))
        serial = [float(vggt_loss(cfg, params, jax.tree.map(
            lambda a, i=i: a[i], batch))) for i in range(4)]
        np.testing.assert_allclose(loss_pp, np.mean(serial),
                                   rtol=1e-5, atol=1e-6)

    def test_captures_only_head_depths(self, setup, cpu_devices):
        """The pipelined trunk captures exactly the depths the heads
        consume (cfg.dpt_layers + final), NOT one activation per depth."""
        from vggt_slam_tpu.parallel.mesh import make_pp_mesh
        from vggt_slam_tpu.parallel.pp import (pp_forward_captures,
                                               to_pp_params)
        cfg, params = setup
        mesh = make_pp_mesh(cpu_devices, pp=4)  # 1 depth/stage: slot masks
        batch = self._batch(cfg, B=4, S=2, hw=(56, 70), seed=5)
        caps, depths = pp_forward_captures(
            cfg, to_pp_params(cfg, params), batch["images"], mesh)
        want = sorted(set(cfg.dpt_layers) | {cfg.agg_depth - 1})
        assert depths == want
        assert caps.shape[1] == len(want) < cfg.agg_depth

    def test_pp_roundtrip(self, setup):
        """to_pp_params/from_pp_params restore the standard tree exactly."""
        from vggt_slam_tpu.parallel.pp import from_pp_params, to_pp_params
        cfg, params = setup
        back = from_pp_params(cfg, to_pp_params(cfg, params))
        assert (jax.tree.structure(back) == jax.tree.structure(params))
        for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_grads_match_serial(self, setup, cpu_devices):
        """Backward through scan + ppermute + masked writes is exact:
        grads of the pipelined loss == grads of the serial mean loss."""
        from vggt_slam_tpu.parallel.mesh import make_pp_mesh
        from vggt_slam_tpu.parallel.pp import (from_pp_params, pp_vggt_loss,
                                               to_pp_params)
        from vggt_slam_tpu.parallel.train import vggt_loss
        cfg, params = setup
        mesh = make_pp_mesh(cpu_devices, pp=2)
        batch = self._batch(cfg, B=4, S=2, hw=(56, 70), seed=7)
        g_pp = from_pp_params(cfg, jax.jit(jax.grad(
            lambda p: pp_vggt_loss(cfg, p, batch, mesh)))(
                to_pp_params(cfg, params)))

        def serial_loss(p):
            losses = [vggt_loss(cfg, p, jax.tree.map(
                lambda a, i=i: a[i], batch)) for i in range(4)]
            return jnp.mean(jnp.stack(losses))

        g_ref = jax.jit(jax.grad(serial_loss))(params)
        agg = params["params"]["aggregator"]
        for path in (("aggregator", "frame_block_0", "attn", "qkv", "kernel"),
                     ("aggregator", "global_block_3", "mlp", "fc2", "kernel"),
                     ("aggregator", "patch_embed", "cls_token"),
                     ("camera_head",), ("depth_head",)):
            a, b = g_pp["params"], g_ref["params"]
            for k in path:
                if k not in a:
                    break
                a, b = a[k], b[k]
            for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
                np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                           rtol=5e-4, atol=1e-6)

    def test_train_step_runs(self, setup, cpu_devices):
        from jax.sharding import NamedSharding
        from vggt_slam_tpu.parallel.mesh import make_pp_mesh
        from vggt_slam_tpu.parallel.pp import make_pp_train_step
        cfg, params = setup
        mesh = make_pp_mesh(cpu_devices, pp=2)
        step, pp_params, opt_state = make_pp_train_step(cfg, mesh, params)
        # The block stacks (and their AdamW moments) live pp-sharded from
        # the start - no replicated->pp reshard inside the step.
        fstack_leaf = jax.tree.leaves(pp_params["stacked"]["frame"])[0]
        assert isinstance(fstack_leaf.sharding, NamedSharding)
        assert fstack_leaf.sharding.spec == jax.sharding.PartitionSpec("pp")
        batch = self._batch(cfg, B=8, S=2, hw=(56, 70))
        pp_params2, opt_state, loss = step(pp_params, opt_state, batch)
        assert np.isfinite(float(loss))
        before = jax.tree.leaves(pp_params)[0]
        after = jax.tree.leaves(pp_params2)[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))


class TestZero1:
    """ZeRO-1 optimizer-state sharding (parallel/train.make_zero1_train_step):
    AdamW moments live dp-sharded as one padded flat vector; the update
    runs on local slices and all-gathers params. Elementwise AdamW on the
    flat vector is exactly tree AdamW, so the trajectory matches the
    replicated step up to collective reduction-order noise in the grads
    (the two jitted programs partition the loss einsums differently)."""

    def test_matches_replicated_step(self, setup, cpu_devices):
        from vggt_slam_tpu.parallel.train import (make_dryrun_batch,
                                                  make_train_step,
                                                  make_zero1_train_step)
        cfg, params = setup
        mesh = make_mesh(cpu_devices)  # dp=4, tp=2
        batch = make_dryrun_batch(cfg, mesh.shape["dp"] * 2, (56, 70))

        step_ref, opt_ref, _ = make_train_step(cfg, mesh, params)
        step_z, opt_z = make_zero1_train_step(cfg, mesh, params)

        p_ref, o_ref = params, opt_ref
        p_z, o_z = params, opt_z
        for _ in range(2):
            p_ref, o_ref, loss_ref = step_ref(p_ref, o_ref, batch)
            p_z, o_z, loss_z = step_z(p_z, o_z, batch)
        np.testing.assert_allclose(float(loss_z), float(loss_ref),
                                   rtol=1e-6)
        # For near-zero-gradient elements adam's m/sqrt(v) is sign-like,
        # so reduction-order grad noise can flip an update's sign and
        # diverge by O(lr)=1e-4 per step; bound by a few lr after 2 steps.
        for a, b in zip(jax.tree.leaves(p_z), jax.tree.leaves(p_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=5e-4)

    def test_moments_are_sharded(self, setup, cpu_devices):
        from vggt_slam_tpu.parallel.train import make_zero1_train_step
        cfg, params = setup
        mesh = make_mesh(cpu_devices)
        _, opt_state = make_zero1_train_step(cfg, mesh, params)
        vec_leaves = [l for l in jax.tree.leaves(opt_state) if l.ndim >= 1]
        assert vec_leaves, "no moment vectors found"
        for l in vec_leaves:
            assert "dp" in str(l.sharding.spec), l.sharding
            # each device holds 1/dp of the vector
            shard_shapes = {s.data.shape for s in l.addressable_shards}
            assert shard_shapes == {(l.shape[0] // mesh.shape["dp"],)}


class TestRemat:
    def test_grads_match_unrematted(self, setup, cpu_devices):
        """cfg.remat wraps every encoder/frame/global block in nn.remat.
        Checkpointing replays the exact same ops in the backward pass, so
        gradients must match the un-rematted program (bit-identical in
        practice; tolerance covers fusion-order noise)."""
        import dataclasses
        from vggt_slam_tpu.parallel.train import make_dryrun_batch, vggt_loss
        cfg, params = setup
        cfg_r = dataclasses.replace(cfg, remat=True)
        batch = make_dryrun_batch(cfg, 2, (56, 70))
        g_plain = jax.jit(jax.grad(lambda p: vggt_loss(cfg, p, batch)))(params)
        g_remat = jax.jit(jax.grad(lambda p: vggt_loss(cfg_r, p, batch)))(params)
        for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


class TestShardedDepthMode:
    def test_point_head_disabled_with_unprojection(self, setup, cpu_devices):
        """The CLI's default --shard configuration: enable_point_head=False
        (output dict has no world_points_cf) + in-jit depth unprojection.
        Guards the out_shardings-from-eval_shape fix - a hardcoded key list
        raises a pytree ValueError here."""
        import dataclasses
        from vggt_slam_tpu.models.vggt.model import make_bucketed_model_fn
        from vggt_slam_tpu.parallel.infer import make_sharded_bucketed_model_fn
        cfg, _ = setup
        cfg = dataclasses.replace(cfg, enable_point_head=False)
        params = init_params(cfg, jax.random.PRNGKey(0), 1, (56, 70))
        mesh = make_mesh(cpu_devices)
        model = VGGT(cfg)
        fn_ref = make_bucketed_model_fn(model, params, bucket_size=4,
                                        with_unprojection=True)
        fn_sh = make_sharded_bucketed_model_fn(model, params, bucket_size=4,
                                               mesh=mesh,
                                               with_unprojection=True)
        imgs = np.random.default_rng(3).uniform(
            size=(3, 3, 56, 70)).astype(np.float32)
        a = fn_ref(imgs)
        b = fn_sh(imgs)
        assert "world_points" not in b  # point head off
        for k in ("pose_enc", "depth", "extrinsic", "intrinsic",
                  "unproj_points"):
            assert k in b, k
            np.testing.assert_allclose(b[k], a[k], rtol=2e-2, atol=2e-3,
                                       err_msg=k)


class TestShardedTraining:
    def test_loss_decreases(self, setup, cpu_devices):
        cfg, params = setup
        mesh = make_mesh(cpu_devices)
        step, opt_state, _ = make_train_step(cfg, mesh, params)
        batch = make_dryrun_batch(cfg, 8, (56, 56))
        losses = []
        for _ in range(3):
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]
