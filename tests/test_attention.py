import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vggt_slam_tpu.ops import attention as attn


def make_qkv(rng, B=2, H=4, N=300, D=64, dtype=jnp.float32):
    q = jnp.asarray(rng.normal(size=(B, H, N, D)), dtype=dtype)
    k = jnp.asarray(rng.normal(size=(B, H, N, D)), dtype=dtype)
    v = jnp.asarray(rng.normal(size=(B, H, N, D)), dtype=dtype)
    return q, k, v


class TestAgreement:
    def test_chunked_matches_naive(self):
        rng = np.random.default_rng(0)
        q, k, v = make_qkv(rng)
        out_n = attn.naive_attention(q, k, v)
        out_c = attn.chunked_attention(q, k, v, chunk=128)
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_n), atol=2e-5)

    def test_flash_interpret_matches_naive(self):
        rng = np.random.default_rng(1)
        q, k, v = make_qkv(rng, B=1, H=2, N=384, D=64)
        out_n = attn.naive_attention(q, k, v)
        out_f = attn.flash_attention(q, k, v, block_q=128, block_k=128,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n), atol=2e-5)

    def test_flash_non_divisible_lengths(self):
        rng = np.random.default_rng(2)
        q, k, v = make_qkv(rng, B=1, H=1, N=300, D=64)
        out_n = attn.naive_attention(q, k, v)
        out_f = attn.flash_attention(q, k, v, block_q=128, block_k=128,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n), atol=2e-5)

    def test_valid_len_masking(self):
        rng = np.random.default_rng(3)
        q, k, v = make_qkv(rng, B=1, H=2, N=256, D=64)
        # Truth: attention restricted to the first 100 keys.
        out_ref = attn.naive_attention(q, k[:, :, :100], v[:, :, :100])
        for impl in ("naive", "chunked"):
            out = attn.attention(q, k, v, impl=impl, valid_len=100)
            np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                                       atol=2e-5, err_msg=impl)
        out_f = attn.flash_attention(q, k, v, valid_len=100, block_q=128,
                                     block_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref), atol=2e-5)

    def test_single_block_path_matches_naive(self):
        # Default block args + short keys trigger the one-shot softmax
        # kernel (no online-softmax accumulators).
        rng = np.random.default_rng(6)
        q, k, v = make_qkv(rng, B=1, H=2, N=300, D=64)
        out_n = attn.naive_attention(q, k, v)
        out_f = attn.flash_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n), atol=2e-5)

    def test_single_block_path_valid_len(self):
        rng = np.random.default_rng(7)
        q, k, v = make_qkv(rng, B=1, H=2, N=300, D=64)
        out_ref = attn.naive_attention(q, k[:, :, :123], v[:, :, :123])
        out_f = attn.flash_attention(q, k, v, valid_len=jnp.int32(123),
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref), atol=2e-5)

    def test_in_kernel_rope_matches_preapplied(self):
        # flash with rope tables == naive on pre-roped q/k, both paths.
        from vggt_slam_tpu.models.vggt.modules import apply_rope, rope_2d_angles
        rng = np.random.default_rng(8)
        for N, bq, bk in ((300, 1024, 2048),      # single-block path
                          (300, 128, 128)):       # multi-block path
            q, k, v = make_qkv(rng, B=1, H=2, N=N, D=64)
            pos = jnp.asarray(rng.uniform(0, 20, size=(N, 2)), jnp.float32)
            cos, sin = rope_2d_angles(pos, 64, base=100.0)
            out_ref = attn.naive_attention(apply_rope(q, cos, sin),
                                           apply_rope(k, cos, sin), v)
            out_f = attn.flash_attention(q, k, v, block_q=bq, block_k=bk,
                                         interpret=True,
                                         rope_q=(cos, sin), rope_k=(cos, sin))
            np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref),
                                       atol=5e-5, err_msg=f"N={N} bq={bq}")

    def test_in_kernel_rope_with_valid_len(self):
        from vggt_slam_tpu.models.vggt.modules import apply_rope, rope_2d_angles
        rng = np.random.default_rng(9)
        q, k, v = make_qkv(rng, B=1, H=2, N=260, D=64)
        pos = jnp.asarray(rng.uniform(0, 20, size=(260, 2)), jnp.float32)
        cos, sin = rope_2d_angles(pos, 64, base=100.0)
        qr, kr = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        out_ref = attn.naive_attention(qr, kr[:, :, :100], v[:, :, :100])
        out_f = attn.flash_attention(q, k, v, valid_len=jnp.int32(100),
                                     interpret=True,
                                     rope_q=(cos, sin), rope_k=(cos, sin))
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref),
                                   atol=5e-5)

    def test_qk_int8_multiblock_matches_naive(self):
        # int8 QK^T (in-kernel quantization, per-(b,h) scales) on the
        # multi-k-block path: full-rank attention, quantization-grade
        # error. NOTE on tolerances: at short N the softmax concentrates,
        # so per-element error is larger than at the production N~34k
        # shape (measured max ~1e-3 there, scripts/bench_int8_inkernel.py);
        # here we bound max error loosely and mean error tightly.
        rng = np.random.default_rng(10)
        q, k, v = make_qkv(rng, B=1, H=3, N=512, D=64)
        out_n = attn.naive_attention(q, k, v)
        out_f = attn.flash_attention(q, k, v, block_q=128, block_k=128,
                                     interpret=True, qk_int8=True)
        err = np.abs(np.asarray(out_f) - np.asarray(out_n))
        assert err.max() < 3e-2, err.max()
        assert err.mean() < 1.5e-3, err.mean()

    def test_qk_int8_with_rope_valid_len_and_bias(self):
        # int8 composed with in-kernel rope + suffix masking + kv bias -
        # the exact configuration of the production global blocks.
        from vggt_slam_tpu.models.vggt.modules import apply_rope, rope_2d_angles
        rng = np.random.default_rng(11)
        q, k, v = make_qkv(rng, B=1, H=2, N=384, D=64)
        pos = jnp.asarray(rng.uniform(0, 20, size=(384, 2)), jnp.float32)
        cos, sin = rope_2d_angles(pos, 64, base=100.0)
        bias = jnp.asarray(rng.uniform(0, 1.5, size=(384,)), jnp.float32)
        qr, kr = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        out_ref = attn.naive_attention(qr, kr[:, :, :300], v[:, :, :300],
                                       kv_bias=bias[:300])
        out_f = attn.flash_attention(q, k, v, valid_len=jnp.int32(300),
                                     block_q=128, block_k=128, interpret=True,
                                     rope_q=(cos, sin), rope_k=(cos, sin),
                                     kv_bias=bias, qk_int8=True)
        err = np.abs(np.asarray(out_f) - np.asarray(out_ref))
        assert err.max() < 3e-2, err.max()
        assert err.mean() < 1.5e-3, err.mean()

    def test_qk_int8_single_block_stays_exact(self):
        # On the one-shot (single k-block) path the flag is inert - the
        # output is bit-compatible with the bf16 kernel's tolerance.
        rng = np.random.default_rng(12)
        q, k, v = make_qkv(rng, B=1, H=2, N=300, D=64)
        out_n = attn.naive_attention(q, k, v)
        out_f = attn.flash_attention(q, k, v, interpret=True, qk_int8=True)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n),
                                   atol=2e-5)

    def test_static_softmax_matches_naive(self):
        # softmax="static" (per-(b,h) Cauchy-Schwarz bound instead of the
        # running max) is an fp exponent shift: multi-block results match
        # the exact softmax to normal fp tolerance.
        rng = np.random.default_rng(20)
        q, k, v = make_qkv(rng, B=1, H=3, N=512, D=64)
        out_n = attn.naive_attention(q, k, v)
        out_f = attn.flash_attention(q, k, v, block_q=128, block_k=128,
                                     interpret=True, softmax="static")
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n),
                                   atol=3e-5)

    def test_static_softmax_with_rope_valid_len_and_bias(self):
        # static max composed with in-kernel rope + suffix masking + kv
        # bias - the exact configuration of the production global blocks.
        from vggt_slam_tpu.models.vggt.modules import apply_rope, rope_2d_angles
        rng = np.random.default_rng(21)
        q, k, v = make_qkv(rng, B=1, H=2, N=384, D=64)
        pos = jnp.asarray(rng.uniform(0, 20, size=(384, 2)), jnp.float32)
        cos, sin = rope_2d_angles(pos, 64, base=100.0)
        bias = jnp.asarray(rng.uniform(0, 1.5, size=(384,)), jnp.float32)
        qr, kr = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        out_ref = attn.naive_attention(qr, kr[:, :, :300], v[:, :, :300],
                                       kv_bias=bias[:300])
        out_f = attn.flash_attention(q, k, v, valid_len=jnp.int32(300),
                                     block_q=128, block_k=128, interpret=True,
                                     rope_q=(cos, sin), rope_k=(cos, sin),
                                     kv_bias=bias, softmax="static")
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref),
                                   atol=5e-5)

    def test_static_softmax_with_int8(self):
        rng = np.random.default_rng(22)
        q, k, v = make_qkv(rng, B=1, H=2, N=512, D=64)
        out_n = attn.naive_attention(q, k, v)
        out_f = attn.flash_attention(q, k, v, block_q=128, block_k=128,
                                     interpret=True, qk_int8=True,
                                     softmax="static")
        err = np.abs(np.asarray(out_f) - np.asarray(out_n))
        assert err.max() < 3e-2, err.max()
        assert err.mean() < 1.5e-3, err.mean()

    def test_static_softmax_qknormed_scaled_rows(self):
        # qk-norm regime with a large learned gain: uniform row norms of
        # ~8x unit - the bound tracks the logit scale and stays exact.
        rng = np.random.default_rng(23)
        q, k, v = make_qkv(rng, B=1, H=2, N=512, D=64)
        qn = 8.0 * q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        kn = 8.0 * k / jnp.linalg.norm(k, axis=-1, keepdims=True)
        out_n = attn.naive_attention(qn, kn, v)
        out_f = attn.flash_attention(qn, kn, v, block_q=128, block_k=128,
                                     interpret=True, softmax="static")
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n),
                                   atol=3e-5)

    def test_static_softmax_single_block_unaffected(self):
        # nk_blocks == 1 routes to the one-shot kernel regardless of the
        # softmax mode; results must be identical to the online request.
        rng = np.random.default_rng(24)
        q, k, v = make_qkv(rng, B=1, H=2, N=200, D=64)
        out_a = attn.flash_attention(q, k, v, interpret=True,
                                     softmax="static")
        out_b = attn.flash_attention(q, k, v, interpret=True)
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))

    def test_bf16_inputs(self):
        rng = np.random.default_rng(4)
        q, k, v = make_qkv(rng, B=1, H=1, N=256, D=64, dtype=jnp.bfloat16)
        out_n = attn.naive_attention(q, k, v).astype(jnp.float32)
        out_f = attn.flash_attention(q, k, v, block_q=128, block_k=128,
                                     interpret=True).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n),
                                   atol=3e-2, rtol=3e-2)


class TestKVBias:
    """Per-key logit bias (proportional attention for merged K/V tokens):
    all impls must agree, in both single-block and online-softmax kernel
    paths, with masking on top."""

    @pytest.mark.parametrize("Nq,Nk,bk", [(300, 300, 1024), (256, 4000, 512)])
    def test_impls_agree_with_bias(self, Nq, Nk, bk):
        rng = np.random.default_rng(11)
        q, k, v = make_qkv(rng, B=1, H=2, N=Nq, D=64)
        k = jnp.asarray(rng.normal(size=(1, 2, Nk, 64)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(1, 2, Nk, 64)), jnp.float32)
        bias = jnp.asarray(rng.uniform(0, 3, size=(Nk,)), jnp.float32)
        vl = jnp.int32(Nk - 13)
        ref = attn.naive_attention(q, k, v, valid_len=vl, kv_bias=bias)
        out_c = attn.chunked_attention(q, k, v, valid_len=vl, kv_bias=bias)
        out_f = attn.flash_attention(q, k, v, valid_len=vl, kv_bias=bias,
                                     block_q=128, block_k=bk, interpret=True)
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref),
                                   atol=2e-5)

    def test_bias_equals_duplicated_keys(self):
        # exp(log 2) bias on a key == that key appearing twice: the
        # mathematical contract behind merged-token proportional attention.
        rng = np.random.default_rng(12)
        q, k, v = make_qkv(rng, B=1, H=1, N=8, D=64)
        k2 = jnp.concatenate([k, k[:, :, :1]], axis=2)
        v2 = jnp.concatenate([v, v[:, :, :1]], axis=2)
        bias = jnp.zeros((8,)).at[0].set(np.log(2.0))
        ref = attn.naive_attention(q, k2, v2)
        out = attn.naive_attention(q, k, v, kv_bias=bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)


class TestGrad:
    def test_chunked_is_differentiable(self):
        rng = np.random.default_rng(5)
        q, k, v = make_qkv(rng, B=1, H=1, N=64, D=32)

        def loss_c(q, k, v):
            return jnp.sum(attn.chunked_attention(q, k, v, chunk=32) ** 2)

        def loss_n(q, k, v):
            return jnp.sum(attn.naive_attention(q, k, v) ** 2)

        gc = jax.grad(loss_c, argnums=(0, 1, 2))(q, k, v)
        gn = jax.grad(loss_n, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gc, gn):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestFlashGrad:
    """flash_attention_grad (custom VJP + Pallas backward kernels, the TPU
    training path) must match XLA autodiff of the naive reference — dq, dk,
    dv — across softmax modes, valid_len masking, and non-divisible N."""

    def _grads(self, loss, q, k, v):
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def _check(self, B, H, N, D, vl=None, softmax="online", seed=0):
        rng = np.random.default_rng(seed)
        q, k, v = make_qkv(rng, B=B, H=H, N=N, D=D)

        def loss_ref(q, k, v):
            kk = k if vl is None else k[:, :, :vl]
            vv = v if vl is None else v[:, :, :vl]
            return jnp.sum(jnp.sin(attn.naive_attention(q, kk, vv)))

        def loss_f(q, k, v):
            o = attn.flash_attention_grad(q, k, v, valid_len=vl,
                                          softmax=softmax, block_q=128,
                                          block_k=128, interpret=True)
            return jnp.sum(jnp.sin(o))

        gr = self._grads(loss_ref, q, k, v)
        gf = self._grads(loss_f, q, k, v)
        for name, a, b in zip("qkv", gr, gf):
            if vl is not None and name in "kv":
                tail = np.asarray(b)[:, :, vl:]
                assert np.abs(tail).max() < 1e-6, name  # masked keys: zero
                a, b = a[:, :, :vl], b[:, :, :vl]
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=3e-5, err_msg=f"d{name}")

    def test_matches_autodiff(self):
        self._check(B=1, H=2, N=300, D=64)

    def test_valid_len_and_static_softmax(self):
        self._check(B=1, H=2, N=256, D=64, vl=200, softmax="static", seed=1)

    def test_dispatch_and_module_integration(self):
        # impl="flash_grad" through the attention() dispatch == chunked
        # autodiff, in the packed (B, N, H*D) layout the Attention module
        # feeds it.
        rng = np.random.default_rng(2)
        B, H, N, D = 1, 2, 192, 64
        q, k, v = make_qkv(rng, B=B, H=H, N=N, D=D)
        packed = [jnp.swapaxes(t, 1, 2).reshape(B, N, H * D)
                  for t in (q, k, v)]

        def loss(impl, q, k, v):
            o = attn.attention(q, k, v, impl=impl, layout="packed",
                               num_heads=H, interpret=True)
            return jnp.sum(jnp.cos(o))

        gc = jax.grad(lambda *a: loss("chunked", *a), argnums=(0, 1, 2))(
            *packed)
        gf = jax.grad(lambda *a: loss("flash_grad", *a), argnums=(0, 1, 2))(
            *packed)
        for a, b in zip(gc, gf):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=3e-5)


class TestNHDLayout:
    """layout="nhd" ((B,N,H,D), the projection-natural layout) must agree
    with the default bhnd path on every kernel variant."""

    def _cmp(self, rng, B, H, Nq, Nk, D, bq, bk, valid_len=None, rope=False):
        q = jnp.asarray(rng.normal(size=(B, H, Nq, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, H, Nk, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, H, Nk, D)), jnp.float32)
        rq = rk = None
        if rope:
            from vggt_slam_tpu.models.vggt.modules import rope_2d_angles
            pos_q = jnp.asarray(rng.uniform(0, 20, size=(Nq, 2)), jnp.float32)
            pos_k = jnp.asarray(rng.uniform(0, 20, size=(Nk, 2)), jnp.float32)
            rq = rope_2d_angles(pos_q, D, 100.0)
            rk = rope_2d_angles(pos_k, D, 100.0)
        ref = attn.flash_attention(q, k, v, valid_len=valid_len, block_q=bq,
                                   block_k=bk, interpret=True,
                                   rope_q=rq, rope_k=rk)
        out = attn.flash_attention(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
            jnp.swapaxes(v, 1, 2), valid_len=valid_len, block_q=bq,
            block_k=bk, interpret=True, rope_q=rq, rope_k=rk, layout="nhd")
        np.testing.assert_allclose(np.asarray(jnp.swapaxes(out, 1, 2)),
                                   np.asarray(ref), atol=2e-5)

    def test_multiblock(self):
        self._cmp(np.random.default_rng(0), 2, 3, 384, 640, 64, 128, 128)

    def test_single_block(self):
        self._cmp(np.random.default_rng(1), 1, 4, 300, 200, 64, 128, 512)

    def test_masked_and_ragged(self):
        self._cmp(np.random.default_rng(2), 1, 2, 250, 500, 64, 128, 128,
                  valid_len=jnp.int32(333))

    def test_rope_multiblock_and_single(self):
        self._cmp(np.random.default_rng(3), 1, 2, 384, 640, 64, 128, 128,
                  rope=True)
        self._cmp(np.random.default_rng(4), 1, 2, 256, 200, 64, 128, 512,
                  rope=True)

    def test_dispatcher_nhd_fallbacks(self):
        rng = np.random.default_rng(5)
        q, k, v = make_qkv(rng, B=1, H=2, N=200, D=32)
        ref = attn.naive_attention(q, k, v)
        for impl in ("naive", "chunked"):
            out = attn.attention(jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                                 jnp.swapaxes(v, 1, 2), impl=impl,
                                 layout="nhd")
            np.testing.assert_allclose(np.asarray(jnp.swapaxes(out, 1, 2)),
                                       np.asarray(ref), atol=2e-5)


class TestPackedLayout:
    """layout="packed" ((B, N, H*D), heads folded into lanes in 128-lane
    groups) must match the bhnd reference in every kernel configuration -
    this is the TPU hot-path layout (ops/attention.py _flash_call)."""

    def _pack(self, t):
        # (B, H, N, D) -> (B, N, H*D)
        B, H, N, D = t.shape
        return jnp.swapaxes(t, 1, 2).reshape(B, N, H * D)

    def _run_both(self, rng, N=300, Nk=None, D=64, H=4, **kw):
        Nk = N if Nk is None else Nk
        q, k, v = make_qkv(rng, B=2, H=H, N=N, D=D)
        k, v = k[:, :, :Nk], v[:, :, :Nk]
        out_b = attn.flash_attention(q, k, v, interpret=True, **kw)
        out_p = attn.flash_attention(self._pack(q), self._pack(k),
                                     self._pack(v), layout="packed",
                                     num_heads=H, interpret=True, **kw)
        np.testing.assert_allclose(np.asarray(out_p),
                                   np.asarray(self._pack(out_b)),
                                   atol=2e-5)

    def test_single_block(self):
        self._run_both(np.random.default_rng(10), N=256, Nk=192)

    def test_multi_block_online(self):
        self._run_both(np.random.default_rng(11), N=520, Nk=520,
                       block_q=128, block_k=128, valid_len=500)

    def test_multi_block_rope_static_bias(self):
        rng = np.random.default_rng(12)
        N, D, H = 520, 64, 4
        cos = jnp.asarray(rng.uniform(size=(N, D // 2)), jnp.float32)
        sin = jnp.asarray(rng.uniform(size=(N, D // 2)), jnp.float32)
        bias = jnp.asarray(rng.uniform(0, 1, (N,)), jnp.float32)
        g = jnp.asarray(rng.uniform(0.5, 1.5, (D,)), jnp.float32)
        b = jnp.asarray(rng.uniform(-0.1, 0.1, (D,)), jnp.float32)
        self._run_both(rng, N=N, Nk=N, block_q=128, block_k=128,
                       rope_q=(cos, sin), rope_k=(cos, sin),
                       kv_bias=bias, softmax="static",
                       qk_ln=(g, b, g, b), qk_ln_eps=1e-5, valid_len=480)

    def test_multi_block_int8(self):
        rng = np.random.default_rng(13)
        N, D = 520, 64
        cos = jnp.asarray(rng.uniform(size=(N, D // 2)), jnp.float32)
        sin = jnp.asarray(rng.uniform(size=(N, D // 2)), jnp.float32)
        self._run_both(rng, N=N, Nk=N, block_q=128, block_k=128,
                       rope_q=(cos, sin), rope_k=(cos, sin), qk_int8=True)

    def test_odd_head_count_falls_back_to_hp1(self):
        # H=3 with D=64: no head-group divides 128 lanes -> hp degrades to
        # 1 and the packed call must still be correct (D-lane tiles).
        self._run_both(np.random.default_rng(14), N=300, H=3)

    def test_hp_must_divide_128(self):
        # H=6, D=32: hp=3 would divide H but store 3x42=126 lanes into the
        # 128-wide m/l scratch; selection must land on hp=2 (divides both
        # H and 128). Multi-k-block path so the scratch is exercised.
        self._run_both(np.random.default_rng(15), N=520, H=6, D=32,
                       block_q=128, block_k=128)

    def _run_both_stats(self, rng, N=300, Nk=None, D=32, H=4, **kw):
        """Packed return_stats ((B, H, Nq) per-head m/l) must match the
        bhnd stats path — this is what lets ring attention keep the
        packed layout on the multi-chip exact path (parallel/ring.py)."""
        Nk = N if Nk is None else Nk
        q, k, v = make_qkv(rng, B=2, H=H, N=N, D=D)
        k, v = k[:, :, :Nk], v[:, :, :Nk]
        ob, mb, lb = attn.flash_attention(q, k, v, interpret=True,
                                          return_stats=True, **kw)
        op, mp, lp = attn.flash_attention(self._pack(q), self._pack(k),
                                          self._pack(v), layout="packed",
                                          num_heads=H, interpret=True,
                                          return_stats=True, **kw)
        np.testing.assert_allclose(np.asarray(op),
                                   np.asarray(self._pack(ob)), atol=2e-5)
        np.testing.assert_allclose(np.asarray(mp), np.asarray(mb),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lb),
                                   rtol=2e-4)

    def test_stats_single_block(self):
        self._run_both_stats(np.random.default_rng(16), N=256, Nk=192,
                             valid_len=150)

    def test_stats_multi_block_online(self):
        self._run_both_stats(np.random.default_rng(17), N=520, Nk=520,
                             block_q=128, block_k=128, valid_len=500)

    def test_stats_multi_block_static(self):
        # Static-max path: per-head bounds must land in the right stats
        # lanes (hp=4 head groups at D=32).
        self._run_both_stats(np.random.default_rng(18), N=520, Nk=520,
                             block_q=128, block_k=128, softmax="static")

    def test_stats_hp1_d64_heads3(self):
        # H=3, D=64 -> hp degrades to 1; stats unpack must still index
        # group/head correctly.
        self._run_both_stats(np.random.default_rng(19), N=520, Nk=520,
                             D=64, H=3, block_q=128, block_k=128)
