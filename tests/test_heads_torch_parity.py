"""Torch-golden parity tests for the DPT head's building blocks.

The released VGGT DPT head (Depth-Anything lineage) uses torch ops whose
JAX counterparts have layout/convention traps: ConvTranspose2d weight
layout, Conv2d padding positions under stride 2, and align_corners=True
interpolation. CPU torch is available here, so each op is checked
numerically against its torch reference with converter-layout weights -
this is the in-repo slice of the per-layer torch<->jax diff harness
SURVEY.md section 7 calls for (full-model diffs need the released
checkpoint, which cannot be fetched in this environment).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from vggt_slam_tpu.models.vggt.heads import (_ConvTransposeUp,  # noqa: E402
                                             resize_bilinear_align_corners)
import flax.linen as nn  # noqa: E402


def t2n(t):
    return t.detach().cpu().numpy()


class TestConvTransposeUp:
    @pytest.mark.parametrize("k", [2, 4])
    def test_matches_torch_conv_transpose2d(self, k):
        rng = np.random.default_rng(0)
        ci, co = 3, 5
        x = rng.normal(size=(2, 4, 6, ci)).astype(np.float32)
        w_torch = rng.normal(size=(ci, co, k, k)).astype(np.float32)
        b = rng.normal(size=(co,)).astype(np.float32)

        ref = F.conv_transpose2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(w_torch), torch.from_numpy(b), stride=k)
        ref = t2n(ref).transpose(0, 2, 3, 1)

        mod = _ConvTransposeUp(co, k, jnp.float32)
        params = {"params": {"kernel": jnp.asarray(w_torch.transpose(2, 3, 0, 1)),
                             "bias": jnp.asarray(b)}}
        out = np.asarray(mod.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestStridedConvResize:
    def test_matches_torch_conv2d_k3_s2_p1(self):
        # resize_layers.3 spec: Conv2d(kernel 3, stride 2, padding 1).
        rng = np.random.default_rng(1)
        ci, co = 4, 6
        for h, w in [(8, 10), (7, 9)]:
            x = rng.normal(size=(1, h, w, ci)).astype(np.float32)
            w_torch = rng.normal(size=(co, ci, 3, 3)).astype(np.float32)
            b = rng.normal(size=(co,)).astype(np.float32)
            ref = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                           torch.from_numpy(w_torch), torch.from_numpy(b),
                           stride=2, padding=1)
            ref = t2n(ref).transpose(0, 2, 3, 1)

            mod = nn.Conv(co, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
            params = {"params": {
                "kernel": jnp.asarray(w_torch.transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(b)}}
            out = np.asarray(mod.apply(params, jnp.asarray(x)))
            assert out.shape == ref.shape
            np.testing.assert_allclose(out, ref, atol=1e-5)


class TestSameConv:
    def test_3x3_same_matches_torch_p1(self):
        rng = np.random.default_rng(2)
        ci = co = 4
        x = rng.normal(size=(1, 6, 7, ci)).astype(np.float32)
        w_torch = rng.normal(size=(co, ci, 3, 3)).astype(np.float32)
        ref = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                       torch.from_numpy(w_torch), None, padding=1)
        ref = t2n(ref).transpose(0, 2, 3, 1)
        mod = nn.Conv(co, (3, 3), padding="SAME", use_bias=False)
        params = {"params": {"kernel": jnp.asarray(w_torch.transpose(2, 3, 1, 0))}}
        out = np.asarray(mod.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestUVPosEmbed:
    def test_structure(self):
        # Aspect-corrected grid: unit diagonal split into spans; sin block
        # then cos block per axis, u-embedding first.
        from vggt_slam_tpu.models.vggt.heads import uv_pos_embed, _uv_grid
        h, w, dim = 28, 37, 64
        grid = np.asarray(_uv_grid(w, h, w / h))
        span = np.hypot(grid[..., 0].max(), grid[..., 1].max())
        assert span < 1.0  # inside the unit-diagonal rectangle
        # aspect preserved up to the (n-1)/n endpoint scaling
        ar = (grid[..., 0].max() / ((w - 1) / w)) / \
            (grid[..., 1].max() / ((h - 1) / h))
        np.testing.assert_allclose(ar, w / h, rtol=1e-6)
        emb = np.asarray(uv_pos_embed(w, h, w / h, dim))
        assert emb.shape == (h, w, dim)
        # u-half varies along w only; v-half along h only
        assert np.allclose(emb[:, :, : dim // 2], emb[:1, :, : dim // 2])
        assert np.allclose(emb[:, :, dim // 2:], emb[:, :1, dim // 2:])
        # frequency-0 slot of each sin block is sin(pos) (monotone, small)
        assert np.abs(emb).max() <= 1.0


class TestAlignCornersResize:
    @pytest.mark.parametrize("in_hw,out_hw", [
        ((4, 6), (8, 12)), ((5, 7), (9, 13)), ((3, 3), (10, 11)),
        ((8, 8), (4, 4)), ((1, 5), (3, 10)),
    ])
    def test_matches_torch_interpolate(self, in_hw, out_hw):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(2,) + in_hw + (3,)).astype(np.float32)
        ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                            size=out_hw, mode="bilinear", align_corners=True)
        ref = t2n(ref).transpose(0, 2, 3, 1)
        out = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), out_hw))
        np.testing.assert_allclose(out, ref, atol=1e-5)
