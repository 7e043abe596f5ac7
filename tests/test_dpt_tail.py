"""Fused DPT tail kernel vs the reference XLA chain."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vggt_slam_tpu.ops import dpt_tail
from vggt_slam_tpu.models.vggt.heads import (_interp_matrix,
                                             resize_bilinear_align_corners)


def xla_tail(x_pre, pos, w0, b0, w1, b1):
    """The un-fused chain: row+col upsample -> +pos -> conv3x3 -> relu ->
    conv1x1. x_pre is BEFORE any upsample: (S, 8h, 8w, cin)."""
    S = x_pre.shape[0]
    H, W = pos.shape[0], pos.shape[1]
    x = resize_bilinear_align_corners(x_pre, (H, W))
    x = x + pos[None]
    x = jax.lax.conv_general_dilated(
        x, w0, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b0
    x = jnp.maximum(x, 0.0)
    x = jax.lax.conv_general_dilated(
        x, w1, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1
    return x  # (S, H, W, cout)


class TestSupported:
    def test_production_geometry(self):
        assert dpt_tail.supported(224, 392)       # patch_h 28
        assert not dpt_tail.supported(208, 364)   # patch_h 26
        assert not dpt_tail.supported(296, 518)   # patch_w used as rows


class TestFusedTailMatchesXLA:
    @pytest.mark.parametrize("cout", [2, 4])
    def test_interpret_matches(self, cout):
        # patch_h=28, patch_w chosen small for test speed: rows 224->392,
        # cols 64->112 (any width is supported; 7*64/4=112).
        rng = np.random.default_rng(0)
        S, h8, w8, cin, cmid = 2, 224, 64, 8, 16
        H, W = 392, 112
        x = jnp.asarray(rng.normal(size=(S, h8, w8, cin)), jnp.float32)
        pos = jnp.asarray(rng.normal(size=(H, W, cin)) * 0.1, jnp.float32)
        w0 = jnp.asarray(rng.normal(size=(3, 3, cin, cmid)) * 0.1, jnp.float32)
        b0 = jnp.asarray(rng.normal(size=(cmid,)), jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(1, 1, cmid, cout)) * 0.3, jnp.float32)
        b1 = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)

        ref = np.asarray(xla_tail(x, pos, w0, b0, w1, b1))

        # the kernel takes x AFTER the column upsample
        Aw = jnp.asarray(_interp_matrix(w8, W), jnp.float32)
        x_cols = jnp.einsum("shwc,Ww->shWc", x, Aw)
        out = dpt_tail.fused_tail(x_cols, pos, w0, b0, w1, b1,
                                  interpret=True)
        out = np.moveaxis(np.asarray(out), 0, -1)  # (S,H,W,cout)
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)
