"""Full-scale converter coverage against the released checkpoints' manifests.

The per-module parity tests (test_model_torch_parity.py) prove the
converters' NAMING and LAYOUT rules on small configs; this file proves
COVERAGE at the flagship configs: a torch mirror of the complete released
module tree (facebook/VGGT-1B; serizba/salad dino_salad) is built on the
META device (no memory), its state-dict key+shape manifest is asserted
against the committed JSON (tests/data/manifest_*.json - the repo's record
of what the real checkpoints contain), and the REAL converters must map
100% of the flax tree with an exactly-known unused set. A naming drift
that would silently zero-fill at real-weight load time (reference main.py:
67-69 is where the reference loads these weights) becomes a named key list
here instead.

Known allowed-unused torch keys (by construction of the released models):
  * aggregator.patch_embed.mask_token / backbone.model.mask_token -
    DINOv2's masked-image-modeling token, never used at inference;
  * aggregator._resnet_mean/_resnet_std - normalization buffers (our
    DinoViT normalizes with the same constants inline);
  * {depth,point}_head.scratch.refinenet4.resConfUnit1.* - torch allocates
    it but the deepest fusion (no skip input) never calls it;
  * track_head.* - the released checkpoint ships a point-tracking head the
    SLAM never invokes (reference solver.py:469-480 consumes pose/depth/
    point only); the mirror omits it, and the converter's design leaves
    unknown keys unused rather than erroring.

Regenerate the committed manifests after an intentional model change with:
    python tests/test_convert_manifest.py --write
"""
import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from test_model_torch_parity import (TBlock, TCameraHead, TDino,  # noqa: E402
                                     TDPTHead, TSALAD)
from vggt_slam_tpu.models.vggt.config import VGGTConfig  # noqa: E402
from vggt_slam_tpu.models.vggt import convert as C  # noqa: E402
from vggt_slam_tpu.models import retrieval as R  # noqa: E402

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


# ---------------------------------------------------------------------------
# Full-model torch mirrors (released module trees)
# ---------------------------------------------------------------------------


class TDinoReg(TDino):
    """DINOv2 with register tokens + mask_token (the vitl14_reg variant
    VGGT uses as its frame encoder)."""

    def __init__(self, dim, depth, heads, patch, img, n_reg):
        super().__init__(dim, depth, heads, patch, img)
        self.register_tokens = tnn.Parameter(torch.zeros(1, n_reg, dim))
        self.mask_token = tnn.Parameter(torch.zeros(1, dim))


class TVGGTFull(tnn.Module):
    """The released facebookresearch/vggt VGGT module tree (sans
    track_head), at any VGGTConfig scale."""

    def __init__(self, cfg: VGGTConfig):
        super().__init__()
        agg = tnn.Module()
        agg.patch_embed = TDinoReg(cfg.enc_dim, cfg.enc_depth, cfg.enc_heads,
                                   cfg.patch_size, cfg.img_size,
                                   cfg.enc_num_registers)
        # (1, 2, slots, C): index 0 = frame 0's params, 1 = other frames'.
        agg.camera_token = tnn.Parameter(torch.zeros(1, 2, 1, cfg.agg_dim))
        agg.register_token = tnn.Parameter(
            torch.zeros(1, 2, cfg.num_register_tokens, cfg.agg_dim))
        agg.frame_blocks = tnn.ModuleList(
            [TBlock(cfg.agg_dim, cfg.agg_heads, cfg.agg_mlp_ratio,
                    ls=cfg.agg_layerscale, qk_norm=True, rope=True)
             for _ in range(cfg.agg_depth)])
        agg.global_blocks = tnn.ModuleList(
            [TBlock(cfg.agg_dim, cfg.agg_heads, cfg.agg_mlp_ratio,
                    ls=cfg.agg_layerscale, qk_norm=True, rope=True)
             for _ in range(cfg.agg_depth)])
        agg.register_buffer("_resnet_mean",
                            torch.zeros(1, 1, 3, 1, 1))
        agg.register_buffer("_resnet_std",
                            torch.zeros(1, 1, 3, 1, 1))
        self.aggregator = agg
        self.camera_head = TCameraHead(2 * cfg.agg_dim, cfg.agg_heads,
                                       cfg.cam_trunk_depth,
                                       cfg.cam_iterations)
        self.depth_head = TDPTHead(2 * cfg.agg_dim, cfg.dpt_out_channels,
                                   cfg.dpt_features, 2)
        self.point_head = TDPTHead(2 * cfg.agg_dim, cfg.dpt_out_channels,
                                   cfg.dpt_features, 4)


class TSALADFull(TSALAD):
    """TSALAD + the backbone's mask_token (present in dino_salad.ckpt)."""

    def __init__(self, scfg):
        super().__init__(scfg)
        self.backbone.model.mask_token = tnn.Parameter(
            torch.zeros(1, scfg.backbone_dim))


def vggt_manifest(cfg: VGGTConfig | None = None) -> dict:
    cfg = cfg or VGGTConfig.vggt_1b()
    with torch.device("meta"):
        m = TVGGTFull(cfg)
    return {k: list(v.shape) for k, v in m.state_dict().items()}


def salad_manifest(scfg=None) -> dict:
    scfg = scfg or R.SALADConfig()
    with torch.device("meta"):
        m = TSALADFull(scfg)
    return {k: list(v.shape) for k, v in m.state_dict().items()}


# One source of truth with the converter + 1B load rehearsal.
from vggt_slam_tpu.models.vggt.convert import \
    allowed_unused_vggt as _allowed_unused_vggt  # noqa: E402


def _allowed_unused_salad(key: str) -> bool:
    return key == "backbone.model.mask_token"


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


class TestCommittedManifests:
    def test_vggt_manifest_matches(self):
        with open(os.path.join(DATA_DIR, "manifest_vggt_1b.json")) as f:
            committed = json.load(f)
        assert vggt_manifest() == committed

    def test_salad_manifest_matches(self):
        with open(os.path.join(DATA_DIR, "manifest_salad.json")) as f:
            committed = json.load(f)
        assert salad_manifest() == committed

    def test_vggt_1b_size(self):
        """The mirror's parameter count lands in the advertised ~1.2B
        range once the encoder/aggregator/heads are all present."""
        n = sum(int(np.prod(s)) for s in vggt_manifest().values())
        assert 1.0e9 < n < 1.4e9, n


@pytest.mark.slow
class TestFullScaleConverterCoverage:
    """Run the REAL converters over full-size zero weights: 100% of the
    flax tree must fill, and the unused torch set must be exactly the
    known-dead keys."""

    def _coverage(self, manifest, template, convert_fn, allowed_unused):
        sd = {k: np.broadcast_to(np.zeros((), np.float32), tuple(s))
              for k, s in manifest.items()}
        _, report = convert_fn(sd, template)
        assert report["unmatched_flax"] == [], \
            f"flax params a real checkpoint would leave at random init: " \
            f"{report['unmatched_flax'][:10]}"
        stray = [k for k in report["unused_torch"] if not allowed_unused(k)]
        assert stray == [], f"checkpoint keys the converter dropped: " \
                            f"{stray[:10]}"

    def test_vggt_1b(self):
        cfg = VGGTConfig.vggt_1b()
        from vggt_slam_tpu.models.vggt.model import VGGT
        model = VGGT(cfg)
        template = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jax.ShapeDtypeStruct((1, 3, cfg.img_size, cfg.img_size),
                                 jnp.float32))
        self._coverage(vggt_manifest(cfg), template,
                       C.convert_torch_state_dict, _allowed_unused_vggt)

    def test_salad(self):
        scfg = R.SALADConfig()
        model = R.SALAD(scfg)
        template = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jax.ShapeDtypeStruct((1, 3, scfg.input_size, scfg.input_size),
                                 jnp.float32))
        self._coverage(salad_manifest(scfg), template,
                       R.convert_torch_state_dict, _allowed_unused_salad)


if __name__ == "__main__":
    import sys

    if "--write" in sys.argv:
        os.makedirs(DATA_DIR, exist_ok=True)
        with open(os.path.join(DATA_DIR, "manifest_vggt_1b.json"), "w") as f:
            json.dump(vggt_manifest(), f, indent=1)
        with open(os.path.join(DATA_DIR, "manifest_salad.json"), "w") as f:
            json.dump(salad_manifest(), f, indent=1)
        print("manifests written to", DATA_DIR)


class TestTorchBf16StateDict:
    def test_bf16_tensor_converts(self):
        """The released VGGT-1B stores bf16; torch refuses .numpy() on
        bf16, so the converter must upcast (found by the r4 1B load
        rehearsal crashing in convert_torch_state_dict)."""
        torch = pytest.importorskip("torch")
        t = torch.randn(4, 8).to(torch.bfloat16)
        tmpl = {"head": {"kernel": jnp.zeros((8, 4), jnp.float32)}}
        params, report = C.convert_torch_state_dict({"head.weight": t}, tmpl)
        assert report["unmatched_flax"] == []
        np.testing.assert_allclose(np.asarray(params["head"]["kernel"]),
                                   t.float().numpy().T)
