"""Full-module torch-golden parity tests (VERDICT r1 next-step #3).

Torch mirror modules are written to the RELEASED implementations' semantics
and state-dict naming (facebookresearch/vggt heads/aggregator blocks,
serizba/salad aggregation; neither torch package is installable here - no
egress), randomly initialized, exported via state_dict(), and run through
the REAL weight converters (models/vggt/convert.py,
models/retrieval.convert_torch_state_dict). Forward agreement then
validates converter naming, layout transposes, the rope-pairing
parameter permutation, and the flax math end to end - the full-model
slice of SURVEY.md section 7's torch<->jax diff harness.

GELU: the mirrors use the tanh approximation so layout checks isolate at
1e-5 (our models use tanh everywhere - a priced deviation from the
released erf GELU, bounded in TestGeluDeviation and ARCHITECTURE.md).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from vggt_slam_tpu.models.vggt.config import VGGTConfig  # noqa: E402
from vggt_slam_tpu.models.vggt import convert as C  # noqa: E402
from vggt_slam_tpu.models.vggt.modules import Block, rope_2d_angles  # noqa: E402

pytestmark = pytest.mark.slow  # torch mirror forwards


def t2n(t):
    return t.detach().cpu().numpy()


def _randomize(module, seed, std=0.3):
    g = torch.Generator().manual_seed(seed)
    for p in module.parameters():
        p.data = torch.randn(p.shape, generator=g) * std
    return module


# ---------------------------------------------------------------------------
# Torch mirrors (released semantics + state-dict names)
# ---------------------------------------------------------------------------

def rope2d_torch(tokens, positions, base=100.0):
    """Released VGGT RotaryPositionEmbedding2D: head dim splits into a
    vertical (y) and horizontal (x) half; croco-style rotate-half within
    each half. tokens (B, H, N, D); positions (B, N, 2) as (y, x)."""
    def rope1d(tok, pos):
        d = tok.shape[-1]
        freqs = 1.0 / (base ** (torch.arange(0, d, 2, dtype=torch.float32) / d))
        ang = pos[..., None].float() * freqs            # (B, N, d/2)
        ang = torch.cat([ang, ang], -1)[:, None]        # (B, 1, N, d)
        t1, t2 = tok.chunk(2, -1)
        rot = torch.cat([-t2, t1], -1)
        return tok * ang.cos() + rot * ang.sin()

    y, x = tokens.chunk(2, -1)
    return torch.cat([rope1d(y, positions[..., 0]),
                      rope1d(x, positions[..., 1])], -1)


class TMlp(tnn.Module):
    def __init__(self, dim, hidden, out=None, approximate="tanh"):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.act = tnn.GELU(approximate=approximate)
        self.fc2 = tnn.Linear(hidden, out if out is not None else dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class TLayerScale(tnn.Module):
    def __init__(self, dim, init):
        super().__init__()
        self.gamma = tnn.Parameter(init * torch.ones(dim))

    def forward(self, x):
        return x * self.gamma


class TAttention(tnn.Module):
    def __init__(self, dim, heads, qk_norm=False, rope=False, eps=1e-5):
        super().__init__()
        self.h, self.rope = heads, rope
        self.qkv = tnn.Linear(dim, 3 * dim)
        hd = dim // heads
        self.q_norm = tnn.LayerNorm(hd, eps=eps) if qk_norm else tnn.Identity()
        self.k_norm = tnn.LayerNorm(hd, eps=eps) if qk_norm else tnn.Identity()
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x, pos=None):
        B, N, Cd = x.shape
        H = self.h
        D = Cd // H
        qkv = self.qkv(x).reshape(B, N, 3, H, D).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        q, k = self.q_norm(q), self.k_norm(k)
        if self.rope and pos is not None:
            q = rope2d_torch(q, pos)
            k = rope2d_torch(k, pos)
        o = F.scaled_dot_product_attention(q, k, v)
        return self.proj(o.transpose(1, 2).reshape(B, N, Cd))


class TBlock(tnn.Module):
    def __init__(self, dim, heads, mlp_ratio=4, ls=None, qk_norm=False,
                 rope=False, eps=1e-5, approximate="tanh"):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=eps)
        self.attn = TAttention(dim, heads, qk_norm, rope, eps)
        self.ls1 = TLayerScale(dim, ls) if ls else tnn.Identity()
        self.norm2 = tnn.LayerNorm(dim, eps=eps)
        self.mlp = TMlp(dim, dim * mlp_ratio, approximate=approximate)
        self.ls2 = TLayerScale(dim, ls) if ls else tnn.Identity()

    def forward(self, x, pos=None):
        x = x + self.ls1(self.attn(self.norm1(x), pos))
        return x + self.ls2(self.mlp(self.norm2(x)))


# ---------------------------------------------------------------------------
# Aggregator block (rope + qk-norm + layerscale)
# ---------------------------------------------------------------------------

def _agg_positions(ns, h, w):
    """Released aggregator positions: specials at (0,0), patches 1-based."""
    yy, xx = torch.meshgrid(torch.arange(1, h + 1), torch.arange(1, w + 1),
                            indexing="ij")
    patch = torch.stack([yy.reshape(-1), xx.reshape(-1)], -1).float()
    return torch.cat([torch.zeros(ns, 2), patch])[None]  # (1, N, 2)


def _flax_rope_tables(pos, head_dim, ns):
    cos, sin = rope_2d_angles(jnp.asarray(t2n(pos[0, ns:])), head_dim, 100.0)
    cos = jnp.concatenate([jnp.ones((ns, cos.shape[1]), jnp.float32), cos])
    sin = jnp.concatenate([jnp.zeros((ns, sin.shape[1]), jnp.float32), sin])
    return cos, sin


class TestAggregatorBlockParity:
    def _run(self, kind):
        dim, heads, ns, h, w = 32, 2, 2, 3, 4   # head_dim 16, rope quarters 4
        N = ns + h * w
        tb = _randomize(TBlock(dim, heads, 4, ls=0.01, qk_norm=True,
                               rope=True), seed=11)
        pos = _agg_positions(ns, h, w)
        x = torch.randn(1, N, dim, generator=torch.Generator().manual_seed(1))
        ref = t2n(tb(x, pos))

        blk = Block(dim, heads, 4, layerscale=0.01, qk_norm=True)
        cos, sin = _flax_rope_tables(pos, dim // heads, ns)
        xj = jnp.asarray(t2n(x))
        var = blk.init(jax.random.PRNGKey(0), xj, cos, sin)
        # Nest as the aggregator's block so the real name mapping (incl. the
        # rope-pairing q/k permutation) applies.
        tpl = {"params": {"aggregator": {f"{kind}_block_0": var["params"]}}}
        sd = {f"aggregator.{kind}_blocks.0.{k}": t2n(v)
              for k, v in tb.state_dict().items()}
        out, report = C.convert_torch_state_dict(sd, tpl)
        assert report["unmatched_flax"] == []
        assert report["unused_torch"] == []
        got = blk.apply(
            {"params": out["params"]["aggregator"][f"{kind}_block_0"]},
            xj, cos, sin)
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)

    def test_frame_block(self):
        self._run("frame")

    def test_global_block(self):
        self._run("global")

    def test_unroped_block_needs_no_permutation(self):
        """Camera-trunk-style block (no rope, no qk_norm): converter must
        NOT permute its q/k weights."""
        dim, heads, N = 32, 2, 5
        tb = _randomize(TBlock(dim, heads, 4, ls=0.01), seed=3)
        x = torch.randn(1, N, dim, generator=torch.Generator().manual_seed(2))
        ref = t2n(tb(x))
        blk = Block(dim, heads, 4, layerscale=0.01)
        xj = jnp.asarray(t2n(x))
        var = blk.init(jax.random.PRNGKey(0), xj)
        tpl = {"params": {"camera_head": {"trunk_0": var["params"]}}}
        sd = {f"camera_head.trunk.0.{k}": t2n(v)
              for k, v in tb.state_dict().items()}
        out, report = C.convert_torch_state_dict(sd, tpl)
        assert report["unmatched_flax"] == []
        got = blk.apply({"params": out["params"]["camera_head"]["trunk_0"]}, xj)
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


class TestGeluDeviation:
    def test_erf_vs_tanh_block_bounded(self):
        """Our models use tanh GELU where the released use erf: bound the
        full-block deviation (priced in ARCHITECTURE.md)."""
        dim, heads, N = 32, 2, 14
        g = torch.Generator().manual_seed(5)
        tb_t = TBlock(dim, heads, 4, ls=0.01, approximate="tanh")
        _randomize(tb_t, seed=7)
        tb_e = TBlock(dim, heads, 4, ls=0.01, approximate="none")
        tb_e.load_state_dict(tb_t.state_dict())
        x = torch.randn(1, N, dim, generator=g)
        d = (tb_t(x) - tb_e(x)).abs().max().item()
        assert d < 2e-3, d


# ---------------------------------------------------------------------------
# Camera head (AdaLN iteration)
# ---------------------------------------------------------------------------

class TCameraHead(tnn.Module):
    """Released vggt/heads/camera_head.py trunk_fn semantics."""

    def __init__(self, dim, heads, trunk_depth, iters):
        super().__init__()
        self.trunk = tnn.Sequential(
            *[TBlock(dim, heads, 4, ls=0.01) for _ in range(trunk_depth)])
        self.token_norm = tnn.LayerNorm(dim)
        self.trunk_norm = tnn.LayerNorm(dim)
        self.empty_pose_tokens = tnn.Parameter(torch.zeros(1, 1, 9))
        self.embed_pose = tnn.Linear(9, dim)
        self.poseLN_modulation = tnn.Sequential(tnn.SiLU(),
                                                tnn.Linear(dim, 3 * dim))
        self.adaln_norm = tnn.LayerNorm(dim, elementwise_affine=False,
                                        eps=1e-6)
        self.pose_branch = TMlp(dim, dim // 2, 9)
        self.iters = iters

    def forward(self, tokens_last):                    # (S, N, dim)
        pt = self.token_norm(tokens_last[:, 0])[None]  # (1, S, dim)
        pred = None
        for _ in range(self.iters):
            inp = (self.empty_pose_tokens.expand(1, pt.shape[1], 9)
                   if pred is None else pred.detach())
            mod = self.poseLN_modulation(self.embed_pose(inp))
            shift, scale, gate = mod.chunk(3, -1)
            h = gate * (self.adaln_norm(pt) * (1 + scale) + shift) + pt
            h = self.trunk(h)
            delta = self.pose_branch(self.trunk_norm(h))
            pred = delta if pred is None else pred + delta
        return pred[0]


class TestCameraHeadParity:
    def test_full_head(self):
        from vggt_slam_tpu.models.vggt.heads import CameraHead
        cfg = VGGTConfig.tiny(agg_dim=16, agg_heads=2, cam_trunk_depth=2,
                              cam_iterations=3)
        dim, S, N = 2 * cfg.agg_dim, 3, 6
        th = _randomize(TCameraHead(dim, cfg.agg_heads, cfg.cam_trunk_depth,
                                    cfg.cam_iterations), seed=21, std=0.2)
        tokens = torch.randn(S, N, dim,
                             generator=torch.Generator().manual_seed(4))
        ref = t2n(th(tokens))

        head = CameraHead(cfg)
        tj = jnp.asarray(t2n(tokens))
        var = head.init(jax.random.PRNGKey(0), tj)
        tpl = {"params": {"camera_head": var["params"]}}
        sd = {f"camera_head.{k}": t2n(v) for k, v in th.state_dict().items()}
        out, report = C.convert_torch_state_dict(sd, tpl)
        assert report["unmatched_flax"] == []
        assert report["unused_torch"] == []
        got = head.apply({"params": out["params"]["camera_head"]}, tj)
        assert got.shape == (S, 9)
        np.testing.assert_allclose(np.asarray(got), ref, atol=5e-5)


# ---------------------------------------------------------------------------
# DPT head (full: norm, projects, resize, scratch fusion, output convs)
# ---------------------------------------------------------------------------

def uv_pos_embed_torch(w, h, aspect, dim):
    """Released create_uv_grid + position_grid_to_embed (omega_0=100)."""
    diag = (aspect * aspect + 1.0) ** 0.5
    span_x, span_y = aspect / diag, 1.0 / diag
    xs = torch.linspace(-span_x * (w - 1) / w, span_x * (w - 1) / w, w)
    ys = torch.linspace(-span_y * (h - 1) / h, span_y * (h - 1) / h, h)
    uu = xs[None, :].expand(h, w)
    vv = ys[:, None].expand(h, w)

    def sincos(d, pos):
        omega = 1.0 / (100.0 ** (torch.arange(d // 2, dtype=torch.float32)
                                 / (d / 2.0)))
        out = pos.reshape(-1)[:, None] * omega[None]
        return torch.cat([out.sin(), out.cos()], -1)

    emb = torch.cat([sincos(dim // 2, uu), sincos(dim // 2, vv)], -1)
    return emb.reshape(h, w, dim).permute(2, 0, 1)  # (dim, h, w)


class TResConvUnit(tnn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv1 = tnn.Conv2d(f, f, 3, padding=1)
        self.conv2 = tnn.Conv2d(f, f, 3, padding=1)

    def forward(self, x):
        out = self.conv2(F.relu(self.conv1(F.relu(x))))
        return out + x


class TFusion(tnn.Module):
    def __init__(self, f):
        super().__init__()
        self.resConfUnit1 = TResConvUnit(f)
        self.resConfUnit2 = TResConvUnit(f)
        self.out_conv = tnn.Conv2d(f, f, 1)

    def forward(self, x0, skip=None, size=None):
        if skip is not None:
            x0 = x0 + self.resConfUnit1(skip)
        x0 = self.resConfUnit2(x0)
        if size is None:
            size = (2 * x0.shape[-2], 2 * x0.shape[-1])
        x0 = F.interpolate(x0, size=size, mode="bilinear", align_corners=True)
        return self.out_conv(x0)


class TDPTHead(tnn.Module):
    def __init__(self, in_dim, out_ch, feats, out_channels):
        super().__init__()
        self.norm = tnn.LayerNorm(in_dim)
        self.projects = tnn.ModuleList(
            [tnn.Conv2d(in_dim, oc, 1) for oc in out_ch])
        self.resize_layers = tnn.ModuleList([
            tnn.ConvTranspose2d(out_ch[0], out_ch[0], 4, 4),
            tnn.ConvTranspose2d(out_ch[1], out_ch[1], 2, 2),
            tnn.Identity(),
            tnn.Conv2d(out_ch[3], out_ch[3], 3, 2, 1)])
        scratch = tnn.Module()
        for i, oc in enumerate(out_ch):
            setattr(scratch, f"layer{i + 1}_rn",
                    tnn.Conv2d(oc, feats, 3, padding=1, bias=False))
        for i in range(4):
            setattr(scratch, f"refinenet{i + 1}", TFusion(feats))
        scratch.output_conv1 = tnn.Conv2d(feats, feats // 2, 3, padding=1)
        scratch.output_conv2 = tnn.Sequential(
            tnn.Conv2d(feats // 2, 32, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(32, out_channels, 1))
        self.scratch = scratch

    def forward(self, tokens_list, image_hw, grid_hw):
        H, W = image_hw
        h, w = grid_hw
        feats = []
        for i, t in enumerate(tokens_list):     # (S, P, C)
            S = t.shape[0]
            x = self.norm(t)
            x = x.permute(0, 2, 1).reshape(S, -1, h, w)
            x = self.projects[i](x)
            x = x + 0.1 * uv_pos_embed_torch(x.shape[-1], x.shape[-2],
                                             W / H, x.shape[1])[None]
            x = self.resize_layers[i](x)
            feats.append(getattr(self.scratch, f"layer{i + 1}_rn")(x))
        l1, l2, l3, l4 = feats
        p4 = self.scratch.refinenet4(l4, size=l3.shape[2:])
        p3 = self.scratch.refinenet3(p4, l3, size=l2.shape[2:])
        p2 = self.scratch.refinenet2(p3, l2, size=l1.shape[2:])
        p1 = self.scratch.refinenet1(p2, l1)
        out = self.scratch.output_conv1(p1)
        out = F.interpolate(out, (H, W), mode="bilinear", align_corners=True)
        out = out + 0.1 * uv_pos_embed_torch(W, H, W / H, out.shape[1])[None]
        return self.scratch.output_conv2(out)


class TestDPTHeadParity:
    def test_full_head(self):
        from vggt_slam_tpu.models.vggt.heads import DPTHead
        cfg = VGGTConfig.tiny(agg_dim=16, agg_depth=4, dpt_layers=(0, 1, 2, 3),
                              dpt_features=16, dpt_out_channels=(8, 8, 16, 16))
        in_dim, S = 2 * cfg.agg_dim, 2
        H, W = 56, 70
        h, w = cfg.patch_grid(H, W)
        ns = cfg.tokens_per_frame_special
        th = _randomize(TDPTHead(in_dim, cfg.dpt_out_channels,
                                 cfg.dpt_features, 2), seed=31, std=0.2)
        g = torch.Generator().manual_seed(6)
        toks = [torch.randn(S, ns + h * w, in_dim, generator=g)
                for _ in cfg.dpt_layers]
        ref = t2n(th([t[:, ns:] for t in toks], (H, W), (h, w)))

        head = DPTHead(cfg, out_channels=2)
        captured = {d: jnp.asarray(t2n(toks[i]))
                    for i, d in enumerate(cfg.dpt_layers)}
        captured["patch_start"] = ns
        var = head.init(jax.random.PRNGKey(0), captured, (H, W))
        tpl = {"params": {"depth_head": var["params"]}}
        sd = {f"depth_head.{k}": t2n(v) for k, v in th.state_dict().items()}
        out, report = C.convert_torch_state_dict(sd, tpl)
        assert report["unmatched_flax"] == []
        # torch always allocates refinenet4.resConfUnit1 but the deepest
        # fusion (no skip input) never calls it - dead params in the
        # released checkpoint; our flax module simply doesn't create them.
        assert all("refinenet4.resConfUnit1" in k
                   for k in report["unused_torch"]), report["unused_torch"]
        got = head.apply({"params": out["params"]["depth_head"]}, captured,
                         (H, W))
        # ours is channel-first (C_out, S, H, W); torch is (S, C_out, H, W)
        got = np.moveaxis(np.asarray(got), 0, 1)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-4)


# ---------------------------------------------------------------------------
# SALAD descriptor (DINOv2-B backbone + optimal-transport aggregation)
# ---------------------------------------------------------------------------

class TDino(tnn.Module):
    """Minimal DINOv2 (no registers), dinov2 naming under .model."""

    def __init__(self, dim, depth, heads, patch, img):
        super().__init__()
        g = img // patch
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, patch)
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = tnn.Parameter(torch.zeros(1, 1 + g * g, dim))
        self.blocks = tnn.ModuleList(
            [TBlock(dim, heads, 4, ls=1e-5, eps=1e-6) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):  # x already ImageNet-normalized (B, 3, H, W)
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = x + self.pos_embed[:, 1:]
        cls = (self.cls_token + self.pos_embed[:, :1]).expand(B, -1, -1)
        x = torch.cat([cls, x], 1)
        for b in self.blocks:
            x = b(x)
        x = self.norm(x)
        return x[:, 1:], x[:, 0]


class TSALAD(tnn.Module):
    """serizba/salad: DINOv2 wrapper (.backbone.model) + SALAD aggregator."""

    def __init__(self, scfg):
        super().__init__()
        self.backbone = tnn.Module()
        self.backbone.model = TDino(scfg.backbone_dim, scfg.backbone_depth,
                                    scfg.backbone_heads, scfg.patch_size,
                                    scfg.input_size)
        agg = tnn.Module()
        agg.token_features = tnn.Sequential(
            tnn.Linear(scfg.backbone_dim, scfg.hidden_dim), tnn.ReLU(),
            tnn.Linear(scfg.hidden_dim, scfg.token_dim))
        agg.cluster_features = tnn.Sequential(
            tnn.Conv2d(scfg.backbone_dim, scfg.hidden_dim, 1), tnn.ReLU(),
            tnn.Conv2d(scfg.hidden_dim, scfg.cluster_dim, 1))
        agg.score = tnn.Sequential(
            tnn.Conv2d(scfg.backbone_dim, scfg.hidden_dim, 1), tnn.ReLU(),
            tnn.Conv2d(scfg.hidden_dim, scfg.num_clusters, 1))
        agg.dust_bin = tnn.Parameter(torch.tensor(1.0))
        self.aggregator = agg
        self.scfg = scfg

    @staticmethod
    def _log_otp(log_a, log_b, M, iters):
        u, v = torch.zeros_like(log_a), torch.zeros_like(log_b)
        for _ in range(iters):
            u = log_a - torch.logsumexp(M + v.unsqueeze(1), dim=2)
            v = log_b - torch.logsumexp(M + u.unsqueeze(2), dim=1)
        return M + u.unsqueeze(2) + v.unsqueeze(1)

    def forward(self, x):  # normalized images (B, 3, H, W)
        import math
        scfg = self.scfg
        gh = gw = scfg.input_size // scfg.patch_size
        f, t = self.backbone.model(x)
        B, n, dim = f.shape
        fmap = f.transpose(1, 2).reshape(B, dim, gh, gw)
        feat = self.aggregator.cluster_features(fmap).flatten(2)  # (B,Cd,n)
        p = self.aggregator.score(fmap).flatten(2)                # (B,K,n)
        t = self.aggregator.token_features(t)
        K = scfg.num_clusters
        S_aug = torch.cat(
            [p, self.aggregator.dust_bin.expand(B, 1, n)], dim=1)
        norm = -math.log(n)
        log_a = torch.full((K + 1,), norm)
        log_a[-1] += math.log(max(n - K, 1))
        log_b = torch.full((n,), norm)
        log_P = self._log_otp(log_a.expand(B, -1), log_b.expand(B, -1),
                              S_aug, scfg.sinkhorn_iters)
        p = torch.exp(log_P - norm)[:, :-1]                       # (B,K,n)
        agg = torch.einsum("bkn,bcn->bck", p, feat)               # (B,Cd,K)
        agg = F.normalize(agg, p=2, dim=1)
        out = torch.cat([F.normalize(t, p=2, dim=-1), agg.flatten(1)], -1)
        return F.normalize(out, p=2, dim=-1)


class TestSALADParity:
    def test_full_descriptor(self):
        from vggt_slam_tpu.models import retrieval as R
        scfg = R.SALADConfig.tiny()
        tm = TSALAD(scfg)
        _randomize(tm, seed=41, std=0.2)
        with torch.no_grad():
            tm.aggregator.dust_bin.copy_(torch.tensor(0.7))
        g = torch.Generator().manual_seed(8)
        imgs = torch.rand(2, 3, scfg.input_size, scfg.input_size, generator=g)
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        with torch.no_grad():
            ref = t2n(tm((imgs - mean) / std))

        model = R.SALAD(scfg)
        xj = jnp.asarray(t2n(imgs))  # raw [0,1]; flax normalizes internally
        tpl = model.init(jax.random.PRNGKey(0), xj)
        sd = {k: t2n(v) for k, v in tm.state_dict().items()}
        out, report = R.convert_torch_state_dict(sd, tpl)
        assert report["unmatched_flax"] == []
        assert report["unused_torch"] == []
        got = np.asarray(model.apply(out, xj))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-5)
        # L2-normalized output
        np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0,
                                   atol=1e-5)
