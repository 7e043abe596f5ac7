"""SAM2-equivalent model: torch-mirror parity + converter coverage + AMG.

Torch mirrors are written to the public facebookresearch/sam2 module
naming and semantics (hieradet.py, prompt_encoder.py, transformer.py,
mask_decoder.py — the package itself is not installable here, no
egress), randomly initialized, exported via state_dict(), and run
through the REAL converter (models/sam2.convert_torch_state_dict).
Forward agreement validates the converter naming, the conv/conv-
transpose layout rules (incl. the spatial kernel flip), window
partition/q-pooling, and the flax math end to end.

Known priced deviation: torch F.interpolate(bicubic) uses the a=-0.75
cubic kernel while jax.image.resize uses a=-0.5, so the Hiera
BACKGROUND pos embed interpolation differs slightly between frameworks;
the strict parity tests zero that one parameter (the window pos embed
tiling is exact and stays random). GELUs are tanh-approximate on both
sides (house policy, see test_model_torch_parity.py).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from vggt_slam_tpu.models.sam2 import (SAM2Config, SAM2ImageModel,  # noqa: E402
                                       convert_torch_state_dict)


def t2n(t):
    return t.detach().cpu().numpy()


def _randomize(module, seed, std=0.2):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k in sd:
        sd[k] = torch.randn(sd[k].shape, generator=g) * std
    module.load_state_dict(sd)
    return module


# ---------------------------------------------------------------------------
# Torch mirrors (public sam2 naming)
# ---------------------------------------------------------------------------


class TMLP(tnn.Module):
    """sam2_utils.MLP: layers.{i}, activation between layers."""

    def __init__(self, inp, hidden, out, n, act="relu", sigmoid=False):
        super().__init__()
        dims = [inp] + [hidden] * (n - 1) + [out]
        self.layers = tnn.ModuleList(
            tnn.Linear(a, b) for a, b in zip(dims[:-1], dims[1:]))
        self.act, self.sigmoid = act, sigmoid

    def forward(self, x):
        for i, l in enumerate(self.layers):
            x = l(x)
            if i < len(self.layers) - 1:
                x = (F.relu(x) if self.act == "relu"
                     else F.gelu(x, approximate="tanh"))
        return torch.sigmoid(x) if self.sigmoid else x


class TLayerNorm2d(tnn.Module):
    def __init__(self, c, eps=1e-6):
        super().__init__()
        self.weight = tnn.Parameter(torch.ones(c))
        self.bias = tnn.Parameter(torch.zeros(c))
        self.eps = eps

    def forward(self, x):  # NCHW
        u = x.mean(1, keepdim=True)
        s = ((x - u) ** 2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


def _t_window_partition(x, ws):
    B, H, W, C = x.shape
    ph, pw = (-H) % ws, (-W) % ws
    if ph or pw:
        x = F.pad(x, (0, 0, 0, pw, 0, ph))
    Hp, Wp = H + ph, W + pw
    x = x.view(B, Hp // ws, ws, Wp // ws, ws, C)
    return (x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C), (Hp, Wp))


def _t_window_unpartition(w, ws, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = w.shape[0] // ((Hp // ws) * (Wp // ws))
    x = w.view(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def _t_do_pool(x, stride):  # (B, H, W, C)
    x = x.permute(0, 3, 1, 2)
    x = F.max_pool2d(x, kernel_size=stride, stride=stride)
    return x.permute(0, 2, 3, 1)


class TMSAttention(tnn.Module):
    def __init__(self, dim, dim_out, heads, q_stride=0):
        super().__init__()
        self.qkv = tnn.Linear(dim, dim_out * 3)
        self.proj = tnn.Linear(dim_out, dim_out)
        self.heads, self.dim_out, self.q_stride = heads, dim_out, q_stride

    def forward(self, x):
        B, H, W, _ = x.shape
        nH, Dh = self.heads, self.dim_out // self.heads
        qkv = self.qkv(x).reshape(B, H * W, 3, nH, Dh)
        q, k, v = torch.unbind(qkv, 2)
        if self.q_stride:
            q = _t_do_pool(q.reshape(B, H, W, -1), self.q_stride)
            H, W = q.shape[1:3]
            q = q.reshape(B, H * W, nH, Dh)
        out = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        return self.proj(out.transpose(1, 2).reshape(B, H, W, -1))


class TMSBlock(tnn.Module):
    def __init__(self, dim, dim_out, heads, window_size, q_stride=0,
                 mlp_ratio=4.0):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = TMSAttention(dim, dim_out, heads, q_stride)
        self.norm2 = tnn.LayerNorm(dim_out, eps=1e-6)
        self.mlp = TMLP(dim_out, int(dim_out * mlp_ratio), dim_out, 2,
                        act="gelu")
        if dim != dim_out:
            self.proj = tnn.Linear(dim, dim_out)
        self.dim, self.dim_out = dim, dim_out
        self.window_size, self.q_stride = window_size, q_stride

    def forward(self, x):
        shortcut = x
        x = self.norm1(x)
        if self.dim != self.dim_out:
            h = self.proj(x)
            if self.q_stride:
                h = _t_do_pool(h, self.q_stride)
            shortcut = h
        ws = self.window_size
        H, W = x.shape[1], x.shape[2]
        if ws > 0:
            x, pad_hw = _t_window_partition(x, ws)
        x = self.attn(x)
        if self.q_stride:
            ws = ws // self.q_stride
            H, W = shortcut.shape[1], shortcut.shape[2]
            if ws:
                pad_hw = (H + (-H) % ws, W + (-W) % ws)
        if self.window_size > 0:
            x = _t_window_unpartition(x, ws, pad_hw, (H, W))
        x = shortcut + x
        return x + self.mlp(self.norm2(x))


class THiera(tnn.Module):
    def __init__(self, cfg: SAM2Config):
        super().__init__()
        pe = tnn.Module()
        pe.proj = tnn.Conv2d(3, cfg.embed_dim, cfg.patch_kernel,
                             cfg.patch_stride, cfg.patch_padding)
        self.patch_embed = pe
        bh, bw = cfg.window_pos_embed_bkg_spatial_size
        self.pos_embed = tnn.Parameter(
            torch.zeros(1, cfg.embed_dim, bh, bw))
        w0 = cfg.window_spec[0]
        self.pos_embed_window = tnn.Parameter(
            torch.zeros(1, cfg.embed_dim, w0, w0))
        self.cfg = cfg
        dim, heads = cfg.embed_dim, cfg.num_heads
        stage_ends = set(cfg.stage_ends)
        q_pool = {e + 1 for e in cfg.stage_ends[:-1]}
        cur_stage = 1
        blocks = []
        self._meta = []
        for i in range(cfg.depth):
            ws = cfg.window_spec[cur_stage - 1]
            if i in cfg.global_att_blocks:
                ws = 0
            dim_out = dim
            if i - 1 in stage_ends:
                dim_out = int(dim * cfg.dim_mul)
                heads = int(heads * cfg.head_mul)
                cur_stage += 1
            blocks.append(TMSBlock(dim, dim_out, heads, ws,
                                   cfg.q_stride if i in q_pool else 0,
                                   cfg.mlp_ratio))
            dim = dim_out
        self.blocks = tnn.ModuleList(blocks)

    def forward(self, x):  # NCHW
        cfg = self.cfg
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)  # NHWC
        h, w = x.shape[1], x.shape[2]
        pos = F.interpolate(self.pos_embed, size=(h, w), mode="bicubic")
        win = self.pos_embed_window
        pos = pos + win.tile([x_ // y_ for x_, y_ in
                              zip(pos.shape, win.shape)])
        x = x + pos.permute(0, 2, 3, 1)
        outs = []
        ends = set(cfg.stage_ends)
        for i, b in enumerate(self.blocks):
            x = b(x)
            if i in ends:
                outs.append(x.permute(0, 3, 1, 2))  # NCHW
        return outs


class TFpnNeck(tnn.Module):
    def __init__(self, cfg: SAM2Config):
        super().__init__()
        chans = list(cfg.backbone_channels)[::-1]  # low-res first
        self.convs = tnn.ModuleList()
        for c in chans:
            m = tnn.Sequential()
            m.add_module("conv", tnn.Conv2d(c, cfg.d_model, 1))
            self.convs.append(m)
        self.top_down = {len(chans) - 2, len(chans) - 1}

    def forward(self, xs):  # high-res first, NCHW
        n = len(self.convs) - 1
        outs = [None] * len(xs)
        prev = None
        for i in range(n, -1, -1):
            lat = self.convs[n - i](xs[i])
            if i in self.top_down and prev is not None:
                prev = lat + F.interpolate(prev.float(), scale_factor=2.0,
                                           mode="nearest")
            else:
                prev = lat
            outs[i] = prev
        return outs


class TPromptEncoder(tnn.Module):
    def __init__(self, cfg: SAM2Config):
        super().__init__()
        d = cfg.d_model
        pe = tnn.Module()
        pe.register_buffer("positional_encoding_gaussian_matrix",
                           torch.randn(2, d // 2))
        self.pe_layer = pe
        self.point_embeddings = tnn.ModuleList(
            tnn.Embedding(1, d) for _ in range(4))
        self.not_a_point_embed = tnn.Embedding(1, d)
        self.no_mask_embed = tnn.Embedding(1, d)
        self.mask_downscaling = tnn.Sequential(
            tnn.Conv2d(1, 4, 2, 2), TLayerNorm2d(4), tnn.GELU(),
            tnn.Conv2d(4, 16, 2, 2), TLayerNorm2d(16), tnn.GELU(),
            tnn.Conv2d(16, d, 1))
        self.cfg = cfg

    def _pe(self, coords01):
        c = (2 * coords01 - 1) @ \
            self.pe_layer.positional_encoding_gaussian_matrix
        c = 2 * np.pi * c
        return torch.cat([torch.sin(c), torch.cos(c)], -1)

    def dense_pe(self):
        g = self.cfg.embed_grid
        ar = (torch.arange(g, dtype=torch.float32) + 0.5) / g
        yy, xx = torch.meshgrid(ar, ar, indexing="ij")
        return self._pe(torch.stack([xx, yy], -1))

    def embed_points(self, points, labels):  # pad=True
        P = points.shape[0]
        points = torch.cat([points, torch.zeros(P, 1, 2)], 1) + 0.5
        labels = torch.cat([labels, -torch.ones(P, 1,
                                                dtype=labels.dtype)], 1)
        pe = self._pe(points / self.cfg.img_size)
        pe[labels == -1] = 0.0
        pe[labels == -1] += self.not_a_point_embed.weight[0]
        for li in range(4):
            pe[labels == li] += self.point_embeddings[li].weight[0]
        return pe


class TDecAttention(tnn.Module):
    def __init__(self, dim, heads, downsample=1):
        super().__init__()
        di = dim // downsample
        self.q_proj = tnn.Linear(dim, di)
        self.k_proj = tnn.Linear(dim, di)
        self.v_proj = tnn.Linear(dim, di)
        self.out_proj = tnn.Linear(di, dim)
        self.heads, self.di = heads, di

    def forward(self, q, k, v):
        q, k, v = self.q_proj(q), self.k_proj(k), self.v_proj(v)

        def h(t):
            B, N, _ = t.shape
            return t.reshape(B, N, self.heads, -1).transpose(1, 2)

        out = F.scaled_dot_product_attention(h(q), h(k), h(v))
        B = out.shape[0]
        return self.out_proj(out.transpose(1, 2).reshape(B, -1, self.di))


class TTwoWayBlock(tnn.Module):
    def __init__(self, cfg: SAM2Config, skip_first_pe=False):
        super().__init__()
        d, nh = cfg.d_model, cfg.decoder_heads
        self.self_attn = TDecAttention(d, nh)
        self.norm1 = tnn.LayerNorm(d)
        self.cross_attn_token_to_image = TDecAttention(d, nh, 2)
        self.norm2 = tnn.LayerNorm(d)
        self.mlp = TMLP(d, cfg.decoder_mlp_dim, d, 2)
        self.norm3 = tnn.LayerNorm(d)
        self.cross_attn_image_to_token = TDecAttention(d, nh, 2)
        self.norm4 = tnn.LayerNorm(d)
        self.skip = skip_first_pe

    def forward(self, queries, keys, qpe, kpe):
        if self.skip:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + qpe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        q, k = queries + qpe, keys + kpe
        queries = self.norm2(
            queries + self.cross_attn_token_to_image(q, k, keys))
        queries = self.norm3(queries + self.mlp(queries))
        q, k = queries + qpe, keys + kpe
        keys = self.norm4(keys + self.cross_attn_image_to_token(
            k, q, queries))
        return queries, keys


class TTwoWayTransformer(tnn.Module):
    def __init__(self, cfg: SAM2Config):
        super().__init__()
        self.layers = tnn.ModuleList(
            TTwoWayBlock(cfg, skip_first_pe=(i == 0))
            for i in range(cfg.decoder_depth))
        self.final_attn_token_to_image = TDecAttention(
            cfg.d_model, cfg.decoder_heads, 2)
        self.norm_final_attn = tnn.LayerNorm(cfg.d_model)

    def forward(self, image_embed, image_pe, tokens):
        queries, keys = tokens, image_embed
        for l in self.layers:
            queries, keys = l(queries, keys, tokens, image_pe)
        q, k = queries + tokens, keys + image_pe
        queries = self.norm_final_attn(
            queries + self.final_attn_token_to_image(q, k, keys))
        return queries, keys


class TMaskDecoder(tnn.Module):
    def __init__(self, cfg: SAM2Config):
        super().__init__()
        d, M = cfg.d_model, cfg.num_mask_tokens
        self.transformer = TTwoWayTransformer(cfg)
        self.obj_score_token = tnn.Embedding(1, d)
        self.iou_token = tnn.Embedding(1, d)
        self.mask_tokens = tnn.Embedding(M, d)
        self.output_upscaling = tnn.Sequential(
            tnn.ConvTranspose2d(d, d // 4, 2, 2), TLayerNorm2d(d // 4),
            tnn.GELU(), tnn.ConvTranspose2d(d // 4, d // 8, 2, 2),
            tnn.GELU())
        self.output_hypernetworks_mlps = tnn.ModuleList(
            TMLP(d, d, d // 8, 3) for _ in range(M))
        self.iou_prediction_head = TMLP(d, d, M, 3, sigmoid=True)
        self.pred_obj_score_head = TMLP(d, d, 1, 3)
        self.conv_s0 = tnn.Conv2d(d, d // 8, 1)
        self.conv_s1 = tnn.Conv2d(d, d // 4, 1)
        self.M = M

    def forward(self, image_embed, image_pe, sparse, dense, s0, s1):
        # image_embed/dense NCHW; s0/s1 already conv_s0/s1-projected NCHW
        P = sparse.shape[0]
        out_tok = torch.cat([self.obj_score_token.weight,
                             self.iou_token.weight,
                             self.mask_tokens.weight], 0)
        tokens = torch.cat(
            [out_tok.unsqueeze(0).expand(P, -1, -1), sparse], 1)
        b, c, h, w = image_embed.shape
        src = (image_embed + dense).flatten(2).permute(0, 2, 1)
        pos = image_pe.flatten(2).permute(0, 2, 1).expand(P, -1, -1)
        hs, src = self.transformer(src, pos, tokens)
        iou_out, mask_out = hs[:, 1], hs[:, 2:2 + self.M]
        src = src.transpose(1, 2).view(P, c, h, w)
        dc1, ln, act1, dc2, act2 = self.output_upscaling
        up = act1(ln(dc1(src) + s1))
        up = act2(dc2(up) + s0)
        hyper = torch.stack(
            [self.output_hypernetworks_mlps[i](mask_out[:, i])
             for i in range(self.M)], 1)
        b2, c2, h2, w2 = up.shape
        masks = (hyper @ up.view(b2, c2, h2 * w2)).view(b2, -1, h2, w2)
        return (masks, self.iou_prediction_head(iou_out),
                self.pred_obj_score_head(hs[:, 0]))


class TSAM2Image(tnn.Module):
    """Image-prediction module tree of SAM2Base (public checkpoint
    naming), plus a few video-memory dummies so the converter's
    skip-list is exercised."""

    def __init__(self, cfg: SAM2Config, with_video_dummies=False):
        super().__init__()
        enc = tnn.Module()
        enc.trunk = THiera(cfg)
        enc.neck = TFpnNeck(cfg)
        self.image_encoder = enc
        self.sam_prompt_encoder = TPromptEncoder(cfg)
        self.sam_mask_decoder = TMaskDecoder(cfg)
        self.no_mem_embed = tnn.Parameter(torch.zeros(1, 1, cfg.d_model))
        if with_video_dummies:
            self.no_mem_pos_enc = tnn.Parameter(
                torch.zeros(1, 1, cfg.d_model))
            self.maskmem_tpos_enc = tnn.Parameter(
                torch.zeros(7, 1, 1, cfg.d_model // 4))
            mem = tnn.Module()
            mem.out_proj = tnn.Linear(cfg.d_model, cfg.d_model)
            self.memory_encoder = mem
            self.obj_ptr_proj = tnn.Linear(cfg.d_model, cfg.d_model)
        self.cfg = cfg

    def embed_image(self, x):  # NCHW normalized
        feats = self.image_encoder.neck(self.image_encoder.trunk(x))
        s0, s1, s16 = feats[0], feats[1], feats[2]
        s16 = s16 + self.no_mem_embed[0, 0, :, None, None]
        return {"image_embed": s16,
                "feat_s0": self.sam_mask_decoder.conv_s0(s0),
                "feat_s1": self.sam_mask_decoder.conv_s1(s1)}

    def decode_points(self, feats, points):
        P = points.shape[0]
        labels = torch.ones(P, 1, dtype=torch.long)
        sparse = self.sam_prompt_encoder.embed_points(
            points[:, None, :], labels)
        g = self.cfg.embed_grid
        dense = self.sam_prompt_encoder.no_mask_embed.weight[0].view(
            1, -1, 1, 1).expand(P, -1, g, g)
        pe = self.sam_prompt_encoder.dense_pe().permute(2, 0, 1)[None]
        masks, iou, obj = self.sam_mask_decoder(
            feats["image_embed"].expand(P, -1, -1, -1), pe, sparse, dense,
            feats["feat_s0"].expand(P, -1, -1, -1),
            feats["feat_s1"].expand(P, -1, -1, -1))
        return masks[:, 1:], iou[:, 1:], obj


# ---------------------------------------------------------------------------
# Parity tests
# ---------------------------------------------------------------------------

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


@pytest.mark.slow
class TestSAM2Parity:
    def _build(self, seed=0):
        cfg = SAM2Config.tiny_test()
        tm = _randomize(TSAM2Image(cfg), seed)
        with torch.no_grad():
            # bicubic kernels differ between frameworks (module
            # docstring); the additive bkg pos embed is zeroed for strict
            # parity, the window pos embed tiling is exact and stays.
            tm.image_encoder.trunk.pos_embed.zero_()
        params = convert_torch_state_dict(tm.state_dict(), cfg)
        return cfg, tm, SAM2ImageModel(cfg), params

    def test_embed_image_parity(self):
        cfg, tm, jm, params = self._build()
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (1, cfg.img_size, cfg.img_size, 3)) \
            .astype(np.float32)
        with torch.no_grad():
            tfe = tm.embed_image(torch.from_numpy(
                ((img - MEAN) / STD).transpose(0, 3, 1, 2)))
        jfe = jm.apply(params, jnp.asarray(img),
                       method=SAM2ImageModel.embed_image)
        for k in ("image_embed", "feat_s0", "feat_s1"):
            a = np.asarray(jfe[k])                    # NHWC
            b = t2n(tfe[k]).transpose(0, 2, 3, 1)
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)

    def test_decode_points_parity(self):
        cfg, tm, jm, params = self._build(1)
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 1, (1, cfg.img_size, cfg.img_size, 3)) \
            .astype(np.float32)
        pts = rng.uniform(0, cfg.img_size, (5, 2)).astype(np.float32)
        with torch.no_grad():
            tfe = tm.embed_image(torch.from_numpy(
                ((img - MEAN) / STD).transpose(0, 3, 1, 2)))
            tmasks, tiou, tobj = tm.decode_points(
                tfe, torch.from_numpy(pts))
        jfe = jm.apply(params, jnp.asarray(img),
                       method=SAM2ImageModel.embed_image)
        jmasks, jiou, jobj = jm.apply(params, jfe, jnp.asarray(pts),
                                      method=SAM2ImageModel.decode_points)
        np.testing.assert_allclose(np.asarray(jmasks), t2n(tmasks),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(jiou), t2n(tiou),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(jobj), t2n(tobj),
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.slow
class TestConverterCoverage:
    def test_base_plus_manifest_covered(self):
        """Full-size (sam2.1_hiera_base_plus) mirror on the meta device:
        the converter must consume every non-video key and produce
        exactly the flax model's param tree (keys AND shapes)."""
        cfg = SAM2Config.base_plus()
        with torch.device("meta"):
            tm = TSAM2Image(cfg, with_video_dummies=True)
        manifest = {k: tuple(v.shape) for k, v in tm.state_dict().items()}
        sd = {k: np.broadcast_to(np.zeros((), np.float32), s)
              for k, s in manifest.items()}
        params = convert_torch_state_dict(sd, cfg)

        jm = SAM2ImageModel(cfg)
        template = jax.eval_shape(
            lambda k, i, p: jm.init(k, i, p,
                                    method=SAM2ImageModel.full_init),
            jax.random.PRNGKey(0),
            jax.ShapeDtypeStruct((1, cfg.img_size, cfg.img_size, 3),
                                 jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32))

        flat_t = {"/".join(map(str, k)): v.shape for k, v in
                  jax.tree_util.tree_flatten_with_path(template)[0]}
        flat_c = {"/".join(map(str, k)): v.shape for k, v in
                  jax.tree_util.tree_flatten_with_path(params)[0]}
        missing = sorted(set(flat_t) - set(flat_c))
        extra = sorted(set(flat_c) - set(flat_t))
        assert missing == [], f"flax params the converter left unfilled: " \
                              f"{missing[:10]}"
        assert extra == [], f"converter produced unknown params: " \
                            f"{extra[:10]}"
        bad = [k for k in flat_t if tuple(flat_t[k]) != tuple(flat_c[k])]
        assert bad == [], f"shape mismatches: " \
                          f"{[(k, flat_t[k], flat_c[k]) for k in bad[:5]]}"

    def test_missing_key_is_named(self):
        cfg = SAM2Config.tiny_test()
        tm = TSAM2Image(cfg)
        sd = {k: t2n(v) for k, v in tm.state_dict().items()}
        del sd["sam_mask_decoder.iou_token.weight"]
        with pytest.raises(KeyError, match="iou_token"):
            convert_torch_state_dict(sd, cfg)

    def test_naming_drift_is_named(self):
        cfg = SAM2Config.tiny_test()
        tm = TSAM2Image(cfg)
        sd = {k: t2n(v) for k, v in tm.state_dict().items()}
        sd["sam_mask_decoder.new_mystery_head.weight"] = np.zeros(3)
        with pytest.raises(KeyError, match="mystery"):
            convert_torch_state_dict(sd, cfg)


# ---------------------------------------------------------------------------
# AMG pipeline
# ---------------------------------------------------------------------------


class TestAMG:
    def test_point_grid_and_crops(self):
        from vggt_slam_tpu.semantic.sam2_amg import (build_point_grid,
                                                     generate_crop_boxes)
        g = build_point_grid(24)
        assert g.shape == (576, 2)
        assert abs(g[0, 0] - 1 / 48) < 1e-9 and g.max() < 1.0
        boxes, layers = generate_crop_boxes((480, 640), 1, 512 / 1500)
        assert len(boxes) == 5 and layers == [0, 1, 1, 1, 1]
        assert boxes[0] == [0, 0, 640, 480]
        for b in boxes[1:]:  # crops tile the image with overlap
            assert b[2] <= 640 and b[3] <= 480

    def test_nms(self):
        from vggt_slam_tpu.semantic.sam2_amg import nms
        boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                         float)
        keep = nms(boxes, np.array([0.9, 0.8, 0.7]), 0.5)
        assert sorted(keep.tolist()) == [0, 2]

    def test_device_stats_match_numpy(self):
        """_decode_chunk's on-device stability/box/area stats against a
        plain numpy reference on the same logits."""
        from vggt_slam_tpu.semantic.sam2_amg import _decode_chunk
        cfg = SAM2Config.tiny_test()
        model = SAM2ImageModel(cfg)
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (1, cfg.img_size, cfg.img_size, 3))
        pts = rng.uniform(0, cfg.img_size, (4, 2)).astype(np.float32)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.asarray(img, jnp.float32),
                            jnp.asarray(pts))
        feats = model.apply(params, jnp.asarray(img, jnp.float32),
                            method=SAM2ImageModel.embed_image)
        m, iou, st, bx, ar = _decode_chunk(model, params, feats,
                                           jnp.asarray(pts))
        m = np.asarray(m)
        hi = (m > 1.0).sum((1, 2))
        lo = (m > -1.0).sum((1, 2))
        np.testing.assert_allclose(np.asarray(st),
                                   hi / np.maximum(lo, 1), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(ar), (m > 0).sum((1, 2)))
        for i in range(len(m)):
            ys, xs = np.nonzero(m[i] > 0)
            if len(ys) == 0:
                np.testing.assert_array_equal(np.asarray(bx[i]), 0)
            else:
                np.testing.assert_array_equal(
                    np.asarray(bx[i]),
                    [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])

    def test_generator_end_to_end(self):
        """Weight-free tiny model: the full AMG loop (crops, batching,
        filters, NMS, small-region cleanup) produces reference-format
        mask dicts."""
        from vggt_slam_tpu.semantic.sam2_amg import make_sam2_mask_generator
        gen = make_sam2_mask_generator(
            cfg=SAM2Config.tiny_test(), points_per_side=4,
            points_per_batch=8, pred_iou_thresh=0.0,
            stability_score_thresh=0.0, min_mask_region_area=4)
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (48, 72, 3)).astype(np.uint8)
        masks = gen(img)
        assert masks, "no masks survived permissive thresholds"
        areas = [m["area"] for m in masks]
        assert areas == sorted(areas, reverse=True)
        for m in masks:
            assert m["segmentation"].shape == (48, 72)
            assert m["segmentation"].dtype == bool
            assert m["area"] == int(m["segmentation"].sum())
            x, y, w, h = m["bbox"]
            assert 0 <= x <= 72 and 0 <= y <= 48
            assert 0 <= m["stability_score"] <= 1.0 + 1e-6

    def test_embedder_integration(self):
        """The generator satisfies the embedder's mask_generator
        contract end to end (paint + save)."""
        from vggt_slam_tpu.semantic.embedder import SemanticEmbedder
        from vggt_slam_tpu.semantic.sam2_amg import make_sam2_mask_generator
        gen = make_sam2_mask_generator(
            cfg=SAM2Config.tiny_test(), points_per_side=2,
            points_per_batch=4, pred_iou_thresh=0.0,
            stability_score_thresh=0.0, min_mask_region_area=0)
        emb = SemanticEmbedder(mask_generator=gen, target_hw=(32, 40))
        rng = np.random.default_rng(1)
        img = rng.uniform(0, 1, (64, 80, 3)).astype(np.float32)
        dense = emb.embed_image(img)
        assert dense.shape[:2] == (32, 40) and dense.shape[2] > 0
        assert np.abs(dense).sum() > 0  # something was painted
