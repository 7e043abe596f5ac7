import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vggt_slam_tpu.data import pcd
from vggt_slam_tpu.ops.voxel import voxelize_np, voxelize_device
from vggt_slam_tpu.semantic.voxel_map import SemanticVoxel, SemanticVoxelMap
from vggt_slam_tpu.viz.glb import GLBExporter


class TestPCD:
    def test_roundtrip_binary(self, tmp_path):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        cols = rng.integers(0, 256, size=(100, 3)).astype(np.uint8)
        p = str(tmp_path / "a.pcd")
        pcd.write_pcd(p, pts, cols)
        pts2, cols2 = pcd.read_pcd(p)
        np.testing.assert_allclose(pts2, pts, atol=1e-6)
        np.testing.assert_array_equal(cols2, cols)

    def test_roundtrip_no_color(self, tmp_path):
        pts = np.ones((5, 3), np.float32)
        p = str(tmp_path / "b.pcd")
        pcd.write_pcd(p, pts)
        pts2, cols2 = pcd.read_pcd(p)
        np.testing.assert_allclose(pts2, pts)
        assert cols2 is None

    def test_ply(self, tmp_path):
        pts = np.random.default_rng(1).normal(size=(10, 3)).astype(np.float32)
        cols = np.random.default_rng(2).integers(0, 255, (10, 3)).astype(np.uint8)
        p = str(tmp_path / "c.ply")
        pcd.write_ply(p, pts, cols)
        raw = open(p, "rb").read()
        assert raw.startswith(b"ply\nformat binary_little_endian")
        assert b"element vertex 10" in raw


class TestVoxelize:
    def test_np_matches_manual(self):
        pts = np.array([[0.01, 0.01, 0.01], [0.02, 0.02, 0.02],
                        [0.11, 0.0, 0.0]])
        feats = np.array([[1.0], [3.0], [10.0]])
        centers, means, inverse = voxelize_np(pts, feats, 0.1)
        assert centers.shape[0] == 2
        np.testing.assert_allclose(sorted(means.ravel()), [2.0, 10.0])

    def test_device_matches_np(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
        feats = rng.normal(size=(500, 4)).astype(np.float32)
        mask = np.ones(500, np.float32)
        c_np, m_np, _ = voxelize_np(pts, feats, 0.25)
        c_d, m_d, counts, num = voxelize_device(
            jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(mask),
            0.25, capacity=1024)
        num = int(num)
        assert num == c_np.shape[0]
        # match by sorting on centers
        order_np = np.lexsort(c_np.T)
        cd = np.asarray(c_d[:num])
        md = np.asarray(m_d[:num])
        order_d = np.lexsort(cd.T)
        np.testing.assert_allclose(cd[order_d], c_np[order_np], atol=1e-5)
        np.testing.assert_allclose(md[order_d], m_np[order_np], atol=1e-4)

    def test_device_respects_mask(self):
        pts = np.zeros((10, 3), np.float32)
        pts[5:] = 100.0
        feats = np.ones((10, 2), np.float32)
        mask = np.zeros(10, np.float32)
        mask[:5] = 1
        c, m, counts, num = voxelize_device(
            jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(mask),
            0.5, capacity=16)
        assert int(num) == 1
        assert float(counts[0]) == 5.0

    def test_device_all_masked(self):
        pts = np.ones((10, 3), np.float32)
        feats = np.ones((10, 2), np.float32)
        c, m, counts, num = voxelize_device(
            jnp.asarray(pts), jnp.asarray(feats), jnp.zeros(10),
            0.5, capacity=16)
        assert int(num) == 0


class TestSemanticVoxelMap:
    def make_map(self):
        rng = np.random.default_rng(4)
        centers = (np.arange(30).reshape(10, 3).astype(np.float32) + 0.5) * 0.1
        feats = rng.normal(size=(10, 8)).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=1, keepdims=True)
        contribs = [[(0, "1.0")], [(0, "2.0")]] + [[(1, f"{i}.0")] for i in range(8)]
        vox = SemanticVoxel(0.1, centers, feats, contribs)
        names = {"0": {"1.0": "img1.png", "2.0": "img2.png"},
                 "1": {f"{i}.0": f"f{i}.png" for i in range(8)}}
        return SemanticVoxelMap(vox, names)

    def test_query_topk(self):
        vm = self.make_map()
        q = vm.get_features()[3]
        idx, coords, sims = vm.query_with_embedding(q, top_k=3)
        assert idx[0] == 3 and sims[0] == pytest.approx(1.0, abs=1e-5)
        assert len(idx) == 3

    def test_position_lookup(self):
        vm = self.make_map()
        pos = vm.get_centers_world()[2]
        assert vm.get_index_at_position(pos) == 2
        assert vm.get_index_at_position([999, 999, 999]) is None

    def test_persistence_roundtrip(self, tmp_path):
        vm = self.make_map()
        vm.save_to_directory(str(tmp_path))
        assert os.path.exists(tmp_path / "semantic_voxels.npz")
        assert os.path.exists(tmp_path / "frame_names.json")
        vm2 = SemanticVoxelMap.load_from_directory(str(tmp_path))
        np.testing.assert_allclose(vm2.get_centers_world(),
                                   vm.get_centers_world())
        np.testing.assert_allclose(vm2.get_features(), vm.get_features())
        assert vm2.resolve_contributor(0, "1.0") == "img1.png"

    def test_latest_frame_at_voxel(self):
        vm = self.make_map()
        name, sid, fid = vm.get_latest_frame_at_voxel(0)
        assert name == "img1.png"

    def test_features_to_rgb_shapes(self):
        vm = self.make_map()
        rgb = vm.features_to_rgb(vm.get_features())
        assert rgb.shape == (10, 3)
        assert rgb.min() >= 0 and rgb.max() <= 1


class TestGLB:
    def test_export_valid_glb(self, tmp_path):
        ex = GLBExporter()
        rng = np.random.default_rng(5)
        ex.add_point_cloud(rng.normal(size=(50, 3)),
                           rng.uniform(size=(50, 3)))
        ex.add_camera_pose(np.eye(4))
        p = str(tmp_path / "scene.glb")
        ex.export(p)
        raw = open(p, "rb").read()
        import struct
        magic, version, length = struct.unpack("<III", raw[:12])
        assert magic == 0x46546C67 and version == 2 and length == len(raw)
        js_len, js_type = struct.unpack("<II", raw[12:20])
        gltf = json.loads(raw[20:20 + js_len])
        assert gltf["asset"]["version"] == "2.0"
        assert len(gltf["meshes"]) == 2  # points + lines


class TestTorchConversion:
    pytestmark = pytest.mark.slow
    def test_synthetic_torch_dict_roundtrip(self):
        """Build a torch-style state dict named via the converter's own
        mapping, convert it, and require a 100% fill with exact values -
        locks the name mapping and the OIHW/out-in transposes."""
        from vggt_slam_tpu.models.vggt.config import VGGTConfig
        from vggt_slam_tpu.models.vggt.model import init_params
        from vggt_slam_tpu.models.vggt import convert

        # 4 DPT layers so every resize_layers spec (ConvTranspose x4/x2,
        # identity, strided conv) appears in the mapping.
        cfg = VGGTConfig.tiny(dpt_layers=(0, 1, 2, 3),
                              dpt_out_channels=(8, 16, 16, 32))
        params = init_params(cfg, jax.random.PRNGKey(0), 1, (56, 70))

        import re as _re

        def qperm(n):
            q = n // 4
            return np.concatenate([np.arange(q), np.arange(2 * q, 3 * q),
                                   np.arange(q, 2 * q), np.arange(3 * q, 4 * q)])

        dh = cfg.agg_dim // cfg.agg_heads
        roped = _re.compile(r"(frame|global)_blocks\.\d+\.attn\.")

        rng = np.random.default_rng(0)
        flat = convert._flatten(params)
        torch_sd = {}
        for path, arr in flat.items():
            name = convert._torch_name_candidates(path)[0]
            val = rng.normal(size=arr.shape).astype(np.float32)
            # Only kernels (torch `.weight`) are stored transposed; other
            # arrays (tokens, pos embeddings) keep their layout.
            if name.endswith(".weight") and val.ndim == 4 and \
                    (".resize_layers.0." in name or ".resize_layers.1." in name):
                torch_sd[name] = val.transpose(2, 3, 0, 1)  # (k,k,i,o)->(i,o,k,k)
            elif name.endswith(".weight") and val.ndim == 4:  # HWIO -> OIHW
                torch_sd[name] = val.transpose(3, 2, 0, 1)
            elif name.endswith(".weight") and val.ndim == 2:  # (in,out)->(out,in)
                torch_sd[name] = val.T
            else:
                torch_sd[name] = val
            flat[path] = val             # expected value after conversion
            # Roped (aggregator) attention q/k params additionally get the
            # rope-pairing quarter permutation (croco rotate-half -> our
            # half-swap; forward-validated in test_model_torch_parity.py).
            if roped.search(name):
                if name.endswith(("q_norm.weight", "q_norm.bias",
                                  "k_norm.weight", "k_norm.bias")):
                    flat[path] = val[qperm(dh)]
                elif name.endswith("qkv.bias"):
                    C3 = val.shape[0]
                    rows = np.arange(C3)
                    qk = rows[:2 * C3 // 3].reshape(
                        2, -1, dh)[..., qperm(dh)].reshape(-1)
                    flat[path] = val[np.concatenate([qk, rows[2 * C3 // 3:]])]
                elif name.endswith("qkv.weight"):   # flax (in, 3C)
                    C3 = val.shape[1]
                    cols = np.arange(C3)
                    qk = cols[:2 * C3 // 3].reshape(
                        2, -1, dh)[..., qperm(dh)].reshape(-1)
                    flat[path] = val[:, np.concatenate([qk,
                                                        cols[2 * C3 // 3:]])]

        out, report = convert.convert_torch_state_dict(torch_sd, params)
        assert report["unmatched_flax"] == []
        assert report["unused_torch"] == []
        out_flat = convert._flatten(out)
        for path, expected in flat.items():
            np.testing.assert_allclose(out_flat[path], expected, atol=1e-6,
                                       err_msg=path)

    def test_dinov2_pos_embed_layout(self):
        """Real DINOv2 checkpoints store pos_embed as (1, 1+g*g, C) with a
        CLS slot added to cls_token at forward time; the converter must
        fold the CLS slot into cls_token and re-grid the patch slots."""
        from vggt_slam_tpu.models.vggt import convert

        C, g = 8, 2
        rng = np.random.default_rng(1)
        template = {"params": {"aggregator": {"patch_embed": {
            "pos_embed": np.zeros((1, g, g, C), np.float32),
            "cls_token": np.zeros((1, 1, C), np.float32),
        }}}}
        pos = rng.normal(size=(1, 1 + g * g, C)).astype(np.float32)
        cls = rng.normal(size=(1, 1, C)).astype(np.float32)
        torch_sd = {"aggregator.patch_embed.pos_embed": pos,
                    "aggregator.patch_embed.cls_token": cls}
        out, report = convert.convert_torch_state_dict(torch_sd, template)
        assert report["unmatched_flax"] == []
        got = out["params"]["aggregator"]["patch_embed"]
        np.testing.assert_allclose(np.asarray(got["cls_token"]),
                                   cls + pos[:, :1], atol=1e-6)
        np.testing.assert_allclose(np.asarray(got["pos_embed"]),
                                   pos[:, 1:].reshape(1, g, g, C), atol=1e-6)

    def test_qk_norm_params_mapped(self):
        """Aggregator blocks carry q_norm/k_norm (released VGGT uses
        qk_norm=True); their flax paths must map to torch names."""
        from vggt_slam_tpu.models.vggt import convert
        from vggt_slam_tpu.models.vggt.config import VGGTConfig
        from vggt_slam_tpu.models.vggt.model import init_params

        cfg = VGGTConfig.tiny()
        assert cfg.agg_qk_norm
        params = init_params(cfg, jax.random.PRNGKey(0), 1, (56, 70))
        flat = convert._flatten(params)
        qn = [p for p in flat if "q_norm" in p]
        assert any("frame_block_0" in p for p in qn)
        assert any("global_block_0" in p for p in qn)
        # Encoder blocks must NOT have qk-norm (DINOv2 doesn't).
        assert not any("patch_embed" in p for p in qn)
        name = convert._torch_name_candidates(
            "params/aggregator/frame_block_0/attn/q_norm/scale")[0]
        assert name == "aggregator.frame_blocks.0.attn.q_norm.weight"


class TestConvertCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        from vggt_slam_tpu.models.vggt.config import VGGTConfig
        from vggt_slam_tpu.models.vggt.model import init_params
        from vggt_slam_tpu.models.vggt.convert import (save_checkpoint,
                                                       load_checkpoint)
        cfg = VGGTConfig.tiny()
        params = init_params(cfg, jax.random.PRNGKey(0), 1, (56, 70))
        p = str(tmp_path / "ckpt.npz")
        save_checkpoint(params, p)
        zeroed = jax.tree.map(jnp.zeros_like, params)
        restored = load_checkpoint(p, zeroed)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
