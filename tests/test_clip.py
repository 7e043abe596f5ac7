"""Native CLIP: tokenizer parity, torch-model parity, manifest coverage.

The reference embeds mask crops and text queries with Hugging Face CLIP
(reference semantic_embedder.py:69-97, query_voxelmap.py:24-31). Unlike
VGGT/SALAD/SAM2 - whose torch mirrors the tests must author - transformers
itself ships the reference implementation here, so parity is asserted
directly against `transformers.CLIPModel` / `transformers.CLIPTokenizer`:

  * tokenizer: token-for-token and id-for-id equality on a tiny authored
    vocab/merges pair (same file format as the released checkpoint's).
  * model: tiny-config feature/logit parity, torch vs flax.
  * manifest: the full-size `openai/clip-vit-base-patch32` layout (built
    on the meta device) must equal the committed record
    (tests/data/manifest_clip_vit_b32.json), and the converter must map
    100% of it onto the flax tree at the flagship config.

Regenerate the committed manifest after an intentional change with:
    python tests/test_clip.py --write
"""
import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vggt_slam_tpu.models import clip as M  # noqa: E402
from vggt_slam_tpu.models.clip_tokenizer import (CLIPTokenizer,  # noqa: E402
                                                 bytes_to_unicode)

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
MANIFEST_PATH = os.path.join(DATA_DIR, "manifest_clip_vit_b32.json")


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------


def _write_tiny_vocab(tmpdir) -> tuple[str, str]:
    """A miniature vocab/merges pair in the released files' exact format:
    256 byte symbols, their `</w>` forms, merged tokens, then specials."""
    merges = ["t h", "th e</w>", "a n", "an d</w>", "c a", "ca t</w>",
              "d o", "do g</w>", "1 2", "' s</w>"]
    vocab = list(bytes_to_unicode().values())
    vocab += [v + "</w>" for v in vocab]
    vocab += ["".join(m.split()) for m in merges]
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    vocab_path = os.path.join(tmpdir, "vocab.json")
    merges_path = os.path.join(tmpdir, "merges.txt")
    with open(vocab_path, "w", encoding="utf-8") as f:
        json.dump({tok: i for i, tok in enumerate(vocab)}, f)
    with open(merges_path, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n" + "\n".join(merges) + "\n")
    return vocab_path, merges_path


TEXTS = [
    "The CAT and the dog!",
    "a photo of a cat's toy, 12 dogs",
    "  weird\t whitespace\n\n and   punctuation?!...  ",
    "café 中 cat",  # accents + a CJK codepoint
    "the " * 60,  # forces truncation at the context length
    "",
]


class TestTokenizer:
    def test_matches_transformers(self, tmp_path):
        vocab_path, merges_path = _write_tiny_vocab(str(tmp_path))
        theirs = transformers.CLIPTokenizer(vocab_path, merges_path)
        ours = CLIPTokenizer(vocab_path, merges_path, context_length=16)
        for text in TEXTS:
            assert ours.tokenize(text) == theirs.tokenize(text), text
            ref = theirs([text], padding="max_length", max_length=16,
                         truncation=True)["input_ids"][0]
            np.testing.assert_array_equal(ours([text])[0], ref, err_msg=text)

    def test_batch_shape_and_specials(self, tmp_path):
        vocab_path, merges_path = _write_tiny_vocab(str(tmp_path))
        tok = CLIPTokenizer(vocab_path, merges_path, context_length=16)
        ids = tok(["the cat", "a dog"])
        assert ids.shape == (2, 16) and ids.dtype == np.int32
        assert (ids[:, 0] == tok.bos_id).all()
        # EOT both terminates and pads; pooling takes its first position.
        assert (ids == tok.eos_id).any(axis=1).all()


# ---------------------------------------------------------------------------
# Model parity (tiny config, transformers as the torch reference)
# ---------------------------------------------------------------------------


def _hf_tiny_config(cfg: M.CLIPConfig):
    return transformers.CLIPConfig(
        projection_dim=cfg.projection_dim,
        vision_config=dict(hidden_size=cfg.vision_width,
                           num_hidden_layers=cfg.vision_layers,
                           num_attention_heads=cfg.vision_heads,
                           intermediate_size=cfg.vision_mlp,
                           image_size=cfg.image_size,
                           patch_size=cfg.patch_size,
                           projection_dim=cfg.projection_dim),
        text_config=dict(hidden_size=cfg.text_width,
                         num_hidden_layers=cfg.text_layers,
                         num_attention_heads=cfg.text_heads,
                         intermediate_size=cfg.text_mlp,
                         vocab_size=cfg.vocab_size,
                         max_position_embeddings=cfg.context_length,
                         projection_dim=cfg.projection_dim,
                         eos_token_id=cfg.vocab_size - 1))


def _parity_ids(cfg: M.CLIPConfig, rng: np.random.Generator, n: int):
    """Token batches whose EOT (= max id) appears once then right-pads,
    the layout the tokenizer produces."""
    eos = cfg.vocab_size - 1
    ids = np.full((n, cfg.context_length), eos, dtype=np.int64)
    for i in range(n):
        length = int(rng.integers(3, cfg.context_length + 1))
        ids[i, :length - 1] = rng.integers(1, eos - 1, size=length - 1)
    return ids


@pytest.mark.slow
class TestTorchParity:
    def test_features_and_logits(self):
        cfg = M.CLIPConfig.tiny_test()
        torch.manual_seed(0)
        tmodel = transformers.CLIPModel(_hf_tiny_config(cfg)).eval()
        rng = np.random.default_rng(1)
        images = rng.standard_normal((3, 3, cfg.image_size,
                                      cfg.image_size)).astype(np.float32)
        ids = _parity_ids(cfg, rng, 4)
        with torch.no_grad():
            t_img = tmodel.get_image_features(torch.from_numpy(images))
            t_txt = tmodel.get_text_features(torch.from_numpy(ids))
            t_log = tmodel(input_ids=torch.from_numpy(ids),
                           pixel_values=torch.from_numpy(images))

        model = M.CLIP(cfg)
        params = {"params": M.convert_torch_state_dict(tmodel.state_dict(),
                                                       cfg)}
        nhwc = jnp.asarray(images.transpose(0, 2, 3, 1))
        j_img = model.apply(params, nhwc, normalize=False,
                            method=M.CLIP.encode_image)
        j_txt = model.apply(params, jnp.asarray(ids), normalize=False,
                            method=M.CLIP.encode_text)
        j_log, _, _ = model.apply(params, nhwc, jnp.asarray(ids))

        np.testing.assert_allclose(np.asarray(j_img), t_img.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(j_txt), t_txt.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(j_log),
                                   t_log.logits_per_image.numpy(),
                                   rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# Native encoder factory (checkpoint-dir -> batched device callables)
# ---------------------------------------------------------------------------


def _write_tiny_checkpoint_dir(tmpdir, cfg: M.CLIPConfig):
    """A miniature HF-style CLIP checkpoint dir: config.json +
    pytorch_model.bin + vocab.json/merges.txt."""
    hf_cfg = _hf_tiny_config(cfg)
    torch.manual_seed(0)
    tmodel = transformers.CLIPModel(hf_cfg).eval()
    torch.save(tmodel.state_dict(), os.path.join(tmpdir, "pytorch_model.bin"))
    with open(os.path.join(tmpdir, "config.json"), "w") as f:
        json.dump({"model_type": "clip",
                   "projection_dim": cfg.projection_dim,
                   "vision_config": hf_cfg.vision_config.to_dict(),
                   "text_config": hf_cfg.text_config.to_dict()}, f)
    _write_tiny_vocab(tmpdir)
    return tmodel


class TestNativeEncoders:
    def test_resolve_and_encode(self, tmp_path):
        cfg = M.CLIPConfig.tiny_test(vocab_size=512 + 2 + 10,
                                     context_length=16)
        tmodel = _write_tiny_checkpoint_dir(str(tmp_path), cfg)
        from vggt_slam_tpu.semantic.embedder import resolve_clip_encoders
        encode_crops, encode_text = resolve_clip_encoders(str(tmp_path),
                                                          "auto")
        crops = np.random.default_rng(0).random((5, 3, 40, 40)).astype(
            np.float32)
        feats = encode_crops(crops)
        assert feats.shape == (5, cfg.projection_dim)
        np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0,
                                   rtol=1e-4)
        assert encode_crops(crops[:0]).shape == (0, cfg.projection_dim)

        texts = ["the cat", "a dog and the cat", "12!"]
        tfeats = encode_text(texts)
        assert tfeats.shape == (3, cfg.projection_dim)
        # Cross-check against the transformers text tower on OUR token ids
        # (the tokenizer itself is parity-tested above).
        from vggt_slam_tpu.models.clip_tokenizer import CLIPTokenizer
        ids = CLIPTokenizer.from_dir(str(tmp_path), cfg.context_length)(texts)
        with torch.no_grad():
            ref = tmodel.get_text_features(torch.from_numpy(
                ids.astype(np.int64)))
            ref = (ref / ref.norm(dim=-1, keepdim=True)).numpy()
        np.testing.assert_allclose(tfeats, ref, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# Manifest + full-scale converter coverage
# ---------------------------------------------------------------------------


def clip_manifest() -> dict:
    with torch.device("meta"):
        model = transformers.CLIPModel(transformers.CLIPConfig())
    return {k: list(v.shape) for k, v in model.state_dict().items()}


def _template_shapes(cfg: M.CLIPConfig):
    model = M.CLIP(cfg)
    tree = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, cfg.image_size, cfg.image_size, 3),
                             jnp.float32),
        jax.ShapeDtypeStruct((1, cfg.context_length), jnp.int32))
    return tree["params"]


@pytest.mark.slow
class TestManifest:
    def test_layout_matches_committed_record(self):
        with open(MANIFEST_PATH) as f:
            committed = json.load(f)
        assert clip_manifest() == committed

    def test_full_scale_converter_coverage(self):
        """The strict converter consumes 100% of the flagship manifest and
        reproduces exactly the flax template's structure and shapes."""
        cfg = M.CLIPConfig.base_patch32()
        with open(MANIFEST_PATH) as f:
            manifest = json.load(f)
        sd = {k: np.broadcast_to(np.zeros((), np.float32), tuple(s))
              for k, s in manifest.items()}
        params = M.convert_torch_state_dict(sd, cfg)
        got = jax.tree_util.tree_map(lambda a: tuple(a.shape), params)
        want = jax.tree_util.tree_map(lambda a: tuple(a.shape),
                                      _template_shapes(cfg))
        assert got == want

    def test_missing_key_is_named(self):
        cfg = M.CLIPConfig.base_patch32()
        with open(MANIFEST_PATH) as f:
            manifest = json.load(f)
        sd = {k: np.broadcast_to(np.zeros((), np.float32), tuple(s))
              for k, s in manifest.items()}
        del sd["text_model.encoder.layers.7.mlp.fc1.bias"]
        with pytest.raises(KeyError, match="layers.7.mlp.fc1.bias"):
            M.convert_torch_state_dict(sd, cfg)

    def test_naming_drift_is_named(self):
        cfg = M.CLIPConfig.base_patch32()
        with open(MANIFEST_PATH) as f:
            manifest = json.load(f)
        sd = {k: np.broadcast_to(np.zeros((), np.float32), tuple(s))
              for k, s in manifest.items()}
        sd["vision_model.sneaky_extra.weight"] = np.zeros((3,), np.float32)
        with pytest.raises(KeyError, match="sneaky_extra"):
            M.convert_torch_state_dict(sd, cfg)


# ---------------------------------------------------------------------------
# Fast structural checks (no torch forward)
# ---------------------------------------------------------------------------


class TestStructure:
    def test_shapes_and_normalization(self):
        cfg = M.CLIPConfig.tiny_test()
        model = M.CLIP(cfg)
        rng = jax.random.PRNGKey(0)
        images = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
        ids = jnp.zeros((3, cfg.context_length), jnp.int32).at[:, 4].set(
            cfg.vocab_size - 1)
        params = model.init(rng, images, ids)
        logits, img, txt = model.apply(params, images, ids)
        assert logits.shape == (2, 3)
        assert img.shape == (2, cfg.projection_dim)
        assert txt.shape == (3, cfg.projection_dim)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(img), axis=-1),
                                   1.0, rtol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(txt), axis=-1),
                                   1.0, rtol=1e-5)

    def test_preprocess(self):
        chw = np.random.default_rng(0).random((2, 3, 50, 40)).astype(
            np.float32)
        out = M.preprocess_images(chw, 32)
        assert out.shape == (2, 32, 32, 3)
        hwc = np.transpose(chw, (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(M.preprocess_images(hwc, 32)),
                                   np.asarray(out), rtol=1e-6)


if __name__ == "__main__":
    import sys

    if "--write" in sys.argv:
        os.makedirs(DATA_DIR, exist_ok=True)
        with open(MANIFEST_PATH, "w") as f:
            json.dump(clip_manifest(), f, indent=1)
        print("manifest written to", MANIFEST_PATH)
