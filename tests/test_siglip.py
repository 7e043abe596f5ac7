"""Native SigLIP: tokenizer unit tests, torch-model parity, manifest.

The reference treats SigLIP as a drop-in alternative to CLIP in its
semantic pipeline (reference semantic_embedder.py:48,69-97). transformers
ships the reference implementation, so model parity is asserted directly
against `transformers.SiglipModel` at a tiny config. The tokenizer is a
pure-Python SentencePiece unigram encoder (no sentencepiece wheel in this
environment): its protobuf reader and Viterbi segmentation are validated
on hand-built unigram models serialized with the same proto subset.

Regenerate the committed manifest after an intentional change with:
    python tests/test_siglip.py --write
"""
import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vggt_slam_tpu.models import siglip as M  # noqa: E402
from vggt_slam_tpu.models.siglip_tokenizer import (  # noqa: E402
    SigLIPTokenizer, parse_spiece_model, write_spiece_model)

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
MANIFEST_PATH = os.path.join(DATA_DIR, "manifest_siglip_b16.json")


# ---------------------------------------------------------------------------
# Tokenizer (pure-python sentencepiece unigram)
# ---------------------------------------------------------------------------


def _tiny_pieces():
    # (piece, log-prob score, type): ids are list positions. Types follow
    # sentencepiece_model.proto (1=NORMAL, 2=UNKNOWN, 3=CONTROL).
    return [
        ("<pad>", 0.0, 3),
        ("</s>", 0.0, 3),
        ("<unk>", 0.0, 2),
        ("▁the", -1.0, 1),
        ("▁cat", -2.0, 1),
        ("▁ca", -3.0, 1),
        ("t", -1.5, 1),
        ("▁", -4.0, 1),
        ("h", -2.0, 1),
        ("e", -2.0, 1),
        ("▁dog", -2.25, 1),  # f32-exact score so the roundtrip compares ==
    ]


class TestTokenizer:
    def test_proto_roundtrip(self):
        pieces = _tiny_pieces()
        assert parse_spiece_model(write_spiece_model(pieces)) == pieces

    def test_viterbi_prefers_best_split(self):
        tok = SigLIPTokenizer(_tiny_pieces(), context_length=8)
        # "▁the ▁cat" (-3.0) beats "▁the ▁ca t" (-5.5).
        ids = tok.encode("the cat")
        assert ids == [3, 4]

    def test_unknown_chars_fall_back_to_unk(self):
        tok = SigLIPTokenizer(_tiny_pieces(), context_length=8)
        ids = tok.encode("the caz")
        assert ids[:2] == [3, 5]          # ▁the ▁ca
        assert ids[2] == tok.unk_id       # z
        assert tok.unk_id == 2            # resolved by type==UNKNOWN

    def test_canonicalization_strips_punctuation(self):
        tok = SigLIPTokenizer(_tiny_pieces(), context_length=8)
        assert tok.encode("The?! cat...") != tok.encode("the cat")  # case kept
        assert tok.encode("the?! cat...") == tok.encode("the cat")
        assert tok.encode("  the \t cat \n") == tok.encode("the cat")

    def test_padding_and_eos(self):
        tok = SigLIPTokenizer(_tiny_pieces(), context_length=6)
        out = tok(["the cat", "the cat the cat the cat"])
        assert out.shape == (2, 6) and out.dtype == np.int32
        # eos appended, then right-padded with the pad id (= eos).
        assert list(out[0]) == [3, 4, tok.eos_id, tok.pad_id, tok.pad_id,
                                tok.pad_id]
        # truncated row still ends with eos at the context edge
        assert out[1, -1] == tok.eos_id or tok.eos_id in out[1]
        assert len(tok.encode("the cat the cat the cat")[:5]) == 5

    def test_from_dir(self, tmp_path):
        with open(tmp_path / "spiece.model", "wb") as f:
            f.write(write_spiece_model(_tiny_pieces()))
        tok = SigLIPTokenizer.from_dir(str(tmp_path), context_length=8)
        assert tok.encode("the cat") == [3, 4]


# ---------------------------------------------------------------------------
# Model parity (tiny config, transformers as the torch reference)
# ---------------------------------------------------------------------------


def _hf_tiny_config(cfg: M.SigLIPConfig):
    return transformers.SiglipConfig(
        vision_config=dict(hidden_size=cfg.vision_width,
                           num_hidden_layers=cfg.vision_layers,
                           num_attention_heads=cfg.vision_heads,
                           intermediate_size=cfg.vision_mlp,
                           image_size=cfg.image_size,
                           patch_size=cfg.patch_size),
        text_config=dict(hidden_size=cfg.text_width,
                         num_hidden_layers=cfg.text_layers,
                         num_attention_heads=cfg.text_heads,
                         intermediate_size=cfg.text_mlp,
                         vocab_size=cfg.vocab_size,
                         max_position_embeddings=cfg.context_length,
                         projection_size=cfg.projection_size))


@pytest.mark.slow
class TestTorchParity:
    def test_features_and_logits(self):
        cfg = M.SigLIPConfig.tiny_test()
        torch.manual_seed(0)
        tmodel = transformers.SiglipModel(_hf_tiny_config(cfg)).eval()
        rng = np.random.default_rng(1)
        images = rng.standard_normal((3, 3, cfg.image_size,
                                      cfg.image_size)).astype(np.float32)
        # SigLIP pools the LAST text position: full-context ids, no
        # special layout needed.
        ids = rng.integers(0, cfg.vocab_size,
                           (4, cfg.context_length)).astype(np.int64)
        with torch.no_grad():
            t_img = tmodel.get_image_features(torch.from_numpy(images))
            t_txt = tmodel.get_text_features(torch.from_numpy(ids))
            t_out = tmodel(input_ids=torch.from_numpy(ids),
                           pixel_values=torch.from_numpy(images))

        model = M.SigLIP(cfg)
        params = {"params": M.convert_torch_state_dict(tmodel.state_dict(),
                                                       cfg)}
        nhwc = jnp.asarray(images.transpose(0, 2, 3, 1))
        j_img = model.apply(params, nhwc, normalize=False,
                            method=M.SigLIP.encode_image)
        j_txt = model.apply(params, jnp.asarray(ids), normalize=False,
                            method=M.SigLIP.encode_text)
        j_log, _, _ = model.apply(params, nhwc, jnp.asarray(ids))

        np.testing.assert_allclose(np.asarray(j_img), t_img.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(j_txt), t_txt.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(j_log),
                                   t_out.logits_per_image.numpy(),
                                   rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# Native encoder factory (checkpoint-dir -> batched device callables)
# ---------------------------------------------------------------------------


def _write_tiny_checkpoint_dir(tmpdir, cfg: M.SigLIPConfig):
    hf_cfg = _hf_tiny_config(cfg)
    torch.manual_seed(0)
    tmodel = transformers.SiglipModel(hf_cfg).eval()
    torch.save(tmodel.state_dict(), os.path.join(tmpdir, "pytorch_model.bin"))
    with open(os.path.join(tmpdir, "config.json"), "w") as f:
        json.dump({"model_type": "siglip",
                   "vision_config": hf_cfg.vision_config.to_dict(),
                   "text_config": hf_cfg.text_config.to_dict()}, f)
    # Vocab: specials + one piece per ASCII char + a few words, so any
    # test text tokenizes. Scores favor whole words.
    pieces = [("<pad>", 0.0, 3), ("</s>", 0.0, 3), ("<unk>", 0.0, 2)]
    pieces += [("▁" + w, -1.0, 1)
               for w in ("the", "cat", "dog", "a", "photo", "of")]
    import string as _s
    pieces += [(c, -5.0, 1) for c in _s.ascii_lowercase + _s.digits]
    pieces += [("▁", -4.0, 1)]
    pieces = pieces[:cfg.vocab_size]
    with open(os.path.join(tmpdir, "spiece.model"), "wb") as f:
        f.write(write_spiece_model(pieces))
    return tmodel


@pytest.mark.slow
class TestNativeEncoders:
    def test_resolve_and_encode(self, tmp_path):
        cfg = M.SigLIPConfig.tiny_test()
        tmodel = _write_tiny_checkpoint_dir(str(tmp_path), cfg)
        from vggt_slam_tpu.semantic.embedder import resolve_clip_encoders
        encode_crops, encode_text = resolve_clip_encoders(str(tmp_path),
                                                          "auto")
        crops = np.random.default_rng(0).random((5, 3, 40, 40)).astype(
            np.float32)
        feats = encode_crops(crops)
        assert feats.shape == (5, cfg.projection_size)
        np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0,
                                   rtol=1e-4)
        assert encode_crops(crops[:0]).shape == (0, cfg.projection_size)

        texts = ["the cat", "a photo of a dog", "dog 42"]
        tfeats = encode_text(texts)
        assert tfeats.shape == (3, cfg.projection_size)
        # Cross-check against the transformers text tower on OUR token ids
        # (the tokenizer itself is unit-tested above).
        ids = SigLIPTokenizer.from_dir(str(tmp_path),
                                       cfg.context_length)(texts)
        with torch.no_grad():
            ref = tmodel.get_text_features(torch.from_numpy(
                ids.astype(np.int64)))
            ref = (ref / ref.norm(dim=-1, keepdim=True)).numpy()
        np.testing.assert_allclose(tfeats, ref, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# Manifest + full-scale converter coverage
# ---------------------------------------------------------------------------


def siglip_manifest() -> dict:
    """google/siglip-base-patch16-224 layout (transformers defaults),
    built on the meta device (no memory)."""
    with torch.device("meta"):
        model = transformers.SiglipModel(transformers.SiglipConfig())
    return {k: list(v.shape) for k, v in model.state_dict().items()}


def _template_shapes(cfg: M.SigLIPConfig):
    model = M.SigLIP(cfg)
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
        assert siglip_manifest() == committed

    def test_full_scale_converter_coverage(self):
        """The strict converter consumes 100% of the flagship manifest and
        reproduces exactly the flax template's structure and shapes."""
        cfg = M.SigLIPConfig.base_patch16_224()
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
        cfg = M.SigLIPConfig.base_patch16_224()
        with open(MANIFEST_PATH) as f:
            manifest = json.load(f)
        sd = {k: np.zeros(tuple(s), np.float32)
              for k, s in manifest.items()}
        victim = "text_model.encoder.layers.3.mlp.fc1.weight"
        del sd[victim]
        with pytest.raises(KeyError, match="fc1"):
            M.convert_torch_state_dict(sd, cfg)

    def test_extra_key_is_named(self):
        cfg = M.SigLIPConfig.base_patch16_224()
        with open(MANIFEST_PATH) as f:
            manifest = json.load(f)
        sd = {k: np.zeros(tuple(s), np.float32)
              for k, s in manifest.items()}
        sd["rogue.weight"] = np.zeros((3,), np.float32)
        with pytest.raises(KeyError, match="rogue"):
            M.convert_torch_state_dict(sd, cfg)


if __name__ == "__main__":
    import sys
    if "--write" in sys.argv:
        os.makedirs(DATA_DIR, exist_ok=True)
        with open(MANIFEST_PATH, "w") as f:
            json.dump(siglip_manifest(), f, indent=0, sort_keys=True)
        print(f"wrote {MANIFEST_PATH}")
