"""CLIP byte-pair-encoding tokenizer (pure Python, in-repo).

The reference tokenizes text queries through Hugging Face's CLIPProcessor
(reference query_voxelmap.py:25-31, semantic_embedder.py:69-97). This is
a standalone implementation of the same tokenizer so the framework has no
runtime dependency on transformers for text queries: it loads the
checkpoint directory's own `vocab.json` + `merges.txt` (shipped alongside
the weights, same local-files gating as the model converter) and encodes
to fixed-length (N, 77) id arrays - static shapes for the jitted text
tower.

Pipeline matched to the released tokenizer (validated token-for-token
against transformers.CLIPTokenizer in tests/test_clip.py):

  1. basic clean: drop control chars, normalize whitespace, NFC,
     space out CJK codepoints, lowercase (the BasicTokenizer path -
     this environment has no ftfy, and for already-clean text the two
     upstream paths agree).
  2. split with CLIP's regex (contractions / letter runs / digits /
     punctuation runs).
  3. GPT-2 byte->unicode mapping, then BPE with CLIP's variant where the
     last character of each word carries a `</w>` suffix.
  4. `<|startoftext|>` ... `<|endoftext|>`, truncate to the context
     length, right-pad with the EOT id (harmless under the text tower's
     causal mask: pooling takes the FIRST EOT position).
"""
from __future__ import annotations

import functools
import json
import os
import unicodedata

import numpy as np

try:  # the CLIP split pattern needs \p{L}/\p{N} classes
    import regex as _re
except ImportError:  # pragma: no cover - regex ships with transformers
    _re = None

_PAT = (r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
        r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+")


@functools.lru_cache()
def bytes_to_unicode():
    """GPT-2's reversible byte -> printable-unicode-char table."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def _is_cjk(cp: int) -> bool:
    return ((0x4E00 <= cp <= 0x9FFF) or (0x3400 <= cp <= 0x4DBF)
            or (0x20000 <= cp <= 0x2A6DF) or (0x2A700 <= cp <= 0x2B73F)
            or (0x2B740 <= cp <= 0x2B81F) or (0x2B820 <= cp <= 0x2CEAF)
            or (0xF900 <= cp <= 0xFAFF) or (0x2F800 <= cp <= 0x2FA1F))


def basic_clean(text: str) -> str:
    """BasicTokenizer(strip_accents=False, do_split_on_punc=False) +
    lowercase + single-space join, as transformers' no-ftfy fallback."""
    out = []
    for ch in text:
        if ch in ("\t", "\n", "\r"):
            out.append(" ")
        elif ord(ch) in (0, 0xFFFD) or unicodedata.category(ch).startswith("C"):
            continue  # control chars (other than the whitespace trio above)
        elif unicodedata.category(ch) == "Zs":
            out.append(" ")
        else:
            out.append(ch)
    text = "".join(f" {c} " if _is_cjk(ord(c)) else c for c in out)
    text = unicodedata.normalize("NFC", text)
    return " ".join(t.lower() for t in text.strip().split())


class CLIPTokenizer:
    def __init__(self, vocab_file: str, merges_file: str,
                 context_length: int = 77):
        if _re is None:
            raise ImportError("the `regex` package is required for the CLIP "
                              "tokenizer's unicode split pattern")
        with open(vocab_file, encoding="utf-8") as f:
            self.encoder = json.load(f)
        with open(merges_file, encoding="utf-8") as f:
            # line 0 is the "#version" header; the released file also has
            # trailing unused merges past the vocab-derived count.
            merges = f.read().strip().split("\n")[1:49152 - 256 - 2 + 1]
        self.bpe_ranks = {tuple(m.split()): i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.pat = _re.compile(_PAT, _re.IGNORECASE)
        self.context_length = context_length
        self.bos_id = self.encoder["<|startoftext|>"]
        self.eos_id = self.encoder["<|endoftext|>"]
        self.unk_id = self.eos_id
        self._cache: dict[str, str] = {}

    @classmethod
    def from_dir(cls, model_dir: str, context_length: int = 77):
        return cls(os.path.join(model_dir, "vocab.json"),
                   os.path.join(model_dir, "merges.txt"), context_length)

    def _bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word, word[1:]))
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1 << 30))
            if best not in self.bpe_ranks:
                break
            first, second = best
            merged, i = [], 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def tokenize(self, text: str) -> list[str]:
        tokens = []
        for tok in self.pat.findall(basic_clean(text)):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            tokens.extend(self._bpe(tok).split(" "))
        return tokens

    def encode(self, text: str) -> list[int]:
        """bos + bpe ids + eos, truncated to the context length."""
        ids = [self.encoder.get(t, self.unk_id) for t in self.tokenize(text)]
        ids = ids[:self.context_length - 2]
        return [self.bos_id] + ids + [self.eos_id]

    def __call__(self, texts: list[str] | str) -> np.ndarray:
        """Batch-encode to a fixed (N, context_length) int32 array,
        right-padded with the EOT id (static shape for the jitted tower)."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.full((len(texts), self.context_length), self.eos_id,
                      dtype=np.int32)
        for i, t in enumerate(texts):
            ids = self.encode(t)
            out[i, :len(ids)] = ids
        return out
