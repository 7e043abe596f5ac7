"""SigLIP tokenizer: pure-Python SentencePiece unigram encoder.

The released SigLIP checkpoints tokenize with a SentencePiece unigram
model (`spiece.model`, vocab 32000) via transformers' SiglipTokenizer
(tokenization_siglip.py — T5-style, `add_dummy_prefix` disabled,
canonicalized text, eos appended, padded to the FULL 64-token context
because the text tower pools the last position). This environment has no
`sentencepiece` wheel and cannot install one, so this module implements
the inference side natively:

  * a minimal protobuf reader for sentencepiece_model.proto's
    `ModelProto.pieces` (field 1: repeated {piece: string=1,
    score: float=2, type: enum=3}) — the only part encoding needs;
  * Viterbi unigram segmentation (maximize the sum of piece log-probs;
    single characters outside the vocab fall back to `<unk>` with
    sentencepiece's unk penalty of min_score - 10);
  * SigLIP's text canonicalization (tokenization_siglip.py
    canonicalize_text: strip punctuation, collapse whitespace) and
    whitespace -> "▁" normalization with a leading "▁" (the tokenizer
    prepends SPIECE_UNDERLINE itself since add_dummy_prefix is off).

Scope note (no-egress posture): byte-for-byte parity against Google's
released spiece.model cannot be asserted in this environment (that needs
the model file); the algorithm is validated against hand-built unigram
models in tests/test_siglip.py, and `encode` matches
`sentencepiece.SentencePieceProcessor.encode` semantics for NFKC-
normalizable text (the BPE-dropout/sampling options are irrelevant at
inference).
"""
from __future__ import annotations

import string
import unicodedata

import numpy as np

SPIECE_UNDERLINE = "▁"  # ▁


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    x = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << shift
        if not b & 0x80:
            return x, i
        shift += 7


def parse_spiece_model(data: bytes) -> list[tuple[str, float, int]]:
    """Parse a sentencepiece `spiece.model` protobuf into
    [(piece, score, type), ...] in vocab order (index == token id).

    type follows sentencepiece_model.proto: 1=NORMAL, 2=UNKNOWN,
    3=CONTROL, 4=USER_DEFINED, 5=UNUSED, 6=BYTE.
    """
    pieces = []
    i = 0
    n = len(data)
    while i < n:
        key, i = _read_varint(data, i)
        field, wire = key >> 3, key & 7
        if field == 1 and wire == 2:  # repeated SentencePiece
            ln, i = _read_varint(data, i)
            end = i + ln
            piece, score, ptype = "", 0.0, 1
            while i < end:
                k2, i = _read_varint(data, i)
                f2, w2 = k2 >> 3, k2 & 7
                if f2 == 1 and w2 == 2:
                    l2, i = _read_varint(data, i)
                    piece = data[i:i + l2].decode("utf-8")
                    i += l2
                elif f2 == 2 and w2 == 5:
                    score = float(np.frombuffer(data[i:i + 4],
                                                np.float32)[0])
                    i += 4
                elif f2 == 3 and w2 == 0:
                    ptype, i = _read_varint(data, i)
                else:  # skip unknown subfield
                    if w2 == 0:
                        _, i = _read_varint(data, i)
                    elif w2 == 2:
                        l2, i = _read_varint(data, i)
                        i += l2
                    elif w2 == 5:
                        i += 4
                    elif w2 == 1:
                        i += 8
                    else:
                        raise ValueError(f"bad wire type {w2}")
            pieces.append((piece, score, ptype))
        else:  # skip trainer_spec / normalizer_spec / extensions
            if wire == 0:
                _, i = _read_varint(data, i)
            elif wire == 2:
                ln, i = _read_varint(data, i)
                i += ln
            elif wire == 5:
                i += 4
            elif wire == 1:
                i += 8
            else:
                raise ValueError(f"bad wire type {wire}")
    return pieces


def write_spiece_model(pieces: list[tuple[str, float, int]]) -> bytes:
    """Serialize [(piece, score, type)] into the subset of
    sentencepiece_model.proto that parse_spiece_model reads — used by the
    tests to build tiny vocabularies without the sentencepiece library."""
    out = bytearray()

    def varint(x: int) -> bytes:
        b = bytearray()
        while True:
            if x < 0x80:
                b.append(x)
                return bytes(b)
            b.append((x & 0x7F) | 0x80)
            x >>= 7

    for piece, score, ptype in pieces:
        body = bytearray()
        pb = piece.encode("utf-8")
        body += b"\x0a" + varint(len(pb)) + pb            # field 1, wire 2
        body += b"\x15" + np.float32(score).tobytes()     # field 2, wire 5
        body += b"\x18" + varint(ptype)                   # field 3, wire 0
        out += b"\x0a" + varint(len(body)) + bytes(body)  # ModelProto.pieces
    return bytes(out)


class SigLIPTokenizer:
    """Unigram encoder with SiglipTokenizer's text preprocessing.

    __call__(texts) -> (N, context_length) int32 ids: canonicalized text
    segmented by Viterbi, eos appended, right-padded with the pad id to
    the FULL context (SigLIP pools the last position, so fixed-length
    padding is part of the model contract, not a batching convenience).
    """

    def __init__(self, pieces: list[tuple[str, float, int]],
                 context_length: int = 64, eos: str = "</s>",
                 unk: str = "<unk>", pad: str | None = None):
        self.pieces = pieces
        self.context_length = context_length
        self.vocab = {p: i for i, (p, _, _) in enumerate(pieces)}
        self.scores = {p: s for (p, s, _) in pieces}
        self.eos_id = self.vocab[eos]
        self.unk_id = next((i for i, (_, _, t) in enumerate(pieces)
                            if t == 2), self.vocab.get(unk, 0))
        # pad defaults to eos (SiglipTokenizer: pad_token "</s>").
        self.pad_id = self.vocab[pad] if pad else self.eos_id
        self.max_piece_len = max((len(p) for p, _, t in pieces
                                  if t in (1, 4)), default=1)
        scores = [s for _, s, t in pieces if t == 1]
        self.unk_score = (min(scores) if scores else 0.0) - 10.0

    @classmethod
    def from_dir(cls, model_dir: str, context_length: int = 64):
        import os
        path = os.path.join(model_dir, "spiece.model")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"no spiece.model under {model_dir} (SigLIP checkpoints "
                "ship their sentencepiece model alongside the weights)")
        with open(path, "rb") as f:
            return cls(parse_spiece_model(f.read()), context_length)

    @staticmethod
    def canonicalize(text: str) -> str:
        """tokenization_siglip.py canonicalize_text: remove punctuation,
        collapse whitespace, strip. (transformers stores do_lower_case
        but does not apply it in the encode path; we match the
        implementation, which is the parity target.)"""
        text = text.translate(str.maketrans("", "", string.punctuation))
        return " ".join(text.split())

    def _viterbi(self, s: str) -> list[int]:
        """Max-score segmentation of `s` into vocabulary pieces."""
        n = len(s)
        INF = float("inf")
        best = [-INF] * (n + 1)
        back: list[tuple[int, int]] = [(-1, -1)] * (n + 1)
        best[0] = 0.0
        for i in range(n):
            if best[i] == -INF:
                continue
            for L in range(1, min(self.max_piece_len, n - i) + 1):
                cand = s[i:i + L]
                sc = self.scores.get(cand)
                if sc is None or cand not in self.vocab:
                    continue
                t = best[i] + sc
                if t > best[i + L]:
                    best[i + L] = t
                    back[i + L] = (i, self.vocab[cand])
            # unk fallback: one character
            t = best[i] + self.unk_score
            if t > best[i + 1]:
                best[i + 1] = t
                back[i + 1] = (i, self.unk_id)
        ids = []
        j = n
        while j > 0:
            i, tid = back[j]
            ids.append(tid)
            j = i
        return ids[::-1]

    def encode(self, text: str) -> list[int]:
        text = unicodedata.normalize("NFKC", self.canonicalize(text))
        s = SPIECE_UNDERLINE + text.replace(" ", SPIECE_UNDERLINE)
        return self._viterbi(s)

    def __call__(self, texts: list[str]) -> np.ndarray:
        L = self.context_length
        out = np.full((len(texts), L), self.pad_id, np.int32)
        for r, t in enumerate(texts):
            ids = self.encode(t)[:L - 1] + [self.eos_id]
            out[r, :len(ids)] = ids
        return out
