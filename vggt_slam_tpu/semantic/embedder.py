"""Offline dense semantic embedding pipeline (SAM2+CLIP-style).

Counterpart of reference vggt_slam/semantic_embedder.py: turn each image
into a dense (H, W, d) semantic-feature map saved as `{stem}.npz` with key
"embedding" at VGGT resolution - the exact disk interface the SLAM driver
consumes (reference main.py:99-111, solver.py:449-465).

The reference pipeline is: SAM2 automatic masks -> black-background bbox
crops -> CLIP image embedding per crop -> paint the mask regions (later
masks overwrite). SAM2 checkpoints aren't shipped here, so the pipeline is
built around two injectable callables:

  mask_generator(image_rgb) -> list[dict(segmentation=(H,W) bool, area=int)]
  crop_encoder(crops (N, 3, h, w) float [0,1]) -> (N, d) embeddings

with HF `transformers` CLIP/SigLIP wiring when a local checkpoint directory
is available, and a deterministic grid-mask + color-hash fallback so the
full voxelization/query path runs end-to-end in any environment.
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np


def grid_mask_generator(image_rgb: np.ndarray, grid: int = 8):
    """Fallback mask proposer: a regular grid of square segments."""
    H, W = image_rgb.shape[:2]
    masks = []
    hs, ws = H // grid, W // grid
    for i in range(grid):
        for j in range(grid):
            seg = np.zeros((H, W), dtype=bool)
            seg[i * hs:(i + 1) * hs or H, j * ws:(j + 1) * ws or W] = True
            masks.append({"segmentation": seg, "area": int(seg.sum())})
    return masks


def felzenszwalb_mask_generator(image_rgb: np.ndarray, k: float = 300.0,
                                min_size: int = 100, sigma: float = 0.8,
                                max_masks: int = 64):
    """Weight-free segment proposer: graph-based segmentation (native C++).

    Stands in for SAM2 automatic mask generation (reference
    semantic_embedder.py:56-67) where no checkpoint is available: regions
    follow image boundaries, so painted embeddings are segment-shaped
    rather than grid-shaped. min_size mirrors SAM2's
    min_mask_region_area=100; the largest `max_masks` components are kept
    (SAM2 caps proposals via its point grid similarly).
    """
    from vggt_slam_tpu.native import felzenszwalb as _fz

    img = image_rgb
    if img.dtype != np.float32:
        img = img.astype(np.float32)
    if img.max() <= 1.5:
        img = img * 255.0  # published k values assume [0,255] units
    labels, n = _fz.segment(img, k=k, min_size=min_size, sigma=sigma)
    areas = np.bincount(labels.reshape(-1), minlength=n)
    keep = np.argsort(-areas)[:max_masks]
    return [{"segmentation": labels == lab, "area": int(areas[lab])}
            for lab in keep if areas[lab] >= min_size]


def color_hash_encoder(crops: np.ndarray, dim: int = 64) -> np.ndarray:
    """Fallback crop encoder: random-projected color statistics (L2-normed)."""
    stats = []
    for c in crops:
        mean = c.mean(axis=(1, 2))
        std = c.std(axis=(1, 2))
        hist = np.histogram(c, bins=10, range=(0, 1))[0] / c.size
        stats.append(np.concatenate([mean, std, hist]))
    stats = np.asarray(stats, dtype=np.float32)
    rng = np.random.default_rng(0)
    proj = rng.normal(size=(stats.shape[1], dim)).astype(np.float32)
    emb = stats @ proj
    return emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-8)


def hash_text_encoder(texts: list[str], dim: int = 64) -> np.ndarray:
    """Fallback text encoder paired with color_hash_encoder: deterministic
    random projection of character statistics (L2-normed). Exercises the
    text-query machinery end-to-end without a checkpoint; NOT semantic."""
    rng = np.random.default_rng(1)
    proj = rng.normal(size=(256, dim)).astype(np.float32)
    out = []
    for t in texts:
        hist = np.bincount(np.frombuffer(t.encode(), np.uint8),
                           minlength=256).astype(np.float32)
        out.append(hist / (np.linalg.norm(hist) + 1e-8))
    emb = np.asarray(out) @ proj
    return emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-8)


def render_masks_overlay(image_rgb: np.ndarray, masks: list,
                         alpha: float = 0.5, seed: int = 0) -> np.ndarray:
    """Color overlay of segment masks on the image (reference
    semantic_embedder.py:395-421): each mask alpha-blended with a
    deterministic random color. (H, W, 3) float [0,1] or uint8 in ->
    uint8 RGB out. Pure numpy, testable headless."""
    img = image_rgb
    if img.dtype != np.uint8:
        img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    rng = np.random.default_rng(seed)
    overlay = img.astype(np.float32).copy()
    base = img.astype(np.float32)
    for m in masks:
        seg = m["segmentation"]
        color = rng.integers(0, 256, size=3).astype(np.float32)
        overlay[seg] = (1.0 - alpha) * base[seg] + alpha * color
    return np.clip(overlay, 0, 255).astype(np.uint8)


def make_hf_clip_encoder(model_dir: str):
    """CLIP/SigLIP crop + text encoders from a local transformers checkpoint."""
    import torch
    from transformers import AutoModel, AutoProcessor

    model = AutoModel.from_pretrained(model_dir)
    processor = AutoProcessor.from_pretrained(model_dir)
    model.eval()

    @torch.no_grad()
    def encode_crops(crops: np.ndarray) -> np.ndarray:
        imgs = [np.transpose(c, (1, 2, 0)) for c in crops]
        inputs = processor(images=[np.uint8(i * 255) for i in imgs],
                           return_tensors="pt")
        feats = model.get_image_features(**inputs)
        feats = feats / feats.norm(dim=-1, keepdim=True)
        return feats.numpy()

    @torch.no_grad()
    def encode_text(texts: list[str]) -> np.ndarray:
        inputs = processor(text=texts, return_tensors="pt", padding=True)
        feats = model.get_text_features(**inputs)
        feats = feats / feats.norm(dim=-1, keepdim=True)
        return feats.numpy()

    return encode_crops, encode_text


def resolve_clip_encoders(model_dir: str, backend: str = "auto"):
    """Pick crop/text encoders for a local checkpoint dir.

    `native` = the in-repo flax towers (models/clip for CLIP-type
    checkpoints, models/siglip for SigLIP-type — both batched on device);
    `hf` = host-torch transformers; `auto` = native for both families
    (the reference treats them interchangeably,
    reference semantic_embedder.py:48), hf for anything else.
    """
    if backend not in ("auto", "native", "hf"):
        raise ValueError(f"unknown clip backend {backend!r}")
    model_type = None
    if backend in ("auto", "native"):
        import json
        try:
            with open(os.path.join(model_dir, "config.json")) as f:
                model_type = json.load(f).get("model_type")
        except OSError:
            model_type = None
        if backend == "auto":
            backend = "native" if model_type in ("clip", "siglip") else "hf"
    if backend == "native":
        if model_type == "siglip":
            from vggt_slam_tpu.models.siglip import make_encoders
            return make_encoders(model_dir)
        from vggt_slam_tpu.models.clip import make_encoders
        return make_encoders(model_dir)
    return make_hf_clip_encoder(model_dir)


class SemanticEmbedder:
    """Dense per-pixel semantic embedding painter."""

    def __init__(self,
                 mask_generator: Optional[Callable] = None,
                 crop_encoder: Optional[Callable] = None,
                 text_encoder: Optional[Callable] = None,
                 target_hw: tuple[int, int] = (518, 518),
                 crop_size: int = 224,
                 bbox_expand_pct: float = 0.0):
        if mask_generator is None:
            # Segment-shaped proposals by default (SAM2 stand-in); the
            # grid is only the no-compiler fallback.
            from vggt_slam_tpu.native import felzenszwalb as _fz
            mask_generator = (felzenszwalb_mask_generator if _fz.available()
                              else grid_mask_generator)
        if bbox_expand_pct < 0:
            raise ValueError("bbox_expand_pct must be >= 0")
        self.mask_generator = mask_generator
        # Track whether text queries run on the non-semantic hash fallbacks:
        # color_hash_encoder (crops) and hash_text_encoder (text) embed into
        # two UNRELATED spaces, so cross-modal cosine scores are arbitrary.
        self.semantic_encoders = (crop_encoder is not None
                                  and text_encoder is not None)
        self.crop_encoder = crop_encoder or color_hash_encoder
        self.text_encoder = text_encoder or hash_text_encoder
        self.target_hw = target_hw
        self.crop_size = crop_size
        self.bbox_expand_pct = float(bbox_expand_pct)

    def _crop(self, image: np.ndarray, seg: np.ndarray) -> np.ndarray:
        """Black-background bbox crop (reference semantic_embedder.py:130-156),
        with optional symmetric bbox expansion by `bbox_expand_pct` of the
        box size, clamped to the image (reference :104-123) - extra context
        around small objects helps CLIP."""
        import cv2

        H, W = image.shape[:2]
        ys, xs = np.where(seg)
        y0, y1 = ys.min(), ys.max() + 1
        x0, x1 = xs.min(), xs.max() + 1
        if self.bbox_expand_pct > 0:
            ey = int(np.ceil((y1 - y0) * self.bbox_expand_pct / 2))
            ex = int(np.ceil((x1 - x0) * self.bbox_expand_pct / 2))
            y0, y1 = max(0, y0 - ey), min(H, y1 + ey)
            x0, x1 = max(0, x0 - ex), min(W, x1 + ex)
        patch = image[y0:y1, x0:x1].copy()
        patch[~seg[y0:y1, x0:x1]] = 0
        patch = cv2.resize(patch, (self.crop_size, self.crop_size),
                           interpolation=cv2.INTER_LINEAR)
        return np.transpose(patch.astype(np.float32), (2, 0, 1))

    def propose(self, image_rgb: np.ndarray):
        """Resize to target_hw and propose masks, largest-first."""
        import cv2

        th, tw = self.target_hw
        img = cv2.resize(image_rgb, (tw, th), interpolation=cv2.INTER_LINEAR)
        masks = sorted(self.mask_generator(img), key=lambda m: -m["area"])
        return img, masks

    def propose_and_embed(self, image_rgb: np.ndarray):
        """Masks + per-mask embeddings at target resolution: returns
        (resized image, masks sorted largest-first, (N, d) embeddings)."""
        img, masks = self.propose(image_rgb)
        if not masks:
            return img, [], np.zeros((0, 1), np.float32)
        crops = np.stack([self._crop(img, m["segmentation"]) for m in masks])
        embs = np.asarray(self.crop_encoder(crops), dtype=np.float32)
        return img, masks, embs

    def best_match_from_text(self, image_rgb: np.ndarray, text_query: str):
        """Best mask for a text query (reference semantic_embedder.py:
        300-323): cosine similarity between the query's text embedding and
        every mask crop's embedding. Returns (index, segmentation (H,W)
        bool at target_hw, score); (-1, None, -1.0) when no masks.

        With the default hash fallback encoders the image and text spaces
        are unrelated, so the returned score is NOT a semantic similarity —
        a RuntimeWarning flags this at call time."""
        if not self.semantic_encoders:
            import warnings
            warnings.warn(
                "best_match_from_text is running on the non-semantic hash "
                "fallback encoders: the returned mask is arbitrary and the "
                "score is not a CLIP-style similarity. Pass crop_encoder/"
                "text_encoder (e.g. make_hf_clip_encoder) for real queries.",
                RuntimeWarning, stacklevel=2)
        _, masks, embs = self.propose_and_embed(image_rgb)
        if not masks:
            return -1, None, -1.0
        te = np.asarray(self.text_encoder([text_query]),
                        dtype=np.float32).reshape(-1)
        te = te / (np.linalg.norm(te) + 1e-8)
        en = embs / (np.linalg.norm(embs, axis=1, keepdims=True) + 1e-8)
        sims = en @ te
        best = int(np.argmax(sims))
        return best, masks[best]["segmentation"], float(sims[best])

    def save_masks_visualization(self, image_rgb: np.ndarray,
                                 output_path: str, alpha: float = 0.5) -> None:
        """Write the mask-overlay debug render for one image (reference
        semantic_embedder.py:395-421; the bare image when no masks)."""
        import cv2

        img, masks = self.propose(image_rgb)
        vis = render_masks_overlay(img, masks, alpha=alpha)
        d = os.path.dirname(output_path)
        if d:
            os.makedirs(d, exist_ok=True)
        cv2.imwrite(output_path, cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))

    def embed_image(self, image_rgb: np.ndarray) -> np.ndarray:
        """(H, W, 3) float [0,1] RGB -> (target_h, target_w, d) embedding map.

        Masks are painted largest-first so later (smaller, more specific)
        masks overwrite - matching semantic_embedder.py:324-349.
        """
        th, tw = self.target_hw
        _, masks, embs = self.propose_and_embed(image_rgb)
        if not masks:
            return np.zeros((th, tw, 1), dtype=np.float32)
        out = np.zeros((th, tw, embs.shape[-1]), dtype=np.float32)
        for m, e in zip(masks, embs):
            out[m["segmentation"]] = e
        return out

    def embed_folder_to_npz(self, image_dir: str, out_dir: str,
                            limit: int | None = None,
                            shard_index: int = 0, num_shards: int = 1,
                            mask_vis_dir: str | None = None) -> int:
        """Embed every image in a folder to {out_dir}/{stem}.npz.

        Sharding args mirror the reference's round-robin multi-process
        parallelism (semantic_embedder.py:480-566) - shard i of n processes
        the images with index % n == i (shared-nothing, results to disk).
        `mask_vis_dir` additionally writes {stem}.masks.png overlay renders
        (reference's save_masks_visualization debug output).
        """
        from vggt_slam_tpu.data.images import list_image_folder, load_image

        os.makedirs(out_dir, exist_ok=True)
        names = list_image_folder(image_dir)
        if limit:
            names = names[:limit]
        done = 0
        for i, path in enumerate(names):
            if i % num_shards != shard_index:
                continue
            stem = os.path.splitext(os.path.basename(path))[0]
            out_path = os.path.join(out_dir, f"{stem}.npz")
            if os.path.exists(out_path):
                continue
            img = load_image(path).astype(np.float32) / 255.0
            emb = self.embed_image(img)
            np.savez_compressed(out_path, embedding=emb)
            if mask_vis_dir:
                self.save_masks_visualization(
                    img, os.path.join(mask_vis_dir, f"{stem}.masks.png"))
            done += 1
        return done


def _mp_worker(shard_index: int, num_shards: int, image_dir: str,
               out_dir: str, limit, clip_model_dir, target_size: int,
               clip_backend: str = "auto"):
    """Shared-nothing worker: builds its own embedder (models are not
    picklable/fork-safe) and processes images with idx % n == i."""
    crop_encoder = None
    if clip_model_dir:
        crop_encoder, _ = resolve_clip_encoders(clip_model_dir, clip_backend)
    emb = SemanticEmbedder(crop_encoder=crop_encoder,
                           target_hw=(target_size, target_size))
    n = emb.embed_folder_to_npz(image_dir, out_dir, limit=limit,
                                shard_index=shard_index,
                                num_shards=num_shards)
    print(f"[shard {shard_index}/{num_shards}] embedded {n} images")


def embed_folder_multiproc(image_dir: str, out_dir: str, num_procs: int,
                           limit=None, clip_model_dir=None,
                           target_size: int = 518,
                           clip_backend: str = "auto") -> None:
    """Process-parallel folder embedding: round-robin image sharding over
    `num_procs` spawned workers writing npz to a shared out_dir - the
    reference's multi-GPU worker pool (semantic_embedder.py:480-566) with
    processes standing in for GPU ids (this host pins accelerator work to
    the single tunnel chip; CPU-side masks/crops are the bottleneck).
    """
    import multiprocessing as mp

    os.makedirs(out_dir, exist_ok=True)
    ctx = mp.get_context("spawn")
    procs = [ctx.Process(target=_mp_worker,
                         args=(i, num_procs, image_dir, out_dir, limit,
                               clip_model_dir, target_size, clip_backend))
             for i in range(num_procs)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    bad = [p.exitcode for p in procs if p.exitcode != 0]
    if bad:
        raise RuntimeError(f"embedder worker(s) failed: exit codes {bad}")


def main():
    import argparse

    p = argparse.ArgumentParser(description="Offline dense semantic embedder")
    p.add_argument("--image_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--clip_model_dir", default=None,
                   help="local CLIP/SigLIP checkpoint dir; "
                        "fallback color-hash encoder if omitted")
    p.add_argument("--clip_backend", default="auto",
                   choices=["auto", "native", "hf"],
                   help="native = in-repo flax CLIP batched on device; "
                        "hf = host-torch transformers (covers SigLIP); "
                        "auto picks by the checkpoint's model_type")
    p.add_argument("--masker", default="auto",
                   choices=["auto", "felzenszwalb", "grid", "sam2"],
                   help="mask proposer: auto = felzenszwalb when the "
                        "native segmenter builds, else grid; sam2 = the "
                        "SAM2-equivalent AMG (models/sam2; needs "
                        "--sam2_checkpoint for real masks)")
    p.add_argument("--sam2_checkpoint", default=None,
                   help="public sam2.1_hiera_*.pt or converted .npz for "
                        "--masker sam2")
    p.add_argument("--target_size", type=int, default=518)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--shard_index", type=int, default=0)
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--num_procs", type=int, default=1,
                   help="spawn N worker processes sharding the folder "
                        "round-robin (reference's multi-GPU pool)")
    p.add_argument("--mask_vis_dir", default=None,
                   help="also write {stem}.masks.png overlay renders of "
                        "the mask proposals (debug)")
    p.add_argument("--bbox_expand_pct", type=float, default=0.0,
                   help="expand each mask's bbox crop by this fraction "
                        "for extra CLIP context")
    args = p.parse_args()

    if args.num_procs > 1:
        embed_folder_multiproc(args.image_dir, args.out_dir, args.num_procs,
                               limit=args.limit,
                               clip_model_dir=args.clip_model_dir,
                               target_size=args.target_size,
                               clip_backend=args.clip_backend)
        return

    crop_encoder = text_encoder = None
    if args.clip_model_dir:
        crop_encoder, text_encoder = resolve_clip_encoders(
            args.clip_model_dir, args.clip_backend)
    mask_generator = None
    if args.masker == "grid":
        mask_generator = grid_mask_generator
    elif args.masker == "felzenszwalb":
        mask_generator = felzenszwalb_mask_generator
    elif args.masker == "sam2":
        from vggt_slam_tpu.semantic.sam2_amg import make_sam2_mask_generator
        mask_generator = make_sam2_mask_generator(
            checkpoint=args.sam2_checkpoint)
    emb = SemanticEmbedder(mask_generator=mask_generator,
                           crop_encoder=crop_encoder,
                           text_encoder=text_encoder,
                           target_hw=(args.target_size, args.target_size),
                           bbox_expand_pct=args.bbox_expand_pct)
    n = emb.embed_folder_to_npz(args.image_dir, args.out_dir,
                                limit=args.limit,
                                shard_index=args.shard_index,
                                num_shards=args.num_shards,
                                mask_vis_dir=args.mask_vis_dir)
    print(f"embedded {n} images -> {args.out_dir}")


if __name__ == "__main__":
    main()
