"""Automatic mask generation on the SAM2-equivalent model (TPU-batched).

Mirrors SAM2AutomaticMaskGenerator semantics at the reference's settings
(reference vggt_slam/semantic_embedder.py:59-67: points_per_side=24,
pred_iou_thresh=0.9, stability_score_thresh=0.92, crop_n_layers=1,
crop_n_points_downscale_factor=2, min_mask_region_area=100):

  point grid -> batched multimask decode -> IoU-prediction filter ->
  stability-score filter -> box NMS within each crop -> overlapping
  image crops -> cross-crop dedup NMS -> small-region cleanup (cv2).

TPU-first: the whole per-chunk decode (prompt encode, two-way
transformer, upscaling, stability scores, mask boxes/areas) is ONE jit
with static shapes; the torch implementation's per-mask python loops
(stability, box extraction) run on device as batched reductions, and
only the NMS bookkeeping and final uncropping stay on host numpy.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from vggt_slam_tpu.models.sam2 import (SAM2Config, SAM2ImageModel,
                                       convert_torch_state_dict)


def build_point_grid(n_per_side: int) -> np.ndarray:
    """n x n grid of points in [0,1]^2 (xy), offset half a cell."""
    offset = 1.0 / (2 * n_per_side)
    side = np.linspace(offset, 1.0 - offset, n_per_side)
    xx, yy = np.meshgrid(side, side)
    return np.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)


def generate_crop_boxes(im_hw, n_layers: int, overlap_ratio: float):
    """Full image + n_layers of overlapping 2^i x 2^i crop grids
    (xyxy boxes, layer index per box)."""
    im_h, im_w = im_hw
    boxes, layers = [[0, 0, im_w, im_h]], [0]
    short = min(im_h, im_w)
    for layer in range(n_layers):
        n_side = 2 ** (layer + 1)
        overlap = int(overlap_ratio * short * (2 / n_side))

        def crop_len(orig):
            return int(np.ceil((overlap * (n_side - 1) + orig) / n_side))

        cw, ch = crop_len(im_w), crop_len(im_h)
        x0s = [int((cw - overlap) * i) for i in range(n_side)]
        y0s = [int((ch - overlap) * i) for i in range(n_side)]
        for y0 in y0s:
            for x0 in x0s:
                boxes.append([x0, y0, min(x0 + cw, im_w),
                              min(y0 + ch, im_h)])
                layers.append(layer + 1)
    return boxes, layers


def _box_iou(box, boxes):
    x0 = np.maximum(box[0], boxes[:, 0])
    y0 = np.maximum(box[1], boxes[:, 1])
    x1 = np.minimum(box[2], boxes[:, 2])
    y1 = np.minimum(box[3], boxes[:, 3])
    inter = np.clip(x1 - x0, 0, None) * np.clip(y1 - y0, 0, None)
    a = (box[2] - box[0]) * (box[3] - box[1])
    b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / np.maximum(a + b - inter, 1e-9)


def nms(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float):
    """Greedy box NMS; returns kept indices (descending score order)."""
    order = np.argsort(-scores)
    keep = []
    alive = np.ones(len(boxes), bool)
    for i in order:
        if not alive[i]:
            continue
        keep.append(i)
        # self-IoU is 1 > thresh, so i is cleared too and never revisited
        alive &= _box_iou(boxes[i], boxes) <= iou_thresh
    return np.asarray(keep, dtype=np.int64)


def remove_small_regions(mask: np.ndarray, area_thresh: int, mode: str):
    """Drop `mode`="islands" (components) or "holes" below area_thresh
    (cv2 connected components, as the torch AMG's postprocessing)."""
    import cv2
    correct_holes = mode == "holes"
    working = (correct_holes ^ mask).astype(np.uint8)
    n, regions, stats, _ = cv2.connectedComponentsWithStats(working, 8)
    sizes = stats[:, -1][1:]
    small = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small:
        return mask, False
    fill = [0] + small
    if not correct_holes:
        fill = [i for i in range(n) if i not in fill] or [
            int(np.argmax(sizes)) + 1]
    return np.isin(regions, fill), True


@functools.partial(jax.jit, static_argnames=("model",))
def _embed(model, params, image):
    return model.apply(params, image, method=SAM2ImageModel.embed_image)


@functools.partial(jax.jit, static_argnames=("model", "offset"))
def _decode_chunk(model, params, feats, points, offset=1.0):
    """One point chunk -> per-mask logits + on-device filter statistics.

    Returns (masks (C*3, h, w) logits, iou (C*3,), stability (C*3,),
    boxes (C*3, 4) xyxy in mask-resolution coords, areas (C*3,)).
    """
    masks, iou, _ = model.apply(params, feats, points,
                                method=SAM2ImageModel.decode_points)
    C, M, h, w = masks.shape
    masks = masks.reshape(C * M, h, w).astype(jnp.float32)
    iou = iou.reshape(C * M)
    hi = (masks > offset).sum(axis=(1, 2)).astype(jnp.float32)
    lo = (masks > -offset).sum(axis=(1, 2)).astype(jnp.float32)
    stability = hi / jnp.maximum(lo, 1.0)
    binm = masks > 0.0
    area = binm.sum(axis=(1, 2))
    ys = jnp.where(binm.any(axis=2),
                   jnp.arange(h)[None, :], jnp.iinfo(jnp.int32).max)
    xs = jnp.where(binm.any(axis=1),
                   jnp.arange(w)[None, :], jnp.iinfo(jnp.int32).max)
    y0, x0 = ys.min(axis=1), xs.min(axis=1)
    y1 = jnp.where(binm.any(axis=2), jnp.arange(h)[None, :], -1).max(axis=1)
    x1 = jnp.where(binm.any(axis=1), jnp.arange(w)[None, :], -1).max(axis=1)
    empty = area == 0
    boxes = jnp.stack([jnp.where(empty, 0, x0), jnp.where(empty, 0, y0),
                       jnp.where(empty, 0, x1 + 1),
                       jnp.where(empty, 0, y1 + 1)], axis=-1)
    return masks, iou, stability, boxes, area


class SAM2MaskGenerator:
    """Callable matching the embedder's mask_generator interface:
    image (H, W, 3) uint8/float RGB -> list of dicts (segmentation,
    area, bbox XYWH, predicted_iou, stability_score, point_coords,
    crop_box) sorted by descending area (torch AMG output_mode
    "binary_mask" ordering is by NMS score; area-descending matches the
    embedder's painting policy of later-overwrites-smaller)."""

    def __init__(self, params, cfg: Optional[SAM2Config] = None,
                 points_per_side: int = 24, points_per_batch: int = 192,
                 pred_iou_thresh: float = 0.9,
                 stability_score_thresh: float = 0.92,
                 stability_score_offset: float = 1.0,
                 box_nms_thresh: float = 0.7, crop_n_layers: int = 1,
                 crop_nms_thresh: float = 0.7,
                 crop_overlap_ratio: float = 512 / 1500,
                 crop_n_points_downscale_factor: int = 2,
                 min_mask_region_area: int = 100):
        self.cfg = cfg or SAM2Config.base_plus()
        self.model = SAM2ImageModel(self.cfg)
        self.params = params
        self.point_grids = [
            build_point_grid(
                max(1, points_per_side // (crop_n_points_downscale_factor
                                           ** i)))
            for i in range(crop_n_layers + 1)]
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.box_nms_thresh = box_nms_thresh
        self.crop_n_layers = crop_n_layers
        self.crop_nms_thresh = crop_nms_thresh
        self.crop_overlap_ratio = crop_overlap_ratio
        self.min_mask_region_area = min_mask_region_area

    # -- per-crop ---------------------------------------------------------
    def _process_crop(self, image, crop_box, layer_idx):
        import cv2
        x0, y0, x1, y1 = crop_box
        crop = image[y0:y1, x0:x1]
        ch, cw = crop.shape[:2]
        S = self.cfg.img_size
        resized = cv2.resize(crop, (S, S), interpolation=cv2.INTER_LINEAR)
        feats = _embed(self.model, self.params,
                       jnp.asarray(resized[None], jnp.float32))

        grid = self.point_grids[layer_idx]
        pts_model = (grid * S).astype(np.float32)      # model-frame xy
        B = self.points_per_batch
        n = len(pts_model)
        pad = (-n) % B
        pts_pad = np.concatenate(
            [pts_model, np.zeros((pad, 2), np.float32)])
        masks_l, ious_l, stab_l, boxes_l = [], [], [], []
        for s in range(0, len(pts_pad), B):
            m, i, st, bx, ar = _decode_chunk(
                self.model, self.params, feats,
                jnp.asarray(pts_pad[s:s + B]),
                offset=self.stability_score_offset)
            take = min(B, n - s) * 3
            keep = (np.asarray(i[:take]) > self.pred_iou_thresh) & \
                   (np.asarray(st[:take]) >= self.stability_score_thresh) & \
                   (np.asarray(ar[:take]) > 0)
            if not keep.any():
                continue
            idx = np.nonzero(keep)[0]
            masks_l.append(np.asarray(m[:take])[idx])
            ious_l.append(np.asarray(i[:take])[idx])
            stab_l.append(np.asarray(st[:take])[idx])
            boxes_l.append(np.asarray(bx[:take])[idx])
        if not masks_l:
            return []
        masks = np.concatenate(masks_l)
        ious = np.concatenate(ious_l)
        stabs = np.concatenate(stab_l)
        boxes = np.concatenate(boxes_l).astype(np.float64)

        # within-crop NMS at mask resolution (score = predicted IoU)
        keep = nms(boxes, ious, self.box_nms_thresh)
        out = []
        hm = masks.shape[1]
        for k in keep:
            # upscale the kept logits to crop size, uncrop to full frame
            logit = cv2.resize(masks[k], (cw, ch),
                               interpolation=cv2.INTER_LINEAR)
            seg = np.zeros(image.shape[:2], dtype=bool)
            seg[y0:y1, x0:x1] = logit > 0.0
            area = int(seg.sum())
            if area == 0:
                continue
            bx = boxes[k].copy()
            bx[0::2] = bx[0::2] * (cw / hm) + x0   # mask res is square;
            bx[1::2] = bx[1::2] * (ch / hm) + y0   # crop may not be
            out.append({
                "segmentation": seg, "area": area,
                "bbox": [float(bx[0]), float(bx[1]),
                         float(bx[2] - bx[0]), float(bx[3] - bx[1])],
                "predicted_iou": float(ious[k]),
                "stability_score": float(stabs[k]),
                "crop_box": list(crop_box),
            })
        return out

    def __call__(self, image_rgb: np.ndarray):
        img = image_rgb
        if img.dtype != np.uint8:
            arr = np.asarray(img, np.float32)
            if arr.max() <= 1.5:
                arr = arr * 255.0
            img = np.clip(arr, 0, 255).astype(np.uint8)
        crop_boxes, layer_idxs = generate_crop_boxes(
            img.shape[:2], self.crop_n_layers, self.crop_overlap_ratio)
        data = []
        for cb, li in zip(crop_boxes, layer_idxs):
            data.extend(self._process_crop(img, cb, li))
        if len(crop_boxes) > 1 and data:
            # prefer masks from smaller crops (torch AMG: score =
            # 1 / crop box area)
            boxes = np.asarray([[d["bbox"][0], d["bbox"][1],
                                 d["bbox"][0] + d["bbox"][2],
                                 d["bbox"][1] + d["bbox"][3]]
                                for d in data])
            scores = np.asarray(
                [1.0 / max((c[2] - c[0]) * (c[3] - c[1]), 1)
                 for c in (d["crop_box"] for d in data)], np.float64)
            keep = nms(boxes, scores, self.crop_nms_thresh)
            data = [data[k] for k in keep]
        if self.min_mask_region_area > 0:
            data = self._postprocess_small(data)
        data.sort(key=lambda d: -d["area"])
        return data

    def _postprocess_small(self, data):
        out, boxes, scores = [], [], []
        for d in data:
            seg, ch1 = remove_small_regions(
                d["segmentation"], self.min_mask_region_area, "holes")
            seg, ch2 = remove_small_regions(
                seg, self.min_mask_region_area, "islands")
            area = int(seg.sum())
            if area == 0:
                continue
            d = dict(d, segmentation=seg, area=area)
            ys, xs = np.nonzero(seg)
            d["bbox"] = [float(xs.min()), float(ys.min()),
                         float(xs.max() - xs.min() + 1),
                         float(ys.max() - ys.min() + 1)]
            out.append(d)
            boxes.append([d["bbox"][0], d["bbox"][1],
                          d["bbox"][0] + d["bbox"][2],
                          d["bbox"][1] + d["bbox"][3]])
            # unchanged masks get score 1 so NMS drops the regenerated
            # duplicates (torch AMG: changed masks score 0)
            scores.append(0.0 if (ch1 or ch2) else 1.0)
        if not out:
            return out
        keep = nms(np.asarray(boxes, np.float64),
                   np.asarray(scores, np.float64), self.box_nms_thresh)
        return [out[k] for k in sorted(keep)]


def load_params(checkpoint_path: str, cfg: Optional[SAM2Config] = None):
    """Load SAM2ImageModel params from a converted .npz or a public
    torch .pt checkpoint (sam2.1_hiera_*.pt)."""
    cfg = cfg or SAM2Config.base_plus()
    if checkpoint_path.endswith(".pt") or checkpoint_path.endswith(".pth"):
        import torch
        sd = torch.load(checkpoint_path, map_location="cpu",
                        weights_only=True)
        if "model" in sd:
            sd = sd["model"]
        return convert_torch_state_dict(sd, cfg)
    import numpy as _np
    flat = dict(_np.load(checkpoint_path))
    tree = {}
    for k, v in flat.items():
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def make_sam2_mask_generator(checkpoint: Optional[str] = None,
                             cfg: Optional[SAM2Config] = None,
                             seed: int = 0, **amg_kwargs):
    """Build the embedder's mask_generator callable. With a checkpoint
    the masks are real SAM2 proposals; without one the model runs
    randomly initialized (pipeline-exercising only — use the
    Felzenszwalb proposer for weight-free quality, see
    evals/results/mask_quality.csv)."""
    cfg = cfg or SAM2Config.base_plus()
    if checkpoint:
        params = load_params(checkpoint, cfg)
    else:
        model = SAM2ImageModel(cfg)
        params = model.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, cfg.img_size, cfg.img_size, 3)),
            jnp.zeros((1, 2)), method=SAM2ImageModel.full_init)
    return SAM2MaskGenerator(params, cfg, **amg_kwargs)
