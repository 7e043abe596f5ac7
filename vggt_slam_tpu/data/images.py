"""Image loading & preprocessing for the VGGT input pipeline.

Counterpart of the `load_and_preprocess_images` util the reference imports
(solver.py:13, called at solver.py:416): decode on host, resize so width is
518 with height rounded to a multiple of the 14-px patch (392 for 4:3 inputs,
matching the eval resolution evidenced at eval7_scenes_dense.py:20), values
in [0,1], returned as (S, 3, H, W) float32. Portrait inputs are center-cropped
to at most `target_size` rows so token counts stay bounded.
"""
from __future__ import annotations

import os
import re

import numpy as np

TARGET_WIDTH = 518
PATCH = 14


def preprocessed_hw(orig_h: int, orig_w: int,
                    target_width: int = TARGET_WIDTH) -> tuple[int, int]:
    new_h = int(round(orig_h * target_width / orig_w / PATCH)) * PATCH
    new_h = max(PATCH, min(new_h, target_width))
    return new_h, target_width


def load_image(path: str) -> np.ndarray:
    """Decode one image file -> (H, W, 3) uint8 RGB."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f"cannot read image: {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def preprocess_array(img_rgb: np.ndarray,
                     target_width: int = TARGET_WIDTH) -> np.ndarray:
    """(H, W, 3) uint8/float RGB -> (3, h, w) float32 in [0,1] at VGGT res."""
    import cv2

    H, W = img_rgb.shape[:2]
    new_h, new_w = preprocessed_hw(H, W, target_width)
    # Resize to width target keeping aspect, then center-crop rows if the
    # aspect-preserving height overshoots the patch-rounded target.
    interim_h = int(round(H * new_w / W))
    resized = cv2.resize(img_rgb, (new_w, interim_h), interpolation=cv2.INTER_AREA
                         if interim_h < H else cv2.INTER_LINEAR)
    if interim_h != new_h:
        if interim_h > new_h:
            top = (interim_h - new_h) // 2
            resized = resized[top:top + new_h]
        else:
            resized = cv2.resize(img_rgb, (new_w, new_h),
                                 interpolation=cv2.INTER_LINEAR)
    out = resized.astype(np.float32)
    if img_rgb.dtype == np.uint8:
        out /= 255.0
    return np.transpose(out, (2, 0, 1))


def load_and_preprocess_images(paths: list[str],
                               target_width: int = TARGET_WIDTH) -> np.ndarray:
    """List of image paths -> (S, 3, H, W) float32 batch (uniform shape)."""
    imgs = [preprocess_array(load_image(p), target_width) for p in paths]
    shapes = {im.shape for im in imgs}
    if len(shapes) != 1:
        raise ValueError(f"mixed image shapes after preprocess: {shapes}")
    return np.stack(imgs, axis=0)


def sort_images_by_number(image_paths: list[str]) -> list[str]:
    """Numeric filename sort (reference slam_utils.py:15)."""
    def extract(path):
        m = re.search(r"\d+(?:\.\d+)?", os.path.basename(path))
        return float(m.group()) if m else float("inf")
    return sorted(image_paths, key=extract)


def downsample_images(image_names: list[str], factor: int) -> list[str]:
    """Keep every factor-th image (reference slam_utils.py:24)."""
    return image_names[::factor]


def list_image_folder(folder: str) -> list[str]:
    """Glob + filter + numeric sort, mirroring reference main.py:76-81."""
    import glob

    names = [f for f in glob.glob(os.path.join(folder, "*"))
             if not any(t in os.path.basename(f).lower()
                        for t in ("depth", "txt", "json", "db"))]
    return sort_images_by_number(names)
