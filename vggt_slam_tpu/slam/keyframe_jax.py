"""On-device Shi-Tomasi + pyramidal Lucas-Kanade tracking (pure JAX).

TPU-native keyframe gate: same algorithm and parameters as the reference's
OpenCV path (frame_overlap.py:126-146 - Shi-Tomasi max 1000 corners,
quality 0.01, min distance 8; LK 21x21 window, 3 pyramid levels, 30
iterations, eps 0.01) but fully jittable with static shapes: corners are a
fixed-capacity (K, 2) array with a validity mask, per-corner LK runs
vmapped, and the whole detect/track pair compiles once per image size.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _filter_axis0(img: jax.Array, k: jax.Array) -> jax.Array:
    """1D filter along axis 0 (rows direction), SAME edge padding."""
    pad = k.shape[0] // 2
    x = jnp.pad(img, ((pad, pad), (0, 0)), mode="edge")
    return jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"),
                    in_axes=1, out_axes=1)(x)


def _filter_axis1(img: jax.Array, k: jax.Array) -> jax.Array:
    """1D filter along axis 1 (columns direction), SAME edge padding."""
    pad = k.shape[0] // 2
    x = jnp.pad(img, ((0, 0), (pad, pad)), mode="edge")
    return jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(x)


def _sep_filter(img: jax.Array, k: jax.Array) -> jax.Array:
    """Separable 2D smoothing filter k (x) k with SAME padding."""
    return _filter_axis1(_filter_axis0(img, k), k)


def _gauss_kernel(sigma: float, n: int) -> jax.Array:
    r = jnp.arange(n, dtype=jnp.float32) - (n - 1) / 2
    k = jnp.exp(-0.5 * (r / sigma) ** 2)
    return k / k.sum()


def _sobel(img: jax.Array):
    """Central-difference image gradients (gx along x/axis1, gy along y)."""
    # note: convolve flips the kernel, so [0.5, 0, -0.5] yields the
    # central difference (I[x+1] - I[x-1]) / 2.
    d = jnp.asarray([0.5, 0.0, -0.5], img.dtype)
    gx = _filter_axis1(img, d)
    gy = _filter_axis0(img, d)
    return gx, gy


def _pyramid(img: jax.Array, levels: int):
    pyr = [img]
    k = _gauss_kernel(1.0, 5)
    for _ in range(levels - 1):
        blurred = _sep_filter(pyr[-1], k)
        pyr.append(blurred[::2, ::2])
    return pyr


@functools.partial(jax.jit, static_argnames=("max_corners", "cell"))
def shi_tomasi(gray: jax.Array, max_corners: int = 1000,
               quality: float = 0.01, cell: int = 8):
    """Corner detection. Returns (pts (K, 2) float32 (x, y), valid (K,) bool).

    Min-distance is enforced by 8x8-cell non-max suppression (one corner per
    cell), mirroring the reference's minDistance=8.
    """
    g = gray.astype(jnp.float32)
    gx, gy = _sobel(g)
    k = jnp.ones((7,), jnp.float32) / 7.0
    Ixx = _sep_filter(gx * gx, k)
    Iyy = _sep_filter(gy * gy, k)
    Ixy = _sep_filter(gx * gy, k)
    tr = Ixx + Iyy
    det = Ixx * Iyy - Ixy * Ixy
    # Min eigenvalue of the 2x2 structure tensor.
    score = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))

    H, W = g.shape
    Hc, Wc = H // cell, W // cell
    sc = score[:Hc * cell, :Wc * cell].reshape(Hc, cell, Wc, cell)
    sc = sc.transpose(0, 2, 1, 3).reshape(Hc, Wc, cell * cell)
    cell_best = jnp.argmax(sc, axis=-1)
    cell_score = jnp.max(sc, axis=-1)

    flat_scores = cell_score.ravel()
    k_top = min(max_corners, flat_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(flat_scores, k_top)
    cy = top_idx // Wc
    cx = top_idx % Wc
    sub = cell_best.ravel()[top_idx]
    py = cy * cell + sub // cell
    px = cx * cell + sub % cell
    valid = top_scores > quality * jnp.max(top_scores)
    # border margin for the 21x21 LK window
    m = 11
    valid &= (px >= m) & (px < W - m) & (py >= m) & (py < H - m)
    pts = jnp.stack([px, py], axis=-1).astype(jnp.float32)
    if k_top < max_corners:
        pts = jnp.pad(pts, ((0, max_corners - k_top), (0, 0)))
        valid = jnp.pad(valid, (0, max_corners - k_top))
    return pts, valid


def _sample_patch(img: jax.Array, center: jax.Array, win: int):
    """Bilinear (win, win) patch around fractional center (x, y)."""
    r = (win - 1) / 2.0
    dy, dx = jnp.meshgrid(jnp.arange(win, dtype=jnp.float32) - r,
                          jnp.arange(win, dtype=jnp.float32) - r,
                          indexing="ij")
    ys = center[1] + dy
    xs = center[0] + dx
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    wy = ys - y0
    wx = xs - x0
    H, W = img.shape

    def at(yy, xx):
        yy = jnp.clip(yy, 0, H - 1)
        xx = jnp.clip(xx, 0, W - 1)
        return img[yy, xx]

    return ((1 - wy) * (1 - wx) * at(y0, x0) + (1 - wy) * wx * at(y0, x0 + 1)
            + wy * (1 - wx) * at(y0 + 1, x0) + wy * wx * at(y0 + 1, x0 + 1))


@functools.partial(jax.jit, static_argnames=("levels", "win", "iters"))
def lk_track(prev_gray: jax.Array, curr_gray: jax.Array, pts: jax.Array,
             valid: jax.Array, levels: int = 3, win: int = 21,
             iters: int = 30, eps: float = 0.01):
    """Pyramidal LK: track pts (K,2) from prev to curr.

    Returns (next_pts (K,2), status (K,) bool).
    """
    prev = prev_gray.astype(jnp.float32)
    curr = curr_gray.astype(jnp.float32)
    pyr_p = _pyramid(prev, levels)
    pyr_c = _pyramid(curr, levels)
    grads = [( _sobel(p)[0], _sobel(p)[1]) for p in pyr_p]
    H, W = prev.shape

    def track_one(pt, ok):
        d = jnp.zeros(2, jnp.float32)
        for lv in range(levels - 1, -1, -1):
            scale = 2.0 ** lv
            p_lv = pt / scale
            img_p, img_c = pyr_p[lv], pyr_c[lv]
            gx, gy = grads[lv]
            T = _sample_patch(img_p, p_lv, win)
            Gx = _sample_patch(gx, p_lv, win)
            Gy = _sample_patch(gy, p_lv, win)
            G = jnp.array([[jnp.sum(Gx * Gx), jnp.sum(Gx * Gy)],
                           [jnp.sum(Gx * Gy), jnp.sum(Gy * Gy)]])
            Ginv = jnp.linalg.inv(G + 1e-6 * jnp.eye(2, dtype=jnp.float32)).astype(jnp.float32)

            def body(_, dd):
                I = _sample_patch(img_c, p_lv + dd, win)
                err = I - T
                b = jnp.array([jnp.sum(err * Gx), jnp.sum(err * Gy)])
                return (dd - Ginv @ b).astype(jnp.float32)

            d = jax.lax.fori_loop(0, iters, body, d / scale) * scale
        next_pt = pt + d
        inb = (next_pt[0] >= 0) & (next_pt[0] < W) & \
              (next_pt[1] >= 0) & (next_pt[1] < H)
        return next_pt, ok & inb

    next_pts, status = jax.vmap(track_one)(pts, valid)
    return next_pts, status


class LKTracker:
    """Host-facing wrapper matching the FrameTracker backend protocol."""

    def __init__(self, max_corners: int = 1000):
        self.max_corners = max_corners

    def detect(self, gray: np.ndarray) -> np.ndarray:
        pts, valid = shi_tomasi(jnp.asarray(gray), max_corners=self.max_corners)
        pts = np.asarray(pts)[np.asarray(valid)]
        return pts.reshape(-1, 1, 2).astype(np.float32)

    def track(self, prev_gray, curr_gray, kf_pts):
        pts = np.asarray(kf_pts, dtype=np.float32).reshape(-1, 2)
        K = self.max_corners
        n = pts.shape[0]
        padded = np.zeros((K, 2), np.float32)
        padded[:n] = pts[:K]
        valid = np.zeros((K,), bool)
        valid[:min(n, K)] = True
        nxt, status = lk_track(jnp.asarray(prev_gray), jnp.asarray(curr_gray),
                               jnp.asarray(padded), jnp.asarray(valid))
        status = np.asarray(status)[:n]
        nxt = np.asarray(nxt)[:n]
        return pts[status], nxt[status]
