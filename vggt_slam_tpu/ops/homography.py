"""Batched 3D projective homography estimation (DLT + RANSAC) on device.

TPU-native counterpart of reference vggt_slam/h_solve.py. The reference runs
300 sequential host-side SVDs (`scipy.linalg.null_space` per hypothesis,
h_solve.py:77-94) and scores inliers on GPU (h_solve.py:132-163). Here the
whole pipeline - sampling, the (300, 15, 16) DLT null-space SVD, det
normalization with the reference's identity fallbacks, inlier scoring and
argmax selection - is one jit-compiled program with static shapes.

Dynamic-size inputs (the reference indexes `current_pts[good_mask]`,
solver.py:286-307) are handled the TPU way: all N points are kept with a
float weight mask; hypothesis sampling draws from the mask distribution and
inlier counts are mask-weighted, so semantics match the reference's
masked-subset RANSAC exactly in distribution.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vggt_slam_tpu.ops.lie import apply_homography


def build_dlt_system(X_src: jax.Array, X_dst: jax.Array) -> jax.Array:
    """Build the (..., 3N, 16) DLT system for H s.t. dst ~ H @ src.

    Row pattern per correspondence (reference h_solve.py:61-73): with
    src = (x,y,z,1) and dst = (x',y',z'), rows are
      [-src, 0, 0, x'*src], [0, -src, 0, y'*src], [0, 0, -src, z'*src].
    """
    ones = jnp.ones_like(X_src[..., :1])
    src_h = jnp.concatenate([X_src, ones], axis=-1)  # (...,N,4)
    zeros = jnp.zeros_like(src_h)
    xp = X_dst[..., 0:1]
    yp = X_dst[..., 1:2]
    zp = X_dst[..., 2:3]
    row0 = jnp.concatenate([-src_h, zeros, zeros, xp * src_h], axis=-1)
    row1 = jnp.concatenate([zeros, -src_h, zeros, yp * src_h], axis=-1)
    row2 = jnp.concatenate([zeros, zeros, -src_h, zp * src_h], axis=-1)
    rows = jnp.stack([row0, row1, row2], axis=-2)  # (...,N,3,16)
    return rows.reshape(rows.shape[:-3] + (rows.shape[-3] * 3, 16))


def estimate_3d_homography(X_src: jax.Array, X_dst: jax.Array) -> jax.Array:
    """Batched DLT homography with the reference's fallback semantics.

    Args:
        X_src, X_dst: (B, N, 3) correspondence sets (N >= 5).
    Returns:
        (B, 4, 4) homographies; identity where estimation is degenerate
        (H[3,3] == 0 / det < 1e-4 / non-finite - reference h_solve.py:79-94).
    """
    A = build_dlt_system(X_src, X_dst)  # (B, 3N, 16)
    # Null vector = right singular vector of the smallest singular value.
    _, sv, vt = jnp.linalg.svd(A, full_matrices=True)
    h = vt[..., -1, :]  # (B, 16)
    H = h.reshape(h.shape[:-1] + (4, 4))

    # Multi-dimensional null space (coplanar/degenerate geometry): the
    # solution is not unique, reference scipy null_space returns >1 column
    # and h_solve falls back to identity (h_solve.py:79-93). Null dim > 1
    # iff rank < 15, i.e. the 15th-largest singular value ~ 0 - index 14
    # covers both the minimal 15x16 sample (where it is the smallest) and
    # overdetermined systems (second-smallest).
    bad_null = sv[..., 14] < 1e-6 * sv[..., 0]

    h33 = H[..., 3, 3]
    bad_h33 = (jnp.abs(h33) < 1e-12) | bad_null
    H = H / jnp.where(bad_h33, 1.0, h33)[..., None, None]

    det = jnp.linalg.det(H)
    bad_det = jnp.isnan(det) | (det < 1e-4)
    # det > 0 in the surviving branch, so the real fourth root is safe.
    scale = jnp.where(bad_det, 1.0, det) ** 0.25
    H = H / scale[..., None, None]

    bad = (bad_h33 | bad_det)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=H.dtype), H.shape)
    H = jnp.where(bad | ~jnp.isfinite(H), eye, H)
    # Any non-finite entry anywhere -> identity for that hypothesis.
    finite = jnp.all(jnp.isfinite(H), axis=(-2, -1), keepdims=True)
    return jnp.where(finite, H, eye)


@functools.partial(jax.jit, static_argnames=("max_iter", "sample_size"))
def ransac_projective(
    X1: jax.Array,
    X2: jax.Array,
    weights: jax.Array | None = None,
    *,
    key: jax.Array,
    threshold: float = 0.01,
    max_iter: int = 300,
    sample_size: int = 5,
) -> tuple[jax.Array, jax.Array]:
    """RANSAC SL(4) estimation: find H with X2 ~ H @ X1.

    Counterpart of reference h_solve.py:132 `ransac_projective` (300
    hypotheses x 5-point samples, inlier threshold 0.01, best-count argmax)
    with the host SVD loop replaced by one batched device SVD.

    Args:
        X1, X2: (N, 3) matched points (same pixel grid, two submaps).
        weights: optional (N,) float/bool validity mask; invalid points are
            never sampled and never counted as inliers.
        key: PRNG key for hypothesis sampling.
    Returns:
        (best_H (4,4), best_inlier_count ()) - count is mask-weighted.
    """
    n = X1.shape[0]
    # SVD has no bf16/f16 kernels and sub-f32 precision would sink the DLT
    # anyway; upcast low-precision point maps (the model outputs bf16) here.
    if X1.dtype not in (jnp.float32, jnp.float64):
        X1 = X1.astype(jnp.float32)
    if X2.dtype != X1.dtype:
        X2 = X2.astype(X1.dtype)
    dtype = X1.dtype
    if weights is None:
        weights = jnp.ones((n,), dtype=dtype)
    weights = weights.astype(dtype)
    p = weights / jnp.maximum(weights.sum(), 1e-12)

    idx = jax.random.choice(key, n, shape=(max_iter, sample_size), replace=True, p=p)
    H_ests = estimate_3d_homography(X1[idx], X2[idx])  # (max_iter, 4, 4)

    X2_pred = apply_homography(H_ests, X1[None, :, :])  # (max_iter, N, 3)
    err = jnp.linalg.norm(X2_pred - X2[None, :, :], axis=-1)
    err = jnp.where(jnp.isfinite(err), err, jnp.inf)
    inliers = ((err < threshold) * weights[None, :]).sum(axis=-1)
    best = jnp.argmax(inliers)
    return H_ests[best], inliers[best]


def ransac_projective_np(X1, X2, weights=None, seed: int = 0, **kw):
    """NumPy-friendly wrapper returning a host ndarray (API parity helper)."""
    import numpy as np

    key = jax.random.PRNGKey(seed)
    H, _ = ransac_projective(
        jnp.asarray(X1, dtype=jnp.float32),
        jnp.asarray(X2, dtype=jnp.float32),
        None if weights is None else jnp.asarray(weights, dtype=jnp.float32),
        key=key,
        **kw,
    )
    return np.asarray(H)
