"""Camera geometry ops: pose encodings, depth unprojection, P-matrix decomposition.

TPU-native counterparts of the `vggt.utils.geometry` / `vggt.utils.pose_enc`
helpers the reference imports (solver.py:12-14) plus the OpenCV
`decomposeProjectionMatrix` call in submap.py:95. All functions are pure
jax.numpy, batched over the frame axis, jittable.

Conventions (documented because the torch reference isn't vendored here):
* Extrinsics are world->camera OpenCV-style (3,4) [R|t]: X_cam = R X_w + t.
* Pose encoding (9,) = [t(3), quat(4, wxyz), fov(2, fov_h fov_w)], matching
  the shape consumed at reference solver.py:473 (`pose_enc` (S,9) ->
  extrinsic (S,3,4) + intrinsic (S,3,3)).
* Intrinsics: fx = W/(2 tan(fov_w/2)), fy = H/(2 tan(fov_h/2)),
  principal point at (W/2, H/2), zero skew.
* Pixel grid for unprojection uses integer coordinates (u, v) = (x, y) from
  arange, matching the reference's meshgrid-based unprojection.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from vggt_slam_tpu.ops import lie


def pose_encoding_to_extri_intri(pose_enc: jax.Array, image_hw: tuple[int, int]):
    """(..., 9) encoding -> extrinsic (..., 3, 4), intrinsic (..., 3, 3)."""
    H, W = image_hw
    t = pose_enc[..., 0:3]
    q = pose_enc[..., 3:7]
    fov_h = pose_enc[..., 7]
    fov_w = pose_enc[..., 8]
    R = lie.quat_to_rotmat(q)
    extrinsic = jnp.concatenate([R, t[..., None]], axis=-1)

    fy = (H / 2.0) / jnp.tan(fov_h / 2.0)
    fx = (W / 2.0) / jnp.tan(fov_w / 2.0)
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    intrinsic = jnp.stack(
        [fx, zeros, jnp.full_like(fx, W / 2.0),
         zeros, fy, jnp.full_like(fx, H / 2.0),
         zeros, zeros, ones], axis=-1
    ).reshape(pose_enc.shape[:-1] + (3, 3))
    return extrinsic, intrinsic


def extri_intri_to_pose_encoding(extrinsic: jax.Array, intrinsic: jax.Array,
                                 image_hw: tuple[int, int]) -> jax.Array:
    """Inverse of pose_encoding_to_extri_intri (used for training targets)."""
    H, W = image_hw
    R = extrinsic[..., :3, :3]
    t = extrinsic[..., :3, 3]
    q = lie.rotmat_to_quat(R)
    fy = intrinsic[..., 1, 1]
    fx = intrinsic[..., 0, 0]
    fov_h = 2.0 * jnp.arctan((H / 2.0) / fy)
    fov_w = 2.0 * jnp.arctan((W / 2.0) / fx)
    return jnp.concatenate([t, q, fov_h[..., None], fov_w[..., None]], axis=-1)


def unproject_depth_map_to_point_map(depth: jax.Array, extrinsic: jax.Array,
                                     intrinsic: jax.Array) -> jax.Array:
    """Depth maps -> 3D points in the frame-0 ("VGGT world") coordinate system.

    Counterpart of `unproject_depth_map_to_point_map` used at reference
    solver.py:256 (the default, non `--use_point_map` path).

    Args:
        depth: (S, H, W, 1) or (S, H, W).
        extrinsic: (S, 3, 4) world->cam.
        intrinsic: (S, 3, 3).
    Returns:
        (S, H, W, 3) world-frame points.
    """
    if depth.ndim == 4:
        depth = depth[..., 0]
    S, H, W = depth.shape
    u = jnp.arange(W, dtype=depth.dtype)
    v = jnp.arange(H, dtype=depth.dtype)
    uu, vv = jnp.meshgrid(u, v)  # (H, W)
    pix = jnp.stack([uu, vv, jnp.ones_like(uu)], axis=-1)  # (H, W, 3)

    Kinv = jnp.linalg.inv(intrinsic)  # (S,3,3)
    rays = jnp.einsum("sij,hwj->shwi", Kinv, pix)
    cam_pts = rays * depth[..., None]  # (S,H,W,3)

    R = extrinsic[..., :3, :3]
    t = extrinsic[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    world = jnp.einsum("sij,shwj->shwi", Rt, cam_pts - t[:, None, None, :])
    return world


def unproject_depth_map_to_point_map_cf(depth: jax.Array,
                                        extrinsic: jax.Array,
                                        intrinsic: jax.Array) -> jax.Array:
    """Channel-FIRST unprojection: (3, S, H, W) world points.

    Same math as `unproject_depth_map_to_point_map`, but the xyz axis leads
    so the output buffer tiles on (H, W) instead of padding a size-3 minor
    dim to the 128-lane tile (a ~42x physical blowup that also makes
    device<->host transfers of the map pathologically slow through the
    axon tunnel). Use this at jit output boundaries; `np.moveaxis(a, 0,
    -1)` on the host restores the (S, H, W, 3) view for numpy consumers.
    """
    if depth.ndim == 4:
        depth = depth[..., 0]
    S, H, W = depth.shape
    u = jnp.arange(W, dtype=depth.dtype)
    v = jnp.arange(H, dtype=depth.dtype)
    uu, vv = jnp.meshgrid(u, v)
    pix = jnp.stack([uu, vv, jnp.ones_like(uu)], axis=0)  # (3, H, W)

    Kinv = jnp.linalg.inv(intrinsic)  # (S,3,3)
    rays = jnp.einsum("sij,jhw->ishw", Kinv, pix)
    cam_pts = rays * depth[None]  # (3,S,H,W)

    R = extrinsic[..., :3, :3]
    t = extrinsic[..., :3, 3]
    cam_rel = cam_pts - t.T[:, :, None, None]
    return jnp.einsum("sji,jshw->ishw", R, cam_rel)  # R^T applied per frame


def project_points(points_w: jax.Array, extrinsic: jax.Array,
                   intrinsic: jax.Array):
    """World points (..., N, 3) -> pixel coords (..., N, 2) + depth (..., N)."""
    R = extrinsic[..., :3, :3]
    t = extrinsic[..., :3, 3]
    cam = jnp.einsum("...ij,...nj->...ni", R, points_w) + t[..., None, :]
    pix_h = jnp.einsum("...ij,...nj->...ni", intrinsic, cam)
    z = pix_h[..., 2]
    return pix_h[..., :2] / (z[..., None] + 1e-12), z


def rq_decomposition(M: jax.Array):
    """RQ decomposition M = K R with K upper-triangular, R orthonormal.

    Batched over leading dims via the flipped-QR trick; signs fixed so
    diag(K) > 0 (matching cv2.decomposeProjectionMatrix's convention).
    """
    n = M.shape[-1]
    J = jnp.flip(jnp.eye(n, dtype=M.dtype), axis=0)
    A = jnp.swapaxes(J @ M, -1, -2)  # (.., n, n)
    Q, R = jnp.linalg.qr(A)
    K = J @ jnp.swapaxes(R, -1, -2) @ J
    Rot = J @ jnp.swapaxes(Q, -1, -2)
    d = jnp.sign(jnp.diagonal(K, axis1=-2, axis2=-1))
    d = jnp.where(d == 0, 1.0, d)
    D = d[..., None, :] * jnp.eye(n, dtype=M.dtype)
    return K @ D, jnp.swapaxes(D, -1, -2) @ Rot


def decompose_projection_matrix(P: jax.Array):
    """Decompose (..., 3, 4) projection matrices into (K, R, C_homogeneous).

    Counterpart of cv2.decomposeProjectionMatrix as used in reference
    submap.py:95: K upper-triangular with positive diagonal, R the
    world->cam rotation, C the (..., 4) homogeneous camera center (the null
    space of P, scaled arbitrarily - callers divide by C[3]).
    """
    M = P[..., :3, :3]
    K, R = rq_decomposition(M)
    # Camera center: P @ [C;1] = 0  =>  C = -M^-1 p4.
    p4 = P[..., :3, 3]
    C3 = -jnp.linalg.solve(M, p4[..., None])[..., 0]
    C = jnp.concatenate([C3, jnp.ones_like(C3[..., :1])], axis=-1)
    return K, R, C


def poses_world_from_submap(intrinsics: jax.Array, cam2world: jax.Array,
                            H_world_map: jax.Array) -> jax.Array:
    """World-frame SE(3) camera poses of a submap after SL(4) optimization.

    Counterpart of reference Submap.get_all_poses_world (submap.py:91-104):
    build P_i = K_i (T_i)^-1[0:3,:] H_world_map^-1, decompose, and return
    pose = [R^-1 | C/C_w] as (S, 4, 4) cam->world.
    """
    S = cam2world.shape[0]
    world2cam = lie.se3_inverse(cam2world)[:, :3, :]  # (S,3,4)
    Hinv = jnp.linalg.inv(H_world_map)
    P = intrinsics @ world2cam @ Hinv  # (S,3,4)
    _, R, C = decompose_projection_matrix(P)
    Cn = C[..., :3] / C[..., 3:]
    pose = jnp.tile(jnp.eye(4, dtype=cam2world.dtype), (S, 1, 1))
    pose = pose.at[:, :3, :3].set(jnp.linalg.inv(R))
    pose = pose.at[:, :3, 3].set(Cn)
    return pose


def umeyama_sim3(src: jax.Array, dst: jax.Array, with_scale: bool = True):
    """Least-squares Sim(3): find (s, R, t) with dst ~= s R src + t.

    Counterpart of reference alignment.py:73 `umeyama_sim3`.
    Returns (s (), R (3,3), t (3,)).
    """
    n = src.shape[0]
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    X = src - mu_s
    Y = dst - mu_d
    cov = (Y.T @ X) / n
    U, Svals, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    Dfix = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=src.dtype)).at[2, 2].set(d)
    R = U @ Dfix @ Vt
    if with_scale:
        var_src = jnp.sum(X * X) / n
        s = jnp.sum(Svals * jnp.diag(Dfix)) / (var_src + 1e-12)
    else:
        s = jnp.asarray(1.0, dtype=src.dtype)
    t = mu_d - s * (R @ mu_s)
    return s, R, t


def sim3_matrix(s, R, t):
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(s * R)
    T = T.at[:3, 3].set(t)
    return T
