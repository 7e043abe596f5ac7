"""Lie-group / manifold operations for SLAM backends: SO(3), SE(3), Sim(3), SL(4).

TPU-native counterpart of the manifold types the reference gets from GTSAM
(reference: vggt_slam/graph.py:8 `SL4, PriorFactorSL4, BetweenFactorSL4`;
vggt_slam/graph_se3.py:5 `Pose3`). Everything here is pure jax.numpy, jittable,
batched with vmap, and differentiable (the pose-graph solver autodiffs through
`*_log`).

Conventions
-----------
* Retraction is RIGHT multiplication: X.retract(xi) = X @ exp(xi), matching
  GTSAM's Lie-group convention so factor residuals reproduce the reference
  solver's local coordinates (`log(Z^-1 (X_i^-1 X_j))`).
* Quaternions are (w, x, y, z).
* SL(4) tangent basis: 15 generators, the 12 unit off-diagonal matrices
  E_ij = e_i e_j^T (row-major order) followed by 3 traceless diagonal
  generators diag(1,-1,0,0), diag(0,1,-1,0), diag(0,0,1,-1).
  Any fixed basis yields the same optimization fixed points because factor
  noise in the SLAM backend is isotropic (reference graph.py:28 uses
  0.05*ones(15)); only the basis-aligned sigmas differ.

General 4x4 matrix log is implemented with inverse scaling-and-squaring:
Denman-Beavers square roots followed by a Gregory (atanh) series - closed
forms exist for SE(3)/Sim(3) and are used there, but SL(4) needs the general
path. All loops are fixed-length so everything stays jit/Pallas friendly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternions / SO(3)
# ---------------------------------------------------------------------------


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Quaternion (...,4) in (w,x,y,z) order -> rotation matrix (...,3,3)."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
            2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
            2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix (...,3,3) -> quaternion (...,4) (w,x,y,z), w >= 0.

    Branchless Shepperd-style: compute all four candidate quaternions and
    select the best-conditioned one (largest pivot) with jnp.where, so the
    function is vmap/jit safe and has no data-dependent control flow.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by its pivot 4*q_k^2 = 1 + 2*m_kk - tr (or 1+tr).
    qw0 = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx0 = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy0 = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz0 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22,
                        1.0 - m00 - m11 + m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw0, qx0, qy0, qz0], axis=-2)  # (...,4,4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32),
                            axis=-2)[..., 0, :]
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def so3_hat(w: jax.Array) -> jax.Array:
    """(...,3) -> (...,3,3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    m = jnp.stack([z, -wz, wy, wz, z, -wx, -wy, wx, z], axis=-1)
    return m.reshape(w.shape[:-1] + (3, 3))


def so3_exp(w: jax.Array) -> jax.Array:
    """Exponential map so(3) -> SO(3), Rodrigues with Taylor fallback near 0."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    W = so3_hat(w)
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * (W @ W)


def so3_log(R: jax.Array) -> jax.Array:
    """Log map SO(3) -> so(3). Stable for small and near-pi angles.

    The angle comes from atan2(|R - R^T|/2, (tr-1)/2) rather than arccos so
    forward-mode autodiff (used by the pose-graph LM linearization) has
    finite derivatives at the identity.
    """
    cos_theta = jnp.clip((R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2] - 1.0) * 0.5,
                         -1.0, 1.0)
    vee = jnp.stack(
        [R[..., 2, 1] - R[..., 1, 2], R[..., 0, 2] - R[..., 2, 0],
         R[..., 1, 0] - R[..., 0, 1]], axis=-1)
    sin2 = 0.25 * jnp.sum(vee * vee, axis=-1)
    sin_theta = jnp.sqrt(sin2 + 1e-24)
    theta = jnp.arctan2(sin_theta, cos_theta)
    # Generic branch: theta / (2 sin theta) * (R - R^T)^vee, Taylor near 0.
    small = sin2 < 1e-12
    scale = jnp.where(small, 0.5 + theta * theta / 12.0,
                      theta / (2.0 * jnp.where(small, 1.0, sin_theta)))
    w_generic = scale[..., None] * vee

    # Near-pi branch: axis from the diagonal of (R + I)/2.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.maximum((diag + 1.0) * 0.5, 0.0)
    axis = jnp.sqrt(axis2 + 1e-32)
    # Fix signs using off-diagonals (largest-axis pivot).
    k = jnp.argmax(axis2, axis=-1)
    s01 = R[..., 0, 1] + R[..., 1, 0]
    s02 = R[..., 0, 2] + R[..., 2, 0]
    s12 = R[..., 1, 2] + R[..., 2, 1]
    sx = jnp.where(k == 0, 1.0, jnp.where(k == 1, jnp.sign(s01), jnp.sign(s02)))
    sy = jnp.where(k == 1, 1.0, jnp.where(k == 0, jnp.sign(s01), jnp.sign(s12)))
    sz = jnp.where(k == 2, 1.0, jnp.where(k == 0, jnp.sign(s02), jnp.sign(s12)))
    sx = jnp.where(sx == 0, 1.0, sx)
    sy = jnp.where(sy == 0, 1.0, sy)
    sz = jnp.where(sz == 0, 1.0, sz)
    axis = axis * jnp.stack([sx, sy, sz], axis=-1)
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-32)
    w_pi = axis * theta[..., None]

    near_pi = cos_theta < (-1.0 + 1e-6)
    return jnp.where(near_pi[..., None], w_pi, w_generic)


# ---------------------------------------------------------------------------
# SE(3): xi = (rho(3), omega(3)) -- translation first (GTSAM orders (w, v);
# we use (v, w) and keep it consistent everywhere including sigmas).
# ---------------------------------------------------------------------------


def _so3_left_jacobian(w: jax.Array) -> jax.Array:
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    W = so3_hat(w)
    small = theta2 < 1e-8
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + B[..., None, None] * W + C[..., None, None] * (W @ W)


def _so3_left_jacobian_inv(w: jax.Array) -> jax.Array:
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    W = so3_hat(w)
    small = theta2 < 1e-8
    half = theta * 0.5
    cot = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                    (1.0 - half * jnp.cos(half) / (jnp.sin(half) + 1e-32)) / (theta2 + 1e-32))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot[..., None, None] * (W @ W)


def se3_exp(xi: jax.Array) -> jax.Array:
    """(...,6) = (rho, omega) -> (...,4,4)."""
    rho, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    t = jnp.einsum("...ij,...j->...i", _so3_left_jacobian(w), rho)
    T = jnp.zeros(xi.shape[:-1] + (4, 4), dtype=xi.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_log(T: jax.Array) -> jax.Array:
    w = so3_log(T[..., :3, :3])
    rho = jnp.einsum("...ij,...j->...i", _so3_left_jacobian_inv(w), T[..., :3, 3])
    return jnp.concatenate([rho, w], axis=-1)


def se3_inverse(T: jax.Array) -> jax.Array:
    """Closed-form SE(3) inverse (works on (...,4,4) or (...,3,4)).

    Counterpart of the reference's `closed_form_inverse_se3`
    (vggt utils, used at solver.py:263).
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    out = jnp.zeros(T.shape[:-2] + (4, 4), dtype=T.dtype)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(ti)
    out = out.at[..., 3, 3].set(1.0)
    return out


# ---------------------------------------------------------------------------
# Sim(3): xi = (rho(3), omega(3), lambda(1)); exp gives [[s R, t],[0,1]].
# ---------------------------------------------------------------------------


def sim3_exp(xi: jax.Array) -> jax.Array:
    rho, w, lam = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(w)
    s = jnp.exp(lam)
    W = so3_hat(w)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)

    # Sim(3) "W" matrix: integral of exp(lam u) exp(W u) du over [0,1].
    # Coefficients from Strasdat's thesis; series fallbacks for small values.
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)
    small_lam = jnp.abs(lam) < 1e-6
    small_theta = theta2 < 1e-8

    A_den = lam * lam + theta2
    s_cos = s * jnp.cos(theta)
    s_sin = s * jnp.sin(theta)

    C = jnp.where(small_lam, 1.0 + lam / 2.0 + lam * lam / 6.0, (s - 1.0) / jnp.where(small_lam, 1.0, lam))
    A = jnp.where(
        small_theta,
        jnp.where(small_lam, 0.5 + lam / 3.0, (s * (lam - 1.0) + 1.0) / jnp.where(small_lam, 1.0, lam * lam)),
        (s_sin * lam + (1.0 - s_cos) * theta) / (jnp.where(small_theta, 1.0, theta) * A_den + 1e-32),
    )
    B = jnp.where(
        small_theta,
        jnp.where(small_lam, 1.0 / 6.0 + lam / 8.0,
                  (s * (0.5 * lam * lam - lam + 1.0) - 1.0) / jnp.where(small_lam, 1.0, lam ** 3)),
        (C - ((s_cos - 1.0) * lam + s_sin * theta) / (A_den + 1e-32)) / (theta2 + 1e-32),
    )
    Wm = C[..., None, None] * eye + A[..., None, None] * W + B[..., None, None] * (W @ W)
    t = jnp.einsum("...ij,...j->...i", Wm, rho)

    T = jnp.zeros(xi.shape[:-1] + (4, 4), dtype=xi.dtype)
    T = T.at[..., :3, :3].set(s[..., None, None] * R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def sim3_log(T: jax.Array) -> jax.Array:
    sR = T[..., :3, :3]
    s = jnp.linalg.det(sR) ** (1.0 / 3.0)
    R = sR / s[..., None, None]
    w = so3_log(R)
    lam = jnp.log(s)
    # Invert the Sim3 W matrix numerically (3x3 solve; differentiable).
    xi_rw = jnp.concatenate([jnp.zeros_like(w), w, lam[..., None]], axis=-1)
    Wm = _sim3_W(xi_rw)
    rho = jnp.linalg.solve(Wm, T[..., :3, 3][..., None])[..., 0]
    return jnp.concatenate([rho, w, lam[..., None]], axis=-1)


def _sim3_W(xi: jax.Array) -> jax.Array:
    """The Sim(3) translation-coupling matrix W(omega, lambda) from sim3_exp."""
    w, lam = xi[..., 3:6], xi[..., 6]
    W = so3_hat(w)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-32)
    s = jnp.exp(lam)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    small_lam = jnp.abs(lam) < 1e-6
    small_theta = theta2 < 1e-8
    A_den = lam * lam + theta2
    s_cos = s * jnp.cos(theta)
    s_sin = s * jnp.sin(theta)
    C = jnp.where(small_lam, 1.0 + lam / 2.0 + lam * lam / 6.0, (s - 1.0) / jnp.where(small_lam, 1.0, lam))
    A = jnp.where(
        small_theta,
        jnp.where(small_lam, 0.5 + lam / 3.0, (s * (lam - 1.0) + 1.0) / jnp.where(small_lam, 1.0, lam * lam)),
        (s_sin * lam + (1.0 - s_cos) * theta) / (jnp.where(small_theta, 1.0, theta) * A_den + 1e-32),
    )
    B = jnp.where(
        small_theta,
        jnp.where(small_lam, 1.0 / 6.0 + lam / 8.0,
                  (s * (0.5 * lam * lam - lam + 1.0) - 1.0) / jnp.where(small_lam, 1.0, lam ** 3)),
        (C - ((s_cos - 1.0) * lam + s_sin * theta) / (A_den + 1e-32)) / (theta2 + 1e-32),
    )
    return C[..., None, None] * eye + A[..., None, None] * W + B[..., None, None] * (W @ W)


# ---------------------------------------------------------------------------
# General matrix exp/log (for SL(4))
# ---------------------------------------------------------------------------


def inv44(M: jax.Array, refine: int = 1) -> jax.Array:
    """Closed-form (adjugate/cofactor) inverse of (...,4,4) matrices.

    One fused elementwise computation instead of a batched LU - the
    pose-graph residual path evaluates dozens of tiny 4x4 inverses per
    logm, where per-op dispatch overhead of `jnp.linalg.inv` dominates on
    TPU (25x the whole LM solve at a 256-node bucket). The raw adjugate
    loses ~1 digit to cancellation in f32, which compounds through logm's
    Denman-Beavers iterations and raises the LM convergence floor, so
    `refine` Newton steps X <- X(2I - MX) (two fused matmuls each) restore
    LU-level accuracy. Verified against jnp.linalg.inv in tests/test_lie.py.
    """
    m = M
    m00, m01, m02, m03 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2], m[..., 0, 3]
    m10, m11, m12, m13 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2], m[..., 1, 3]
    m20, m21, m22, m23 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2], m[..., 2, 3]
    m30, m31, m32, m33 = m[..., 3, 0], m[..., 3, 1], m[..., 3, 2], m[..., 3, 3]

    s0 = m00 * m11 - m01 * m10
    s1 = m00 * m12 - m02 * m10
    s2 = m00 * m13 - m03 * m10
    s3 = m01 * m12 - m02 * m11
    s4 = m01 * m13 - m03 * m11
    s5 = m02 * m13 - m03 * m12
    c5 = m22 * m33 - m23 * m32
    c4 = m21 * m33 - m23 * m31
    c3 = m21 * m32 - m22 * m31
    c2 = m20 * m33 - m23 * m30
    c1 = m20 * m32 - m22 * m30
    c0 = m20 * m31 - m21 * m30

    det = s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2 - s4 * c1 + s5 * c0
    r = 1.0 / det

    b = jnp.stack([
        (m11 * c5 - m12 * c4 + m13 * c3) * r,
        (-m01 * c5 + m02 * c4 - m03 * c3) * r,
        (m31 * s5 - m32 * s4 + m33 * s3) * r,
        (-m21 * s5 + m22 * s4 - m23 * s3) * r,
        (-m10 * c5 + m12 * c2 - m13 * c1) * r,
        (m00 * c5 - m02 * c2 + m03 * c1) * r,
        (-m30 * s5 + m32 * s2 - m33 * s1) * r,
        (m20 * s5 - m22 * s2 + m23 * s1) * r,
        (m10 * c4 - m11 * c2 + m13 * c0) * r,
        (-m00 * c4 + m01 * c2 - m03 * c0) * r,
        (m30 * s4 - m31 * s2 + m33 * s0) * r,
        (-m20 * s4 + m21 * s2 - m23 * s0) * r,
        (-m10 * c3 + m11 * c1 - m12 * c0) * r,
        (m00 * c3 - m01 * c1 + m02 * c0) * r,
        (-m30 * s3 + m31 * s1 - m32 * s0) * r,
        (m20 * s3 - m21 * s1 + m22 * s0) * r,
    ], axis=-1)
    X = b.reshape(M.shape[:-2] + (4, 4))
    eye2 = 2.0 * jnp.eye(4, dtype=M.dtype)
    for _ in range(refine):
        X = X @ (eye2 - M @ X)
    return X


def expm(A: jax.Array) -> jax.Array:
    """Matrix exponential via scaling-and-squaring with a fixed Taylor order.

    jax.scipy.linalg.expm exists but uses data-dependent scaling internally in
    some versions; this fixed-structure variant is jit/vmap-stable on TPU and
    accurate to ~1e-7 (f32) for the small tangents the SLAM backend sees.
    """
    norm = jnp.linalg.norm(A, axis=(-2, -1), keepdims=True)
    # Choose squarings so the scaled norm is < 0.25. Static unroll of 10
    # conditional halvings keeps shapes static.
    n_sq = jnp.maximum(0, jnp.ceil(jnp.log2(jnp.maximum(norm, 1e-30) / 0.25))).astype(jnp.int32)
    n_sq = jnp.minimum(n_sq, 30)
    As = A / (2.0 ** n_sq.astype(A.dtype))
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    # 12-term Taylor on the scaled matrix (norm < 0.25 -> error < 1e-12).
    out = eye
    term = eye
    for k in range(1, 13):
        term = term @ As / k
        out = out + term

    # Early-exit squaring: LM retraction tangents are tiny, so n_sq is
    # almost always 0-2 - a fixed 31-iteration loop would spend ~30
    # sequential (batched-tiny) matmuls doing nothing.
    n_active = n_sq[..., 0, 0]

    def cond(state):
        i, _ = state
        return jnp.any(i < n_active)

    def body(state):
        i, val = state
        do = i < n_active
        sq = val @ val
        return i + 1, jnp.where(do[..., None, None], sq, val)

    _, out = jax.lax.while_loop(cond, body, (jnp.int32(0), out))
    return out


def _sqrtm_db(A: jax.Array, iters: int = 9) -> jax.Array:
    """Denman-Beavers matrix square root (fixed iterations, 4x4-friendly)."""
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    use_closed = A.shape[-1] == 4

    def inv(M):
        return inv44(M) if use_closed else jnp.linalg.inv(M)

    def body(_, yz):
        Y, Z = yz
        Yn = 0.5 * (Y + inv(Z))
        Zn = 0.5 * (Z + inv(Y))
        return Yn, Zn
    Y, _ = jax.lax.fori_loop(0, iters, body, (A, eye))
    return Y


def logm(A: jax.Array, num_sqrt: int = 3, series_terms: int = 8) -> jax.Array:
    """Principal matrix log via inverse scaling-and-squaring + Gregory series.

    log(A) = 2^k * 2 * (B + B^3/3 + B^5/5 + ...),  B = (A'-I)(A'+I)^-1,
    where A' = A^(1/2^k). Valid for matrices with no eigenvalues on the
    closed negative real axis - true of every SL(4)/SE(3)/Sim(3) element the
    SLAM factors produce (residual transforms are near identity).
    """
    out = A
    for _ in range(num_sqrt):
        out = _sqrtm_db(out)
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    if A.shape[-1] == 4:
        B = (out - eye) @ inv44(out + eye)  # (A'-I) and (A'+I)^-1 commute
    else:
        B = jnp.linalg.solve(jnp.swapaxes(out + eye, -1, -2),
                             jnp.swapaxes(out - eye, -1, -2))
        B = jnp.swapaxes(B, -1, -2)
    B2 = B @ B
    acc = B / (2 * series_terms - 1)
    for k in range(series_terms - 1, 0, -1):
        acc = B / (2 * k - 1) + acc @ B2
    return acc * (2.0 * (2 ** num_sqrt))


# ---------------------------------------------------------------------------
# SL(4)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _sl4_basis_np():
    import numpy as np
    basis = np.zeros((15, 4, 4), dtype=np.float64)
    k = 0
    for i in range(4):
        for j in range(4):
            if i != j:
                basis[k, i, j] = 1.0
                k += 1
    for d in range(3):
        basis[k, d, d] = 1.0
        basis[k, d + 1, d + 1] = -1.0
        k += 1
    # Pseudo-inverse of the (16,15) vectorized basis, used to project an
    # arbitrary traceless matrix onto tangent coordinates.
    Bmat = basis.reshape(15, 16).T  # (16,15)
    Bpinv = np.linalg.pinv(Bmat)    # (15,16)
    return basis, Bpinv


def sl4_basis(dtype=jnp.float32) -> jax.Array:
    basis, _ = _sl4_basis_np()
    return jnp.asarray(basis, dtype=dtype)


def sl4_hat(xi: jax.Array) -> jax.Array:
    """(...,15) -> traceless (...,4,4)."""
    basis = sl4_basis(xi.dtype)
    return jnp.einsum("...k,kij->...ij", xi, basis)


def sl4_vee(M: jax.Array) -> jax.Array:
    """Project (...,4,4) (assumed traceless) onto the 15-dim basis coords."""
    _, Bpinv = _sl4_basis_np()
    Bpinv = jnp.asarray(Bpinv, dtype=M.dtype)
    flat = M.reshape(M.shape[:-2] + (16,))
    return jnp.einsum("kf,...f->...k", Bpinv, flat)


def sl4_exp(xi: jax.Array) -> jax.Array:
    return expm(sl4_hat(xi))


def sl4_log(H: jax.Array) -> jax.Array:
    H = sl4_normalize(H)
    L = logm(H)
    # Remove any numerical trace drift before projecting.
    tr = jnp.trace(L, axis1=-2, axis2=-1)[..., None, None] / 4.0
    L = L - tr * jnp.eye(4, dtype=H.dtype)
    return sl4_vee(L)


def sl4_normalize(H: jax.Array) -> jax.Array:
    """Scale a 4x4 matrix so det = 1 (reference h_solve.py:94 `H / det**0.25`)."""
    det = jnp.linalg.det(H)
    scale = jnp.sign(det) * jnp.abs(det) ** 0.25
    return H / (scale[..., None, None] + 1e-32)


# ---------------------------------------------------------------------------
# Generic manifold dispatch used by the pose-graph solver
# ---------------------------------------------------------------------------

MANIFOLD_DOF = {"se3": 6, "sim3": 7, "sl4": 15}


def manifold_exp(name: str, xi: jax.Array) -> jax.Array:
    if name == "se3":
        return se3_exp(xi)
    if name == "sim3":
        return sim3_exp(xi)
    if name == "sl4":
        return sl4_exp(xi)
    raise ValueError(name)


def manifold_log(name: str, T: jax.Array) -> jax.Array:
    if name == "se3":
        return se3_log(T)
    if name == "sim3":
        return sim3_log(T)
    if name == "sl4":
        return sl4_log(T)
    raise ValueError(name)


def apply_homography(H: jax.Array, X: jax.Array) -> jax.Array:
    """Apply (...,4,4) projective transform(s) to points (...,N,3).

    Counterpart of reference h_solve.py:9 `apply_homography` /
    h_solve.py:16 `apply_homography_batch` (perspective divide included).
    """
    Xt = jnp.einsum("...ij,...nj->...ni", H[..., :3, :3], X) + H[..., None, :3, 3]
    wd = jnp.einsum("...j,...nj->...n", H[..., 3, :3], X) + H[..., None, 3, 3]
    return Xt / wd[..., None]
