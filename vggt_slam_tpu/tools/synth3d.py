"""Synthetic 3D scene generator with exact multi-view ground truth.

`synth_sequence.py` pans a viewport over a flat texture - enough to drive
the CLI, but its constant depth makes SL(4) registration degenerate and
carries no parallax for a model to learn geometry from. This module renders
a textured smooth HEIGHTFIELD from a moving perspective camera by per-pixel
raycasting, producing frames with real parallax plus exact per-pixel depth
and camera ground truth. It feeds two consumers:

* training data for a small VGGT (tools/train_tiny.py): batches of
  (images, pose_enc_gt, depth_gt) in the model's own conventions
  (ops/geometry.py: world->cam extrinsics relative to frame 0, pose
  encoding [t, quat wxyz, fov_h, fov_w]);
* TUM-layout eval sequences (rgb/<stamp>.png + groundtruth.txt) so the
  run_eval harness scores accuracy-bearing ATE - the merged-vs-exact
  global-attention A/B (README "Accuracy" section) runs on these.

Rendering model: the scene surface is Z(X, Y) = zbase - E(X, Y) with E a
smooth random elevation field over the world XY plane, viewed by a camera
at center C with world->cam rotation R (OpenCV axes: x right, y down,
z forward). For pixel (u, v), the surface intersection along the ray
p(s) = C + s * R^T K^-1 (u, v, 1) satisfies a fixed-point equation in s
that converges whenever |dE/dXY| * |ray_xy/ray_z| < 1 (guaranteed by
construction: gentle slopes, modest camera tilt); depth is exactly s
(camera-frame z). No occlusion handling is needed in that regime - the
intersection is unique.
"""
from __future__ import annotations

import argparse
import os
from dataclasses import dataclass

import numpy as np


# ---------------------------------------------------------------------------
# Scene
# ---------------------------------------------------------------------------


@dataclass
class Scene:
    texture: np.ndarray   # (Ng, Ng, 3) float32 in [0, 1]
    elev: np.ndarray      # (Ng, Ng) float32 world-z elevation (>= 0)
    extent: float         # world half-size: X, Y in [-extent, extent]
    zbase: float          # surface plane depth at elevation 0


def make_scene(seed: int = 0, ng: int = 1536, extent: float = 2.2,
               zbase: float = 2.0, elev_amp: float = 0.25) -> Scene:
    """Procedural scene: distinctive corner-rich texture + smooth elevation.

    The texture layers a low-frequency color field (globally distinctive
    neighborhoods, so pyramidal LK locks onto true matches), sparse
    high-contrast shapes (strong corners), and light noise - the recipe
    validated by synth_sequence.make_texture. Brightness is modulated by
    elevation (a weak ambient-occlusion-style monocular depth cue).
    """
    import cv2

    rng = np.random.default_rng(seed)

    coarse = rng.uniform(60, 220, (10, 10, 3)).astype(np.float32)
    tex = cv2.resize(coarse, (ng, ng), interpolation=cv2.INTER_CUBIC)
    n_shapes = max(60, ng * ng // 30000)
    for _ in range(n_shapes):
        c = tuple(int(v) for v in rng.uniform(0, ng, 2))
        color = tuple(float(v) for v in rng.uniform(0, 255, 3))
        r = int(rng.uniform(ng // 90, ng // 22))
        if rng.uniform() < 0.5:
            cv2.circle(tex, c, r, color, -1)
        else:
            cv2.rectangle(tex, (c[0] - r, c[1] - r), (c[0] + r, c[1] + r),
                          color, -1)
    tex += rng.normal(0, 10, tex.shape).astype(np.float32)

    # Smooth elevation: coarse random field, cubic upsample, Gaussian blur.
    # Slope stays O(elev_amp / feature_size) ~ 0.5, which with |ray_xy| <~
    # 0.65 keeps the raycast fixed-point contraction factor < ~0.35.
    ecoarse = rng.uniform(0, 1, (6, 6)).astype(np.float32)
    elev = cv2.resize(ecoarse, (ng, ng), interpolation=cv2.INTER_CUBIC)
    elev = cv2.GaussianBlur(elev, (0, 0), ng / 48.0)
    elev -= elev.min()
    elev *= elev_amp / max(elev.max(), 1e-6)

    # Elevation shading: nearer (higher) surface slightly brighter.
    shade = 0.78 + 0.22 * (elev / max(elev.max(), 1e-6))
    tex = np.clip(tex * shade[..., None], 0, 255) / 255.0
    return Scene(texture=tex.astype(np.float32), elev=elev.astype(np.float32),
                 extent=float(extent), zbase=float(zbase))


def _world_maps(scene: Scene, X: np.ndarray, Y: np.ndarray):
    """World XY -> field pixel coords (x=col, y=row) for cv2.remap."""
    ng = scene.elev.shape[0]
    sc = (ng - 1) / (2.0 * scene.extent)
    gx = (X + scene.extent) * sc
    gy = (Y + scene.extent) * sc
    return gx.astype(np.float32), gy.astype(np.float32)


def camera_intrinsics(H: int, W: int, fov_w_deg: float = 55.0) -> np.ndarray:
    """Pinhole K with square pixels, principal point at the image center."""
    f = (W / 2.0) / np.tan(np.radians(fov_w_deg) / 2.0)
    return np.array([[f, 0.0, W / 2.0],
                     [0.0, f, H / 2.0],
                     [0.0, 0.0, 1.0]], dtype=np.float64)


def rotation_rpy(roll: float, pitch: float, yaw: float) -> np.ndarray:
    """World->cam rotation from small roll/pitch/yaw (radians) about the
    camera axes; identity = looking straight down +Z."""
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    Rz = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1.0]])
    Rx = np.array([[1.0, 0, 0], [0, cp, -sp], [0, sp, cp]])
    Ry = np.array([[cy, 0, sy], [0, 1.0, 0], [-sy, 0, cy]])
    return (Rz @ Rx @ Ry).astype(np.float64)


def render(scene: Scene, cam_center: np.ndarray, R_wc: np.ndarray,
           K: np.ndarray, image_hw: tuple[int, int], iters: int = 8):
    """Raycast one frame.

    Args:
        cam_center: (3,) camera center C in world coordinates.
        R_wc: (3, 3) world->cam rotation (X_cam = R (X_w - C)).
        K: (3, 3) intrinsics. image_hw: (H, W).
    Returns:
        rgb (H, W, 3) float32 in [0, 1], depth (H, W) float32 (camera z),
        residual: max |s_k - s_{k-1}| of the final iteration (convergence
        diagnostic; < 1e-4 in the supported regime).
    """
    import cv2

    H, W = image_hw
    C = np.asarray(cam_center, dtype=np.float64)
    u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64))
    pix = np.stack([u, v, np.ones_like(u)], axis=0).reshape(3, -1)
    rays = (R_wc.T @ np.linalg.inv(K) @ pix)  # (3, H*W); depth = s exactly
    wx = rays[0].reshape(H, W)
    wy = rays[1].reshape(H, W)
    wz = rays[2].reshape(H, W)

    s = np.full((H, W), scene.zbase - C[2], dtype=np.float64) / wz
    prev = s
    for _ in range(iters):
        prev = s
        X = C[0] + s * wx
        Y = C[1] + s * wy
        gx, gy = _world_maps(scene, X, Y)
        e = cv2.remap(scene.elev, gx, gy, cv2.INTER_LINEAR,
                      borderMode=cv2.BORDER_REFLECT).astype(np.float64)
        s = (scene.zbase - e - C[2]) / wz
    residual = float(np.abs(s - prev).max())

    X = C[0] + s * wx
    Y = C[1] + s * wy
    gx, gy = _world_maps(scene, X, Y)
    rgb = cv2.remap(scene.texture, gx, gy, cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_REFLECT)
    return rgb.astype(np.float32), s.astype(np.float32), residual


# ---------------------------------------------------------------------------
# Camera paths & ground-truth encodings
# ---------------------------------------------------------------------------


def camera_path(n: int, seed: int = 0, kind: str = "loop",
                span: float = 0.8, z_amp: float = 0.12,
                rot_deg: float = 4.0):
    """(centers (n, 3), rotations (n, 3, 3) world->cam) - smooth random walk.

    `loop` closes back near the start (drives loop-closure evals); `pan`
    sweeps across. Rotations are small smooth roll/pitch/yaw wobbles so
    quaternion regression is non-trivial while LK keyframing stays stable.
    """
    rng = np.random.default_rng(seed + 7)
    if kind == "loop":
        # True revisit: every path term is periodic in t with period 1
        # (integer wobble frequencies) and the endpoint is excluded, so the
        # last frame sits 1/n before closure - a near-identical (but not
        # bit-identical) viewpoint to frame 0. This is what makes the
        # sequence exercise loop-closure retrieval the way the reference's
        # office_loop sample does (reference README.md:132-143).
        t = np.linspace(0.0, 1.0, n, endpoint=False)
        ang = 2 * np.pi * t
        xs = span * 0.5 * (1 - np.cos(ang)) - span * 0.25
        ys = span * 0.45 * np.sin(ang)
        z_freq = float(rng.integers(1, 3))
        rot_freqs = rng.integers(1, 3, 3).astype(np.float64)
    else:
        t = np.linspace(0.0, 1.0, n)
        xs = span * (t - 0.5)
        ys = span * 0.3 * np.sin(2 * np.pi * t)
        z_freq = rng.uniform(0.5, 1.5)
        rot_freqs = rng.uniform(0.5, 2.0, 3)
    zs = z_amp * np.sin(2 * np.pi * t * z_freq + rng.uniform(0, np.pi))
    centers = np.stack([xs, ys, zs], axis=1)

    rmax = np.radians(rot_deg)
    phases = rng.uniform(0, 2 * np.pi, 3)
    freqs = rot_freqs
    rots = []
    for ti in t:
        ang3 = rmax * np.sin(2 * np.pi * freqs * ti + phases)
        rots.append(rotation_rpy(*ang3))
    return centers, np.stack(rots, axis=0)


def extrinsics_from_path(centers: np.ndarray, rots: np.ndarray) -> np.ndarray:
    """(n, 3, 4) world->cam [R | -R C]."""
    n = centers.shape[0]
    out = np.zeros((n, 3, 4), dtype=np.float64)
    out[:, :, :3] = rots
    out[:, :, 3] = -np.einsum("nij,nj->ni", rots, centers)
    return out


def relative_to_frame0(extr: np.ndarray) -> np.ndarray:
    """Re-express world->cam extrinsics in frame 0's camera frame (the
    "VGGT world": the model predicts all cameras relative to the first
    view - reference solver.py:473-475 consumes them that way)."""
    R0 = extr[0, :, :3]
    t0 = extr[0, :, 3]
    out = np.zeros_like(extr)
    for i in range(extr.shape[0]):
        Ri = extr[i, :, :3]
        ti = extr[i, :, 3]
        Rrel = Ri @ R0.T
        out[i, :, :3] = Rrel
        out[i, :, 3] = ti - Rrel @ t0
    return out


def rotmat_to_quat_np(R: np.ndarray) -> np.ndarray:
    """(n, 3, 3) -> (n, 4) (w, x, y, z), w >= 0. Pure numpy (the jax
    version in ops/lie.py would dispatch every call through the TPU
    tunnel - measured seconds per tiny array - so data generation keeps a
    host-only path; parity with lie.rotmat_to_quat is unit-tested)."""
    R = np.asarray(R, dtype=np.float64)
    n = R.shape[0]
    q = np.zeros((n, 4))
    for i in range(n):
        m = R[i]
        tr = np.trace(m)
        cands = np.array([1 + tr, 1 + 2 * m[0, 0] - tr, 1 + 2 * m[1, 1] - tr,
                          1 + 2 * m[2, 2] - tr])
        k = int(np.argmax(cands))
        if k == 0:
            q[i] = [1 + tr, m[2, 1] - m[1, 2], m[0, 2] - m[2, 0],
                    m[1, 0] - m[0, 1]]
        elif k == 1:
            q[i] = [m[2, 1] - m[1, 2], cands[1], m[0, 1] + m[1, 0],
                    m[0, 2] + m[2, 0]]
        elif k == 2:
            q[i] = [m[0, 2] - m[2, 0], m[0, 1] + m[1, 0], cands[2],
                    m[1, 2] + m[2, 1]]
        else:
            q[i] = [m[1, 0] - m[0, 1], m[0, 2] + m[2, 0], m[1, 2] + m[2, 1],
                    cands[3]]
        q[i] /= np.linalg.norm(q[i]) + 1e-12
        if q[i, 0] < 0:
            q[i] = -q[i]
    return q


def pose_encodings(extr_rel: np.ndarray, K: np.ndarray,
                   image_hw: tuple[int, int]) -> np.ndarray:
    """(n, 9) ground-truth pose encodings [t, quat wxyz, fov_h, fov_w]
    (ops/geometry.py convention), computed host-side in numpy."""
    H, W = image_hw
    t = extr_rel[:, :, 3]
    q = rotmat_to_quat_np(extr_rel[:, :, :3])
    fy = K[1, 1]
    fx = K[0, 0]
    fov_h = 2.0 * np.arctan((H / 2.0) / fy)
    fov_w = 2.0 * np.arctan((W / 2.0) / fx)
    n = extr_rel.shape[0]
    fovs = np.broadcast_to(np.array([fov_h, fov_w]), (n, 2))
    return np.concatenate([t, q, fovs], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# Consumers: training batches & TUM-layout eval sequences
# ---------------------------------------------------------------------------


def training_batch(seed: int, n_frames: int = 8,
                   image_hw: tuple[int, int] = (392, 518),
                   fov_w_deg: float = 55.0, ng: int = 1024):
    """One scene -> one training batch (fresh geometry + texture per seed).

    Returns dict(images (S,3,H,W) f32 [0,1], pose_enc_gt (S,9) f32,
    depth_gt (S,H,W) f32) matching parallel.train.vggt_loss's contract.
    Frames are a random smooth path, so inter-frame parallax varies from
    near-overlap to wide baseline within each batch.
    """
    H, W = image_hw
    scene = make_scene(seed=seed, ng=ng)
    kind = "loop" if (seed % 2) else "pan"
    rng = np.random.default_rng(seed ^ 0x9E3779B9)
    centers, rots = camera_path(
        max(n_frames, 2), seed=seed, kind=kind,
        span=float(rng.uniform(0.45, 0.9)),
        z_amp=float(rng.uniform(0.0, 0.18)),
        rot_deg=float(rng.uniform(1.0, 6.0)))
    K = camera_intrinsics(H, W, fov_w_deg)

    imgs = np.zeros((n_frames, 3, H, W), np.float32)
    depths = np.zeros((n_frames, H, W), np.float32)
    for i in range(n_frames):
        rgb, depth, _ = render(scene, centers[i], rots[i], K, (H, W))
        imgs[i] = rgb.transpose(2, 0, 1)
        depths[i] = depth
    extr = extrinsics_from_path(centers[:n_frames], rots[:n_frames])
    enc = pose_encodings(relative_to_frame0(extr), K, (H, W))
    return {"images": imgs, "pose_enc_gt": enc.astype(np.float32),
            "depth_gt": depths}


def write_tum_sequence(out_dir: str, n_frames: int = 120, seed: int = 0,
                       image_hw: tuple[int, int] = (392, 518),
                       kind: str = "loop", span: float = 0.9,
                       fov_w_deg: float = 55.0, fps: float = 30.0,
                       ng: int = 1536) -> list[str]:
    """TUM-RGBD-layout sequence: rgb/<stamp>.png + groundtruth.txt.

    groundtruth.txt rows are "t x y z qx qy qz qw" with the CAM->WORLD pose
    (TUM convention; evals/ate.py associates and Sim3-aligns against it).
    """
    import cv2

    H, W = image_hw
    scene = make_scene(seed=seed, ng=ng)
    centers, rots = camera_path(n_frames, seed=seed, kind=kind, span=span)
    K = camera_intrinsics(H, W, fov_w_deg)

    img_dir = os.path.join(out_dir, "rgb")
    os.makedirs(img_dir, exist_ok=True)
    names = []
    gt_rows = []
    t0 = 1000.0
    for i in range(n_frames):
        rgb, _, _ = render(scene, centers[i], rots[i], K, (H, W))
        stamp = t0 + i / fps
        name = os.path.join(img_dir, f"{stamp:.6f}.png")
        cv2.imwrite(name, cv2.cvtColor((rgb * 255).astype(np.uint8),
                                       cv2.COLOR_RGB2BGR))
        names.append(name)
        R_cw = rots[i].T  # cam->world
        q = rotmat_to_quat_np(R_cw[None])[0]  # (w, x, y, z)
        c = centers[i]
        gt_rows.append(
            f"{stamp:.6f} {c[0]:.6f} {c[1]:.6f} {c[2]:.6f} "
            f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}")
    with open(os.path.join(out_dir, "groundtruth.txt"), "w") as f:
        f.write("# timestamp tx ty tz qx qy qz qw\n")
        f.write("\n".join(gt_rows) + "\n")
    return names


def main():
    p = argparse.ArgumentParser(
        description="Generate a synthetic 3D (heightfield) TUM-layout "
                    "sequence with exact groundtruth")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--n_frames", type=int, default=120)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--kind", choices=["loop", "pan"], default="loop")
    p.add_argument("--span", type=float, default=0.9)
    p.add_argument("--size", type=int, nargs=2, default=(518, 392),
                   metavar=("W", "H"))
    args = p.parse_args()
    W, H = args.size
    names = write_tum_sequence(args.out_dir, n_frames=args.n_frames,
                               seed=args.seed, image_hw=(H, W),
                               kind=args.kind, span=args.span)
    print(f"wrote {len(names)} frames to {args.out_dir}")


if __name__ == "__main__":
    main()
