"""Deterministic fake VGGT for integration-testing the SLAM loop.

Implements the test strategy SURVEY.md section 4 calls for: a consistent
geometry emitter with the exact prediction contract of the real model, so
the solver/registration/pose-graph path can be validated without weights.

The synthetic world is a sphere of radius `R` centered at the origin;
cameras sit inside and raycast against it, so overlapping frames observe a
consistent, non-planar surface (non-planarity matters: planar scenes are
SL(4)-degenerate). Frame identity travels inside the image: pixel [0, 0, 0]
carries frame_index / 1000, which the fake model decodes.

Each call (one submap) expresses all geometry in the batch's frame-0 camera
coordinates - exactly VGGT's convention - and can apply a per-call global
scale to emulate the monocular scale ambiguity between submaps.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vggt_slam_tpu.ops import geometry, lie


class FakeVGGT:
    def __init__(self, w2c_list, K, image_hw=(28, 42), sphere_radius=8.0,
                 scale_schedule=None, conf_value=10.0, depth_noise=0.0,
                 seed=0, bump_amp=0.0, disjoint_overlap_deg=None):
        self.w2c = [np.asarray(T, dtype=np.float64) for T in w2c_list]
        self.K = np.asarray(K, dtype=np.float64)
        self.image_hw = image_hw
        self.R = sphere_radius
        self.scale_schedule = scale_schedule or []
        self.conf_value = conf_value
        self.depth_noise = depth_noise
        # Direction-dependent radius perturbation (fraction of R). The
        # plain sphere is rotationally symmetric, so every camera on a
        # circle sees a projectively CONGRUENT cloud — pixelwise
        # registration between two arbitrary viewpoints then fits
        # perfectly even when the viewpoints share no surface, which
        # makes geometric loop verification untestable. Bumps break the
        # symmetry; 0 keeps the exact sphere (the default for every
        # test that predates the gate).
        self.bump_amp = bump_amp
        # Emulate the REAL model's failure mode on view-disjoint batch
        # members (the thing the geometric loop gate exists to catch):
        # VGGT predicts every frame's pose relative to the batch jointly,
        # so a retrieved loop frame that shares NO surface with the rest
        # of the batch gets a hallucinated, arbitrary placement — while
        # the plain fake reads the frame index and emits globally
        # consistent geometry for ANY frame set, which makes false loops
        # harmless and the gate untestable. When set (degrees), a frame
        # whose viewing direction is further than this from EVERY other
        # batch frame is predicted at a deterministic WRONG pose
        # (batch-frame-0's pose composed with a fixed offset) instead of
        # its true one. None = off (every pre-gate test's behavior).
        self.disjoint_overlap_deg = disjoint_overlap_deg
        self.calls = 0
        self.rng = np.random.default_rng(seed)

    # -- helpers -------------------------------------------------------------

    def make_image(self, frame_idx: int) -> np.ndarray:
        """(3, H, W) image whose [0,0,0] pixel encodes the frame index.

        The rest is a per-frame random texture so content-based retrieval
        descriptors distinguish frames (and match re-visited ones when the
        test copies textures)."""
        H, W = self.image_hw
        img = np.random.default_rng(1000 + frame_idx).uniform(
            size=(3, H, W)).astype(np.float32)
        img[0, 0, 0] = frame_idx / 1000.0
        img[1, 0, 0] = 0.123  # marker
        return img

    def _decode_indices(self, images: np.ndarray) -> list[int]:
        return [int(round(float(images[i, 0, 0, 0]) * 1000))
                for i in range(images.shape[0])]

    def _depth_for(self, w2c: np.ndarray) -> np.ndarray:
        """Raycast the sphere: depth map (H, W)."""
        H, W = self.image_hw
        uu, vv = np.meshgrid(np.arange(W), np.arange(H))
        pix = np.stack([uu, vv, np.ones_like(uu)], axis=-1).astype(np.float64)
        rays_cam = pix @ np.linalg.inv(self.K).T  # (H, W, 3)
        Rr = w2c[:3, :3]
        t = w2c[:3, 3]
        c = -Rr.T @ t                     # camera center in world
        d_w = rays_cam @ Rr               # (H,W,3) ray dirs in world (unnormalized)
        d_norm = d_w / np.linalg.norm(d_w, axis=-1, keepdims=True)
        b = d_norm @ c
        disc = b * b - (c @ c - self.R ** 2)
        t_hit = -b + np.sqrt(np.maximum(disc, 0.0))
        X_w = c[None, None, :] + t_hit[..., None] * d_norm
        if self.bump_amp > 0.0:
            # Bumped surface S = { u * R * (1 + amp * g(u)) } sampled by
            # radial projection of the sphere hit (exact for radial
            # rays, O(amp * fov) otherwise — consistent within a frame,
            # which is all the fake's contract needs: same-image pairs
            # stay identical, different-viewpoint pairs sample the same
            # world surface).
            u_dir = X_w / (np.linalg.norm(X_w, axis=-1, keepdims=True)
                           + 1e-12)
            g = (np.sin(3.1 * u_dir[..., 0] + 1.3)
                 * np.cos(2.7 * u_dir[..., 1])
                 + 0.5 * np.sin(4.3 * u_dir[..., 2]))
            X_w = u_dir * (self.R * (1.0 + self.bump_amp * g))[..., None]
        X_cam = X_w @ Rr.T + t
        return X_cam[..., 2]

    # -- the model contract --------------------------------------------------

    def __call__(self, images) -> dict:
        images = np.asarray(images)
        idxs = self._decode_indices(images)
        S = len(idxs)
        H, W = self.image_hw
        scale = (self.scale_schedule[self.calls]
                 if self.calls < len(self.scale_schedule) else 1.0)
        self.calls += 1

        w2c0_inv = np.linalg.inv(self.w2c[idxs[0]])
        poses = [self.w2c[gi] for gi in idxs]
        if self.disjoint_overlap_deg is not None and S > 1:
            # view dir in world = R^T e_z (z-forward camera)
            dirs = np.stack([T[:3, :3].T @ np.array([0.0, 0.0, 1.0])
                             for T in poses])
            cos_thr = np.cos(np.radians(self.disjoint_overlap_deg))
            offset = np.eye(4)
            # fixed wrong placement: ~20 deg yaw + a shove
            cy, sy = np.cos(0.35), np.sin(0.35)
            offset[:3, :3] = np.array([[cy, 0, sy], [0, 1, 0],
                                       [-sy, 0, cy]])
            offset[:3, 3] = [0.3, -0.2, 0.25]
            for i in range(S):
                cos_best = max(float(dirs[i] @ dirs[j])
                               for j in range(S) if j != i)
                if cos_best < cos_thr:
                    poses[i] = offset @ self.w2c[idxs[0]]
        extr = np.zeros((S, 3, 4))
        depth = np.zeros((S, H, W, 1))
        for i, gi in enumerate(idxs):
            T = poses[i] @ w2c0_inv   # vggt-frame -> cam_i
            T = T.copy()
            T[:3, 3] *= scale
            extr[i] = T[:3, :]
            d = self._depth_for(poses[i]) * scale
            if self.depth_noise > 0:
                d = d + self.rng.normal(scale=self.depth_noise, size=d.shape)
            depth[i, :, :, 0] = d

        K_batch = np.tile(self.K[None], (S, 1, 1))
        pose_enc = np.asarray(geometry.extri_intri_to_pose_encoding(
            jnp.asarray(extr), jnp.asarray(K_batch), (H, W)))
        world_points = np.asarray(geometry.unproject_depth_map_to_point_map(
            jnp.asarray(depth), jnp.asarray(extr), jnp.asarray(K_batch)))
        conf = np.full((S, H, W), self.conf_value)
        return {
            "pose_enc": pose_enc,
            "depth": depth,
            "depth_conf": conf,
            "world_points": world_points,
            "world_points_conf": conf,
        }


def circular_trajectory(n: int, radius: float = 2.0, K=None,
                        look_outward: bool = True):
    """n cameras on a circle, looking radially outward (seeing the sphere)."""
    w2c = []
    for i in range(n):
        ang = 2 * np.pi * i / max(n, 1) * 0.5  # half-circle sweep
        c = np.array([radius * np.cos(ang), radius * np.sin(ang), 0.0])
        fwd = c / np.linalg.norm(c) if look_outward else -c / np.linalg.norm(c)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        up2 = np.cross(right, fwd)
        R_c2w = np.stack([right, -up2, fwd], axis=1)  # cam axes in world cols
        T = np.eye(4)
        T[:3, :3] = R_c2w.T
        T[:3, 3] = -R_c2w.T @ c
        w2c.append(T)
    return w2c


def default_K(image_hw=(28, 42)):
    H, W = image_hw
    K = np.array([[W * 0.9, 0, W / 2.0],
                  [0, W * 0.9, H / 2.0],
                  [0, 0, 1.0]])
    return K
