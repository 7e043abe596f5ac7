"""Synthetic 3D generator: geometric self-consistency.

The heightfield renderer (tools/synth3d.py) is the ground-truth source for
the trained-model accuracy evals, so its output must be consistent with the
repo's OWN camera conventions (ops/geometry.py): unprojecting frame i's
depth with its extrinsic/intrinsic and reprojecting into frame j must land
on pixels with the same texture color, and the pose-encoding ground truth
must round-trip through pose_encoding_to_extri_intri.
"""
import numpy as np
import pytest

from vggt_slam_tpu.ops import geometry
from vggt_slam_tpu.tools import synth3d


HW = (98, 126)  # small but non-square, divisible by 14


@pytest.fixture(scope="module")
def rendered():
    scene = synth3d.make_scene(seed=3, ng=512)
    centers, rots = synth3d.camera_path(4, seed=3, kind="pan", span=0.5)
    K = synth3d.camera_intrinsics(*HW)
    frames = [synth3d.render(scene, centers[i], rots[i], K, HW)
              for i in range(4)]
    extr = synth3d.extrinsics_from_path(centers, rots)
    return scene, frames, extr, K


def test_raycast_converges(rendered):
    _, frames, _, _ = rendered
    for _, _, residual in frames:
        assert residual < 1e-4


def test_depth_in_expected_range(rendered):
    scene, frames, _, _ = rendered
    for _, depth, _ in frames:
        assert depth.min() > scene.zbase - 0.5
        assert depth.max() < scene.zbase + 0.5


def test_cross_view_reprojection_color_match(rendered):
    """Unproject frame i -> world -> project into frame j: colors match."""
    import cv2

    _, frames, extr, K = rendered
    H, W = HW
    i, j = 0, 3
    depth_i = frames[i][1][None]  # (1, H, W)
    pts_w = np.asarray(geometry.unproject_depth_map_to_point_map(
        depth_i, extr[i:i + 1].astype(np.float32),
        np.broadcast_to(K, (1, 3, 3)).astype(np.float32)))[0]  # (H, W, 3)

    pix, z = geometry.project_points(
        pts_w.reshape(-1, 3), extr[j].astype(np.float32),
        K.astype(np.float32))
    pix = np.asarray(pix).reshape(H, W, 2)
    z = np.asarray(z).reshape(H, W)

    inb = ((pix[..., 0] >= 1) & (pix[..., 0] < W - 1) &
           (pix[..., 1] >= 1) & (pix[..., 1] < H - 1) & (z > 0))
    assert inb.mean() > 0.5  # frames overlap substantially

    rgb_j = frames[j][0]
    sampled = cv2.remap(rgb_j, pix[..., 0].astype(np.float32),
                        pix[..., 1].astype(np.float32), cv2.INTER_LINEAR)
    err = np.abs(sampled - frames[i][0])[inb]
    # Bilinear resampling + texture gradients put the bar at a few percent.
    assert np.median(err) < 0.02
    assert err.mean() < 0.05


def test_reprojected_depth_matches(rendered):
    """Depth consistency: z of i's points in j's frame equals j's depth."""
    import cv2

    _, frames, extr, K = rendered
    H, W = HW
    i, j = 1, 2
    depth_i = frames[i][1][None]
    pts_w = np.asarray(geometry.unproject_depth_map_to_point_map(
        depth_i, extr[i:i + 1].astype(np.float32),
        np.broadcast_to(K, (1, 3, 3)).astype(np.float32)))[0]
    pix, z = geometry.project_points(
        pts_w.reshape(-1, 3), extr[j].astype(np.float32),
        K.astype(np.float32))
    pix = np.asarray(pix).reshape(H, W, 2)
    z = np.asarray(z).reshape(H, W)
    inb = ((pix[..., 0] >= 1) & (pix[..., 0] < W - 1) &
           (pix[..., 1] >= 1) & (pix[..., 1] < H - 1))
    depth_j_at = cv2.remap(frames[j][1], pix[..., 0].astype(np.float32),
                           pix[..., 1].astype(np.float32), cv2.INTER_LINEAR)
    err = np.abs(depth_j_at - z)[inb]
    assert np.median(err) < 5e-3


def test_pose_encoding_roundtrip(rendered):
    _, _, extr, K = rendered
    rel = synth3d.relative_to_frame0(extr)
    enc = synth3d.pose_encodings(rel, K, HW)
    assert enc.shape == (4, 9)
    # Frame 0 is the identity camera.
    np.testing.assert_allclose(enc[0, :3], 0.0, atol=1e-6)
    np.testing.assert_allclose(enc[0, 3:7], [1, 0, 0, 0], atol=1e-6)
    extr_rt, intr_rt = geometry.pose_encoding_to_extri_intri(
        enc.astype(np.float32), HW)
    np.testing.assert_allclose(np.asarray(extr_rt), rel, atol=1e-4)
    np.testing.assert_allclose(np.asarray(intr_rt)[0], K, rtol=1e-4)


def test_rotmat_to_quat_np_matches_lie():
    from vggt_slam_tpu.ops import lie

    rng = np.random.default_rng(0)
    Rs = []
    for _ in range(16):
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        Rs.append(Q)
    Rs = np.stack(Rs)
    q_np = synth3d.rotmat_to_quat_np(Rs)
    q_jax = np.asarray(lie.rotmat_to_quat(Rs.astype(np.float32)))
    np.testing.assert_allclose(q_np, q_jax, atol=1e-5)


def test_training_batch_contract():
    b = synth3d.training_batch(seed=5, n_frames=3, image_hw=(56, 70),
                               ng=256)
    assert b["images"].shape == (3, 3, 56, 70)
    assert b["pose_enc_gt"].shape == (3, 9)
    assert b["depth_gt"].shape == (3, 56, 70)
    assert b["images"].min() >= 0.0 and b["images"].max() <= 1.0
    assert (b["depth_gt"] > 0.5).all()
    # Different seeds give different scenes.
    b2 = synth3d.training_batch(seed=6, n_frames=3, image_hw=(56, 70),
                                ng=256)
    assert np.abs(b["images"] - b2["images"]).mean() > 0.01


def test_write_tum_sequence(tmp_path):
    names = synth3d.write_tum_sequence(str(tmp_path), n_frames=5, seed=1,
                                       image_hw=(56, 70), ng=256)
    assert len(names) == 5
    gt = np.loadtxt(tmp_path / "groundtruth.txt")
    assert gt.shape == (5, 8)
    # Unit quaternions.
    np.testing.assert_allclose(np.linalg.norm(gt[:, 4:], axis=1), 1.0,
                               atol=1e-5)
