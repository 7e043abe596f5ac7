"""Image undistortion tools: MetaCam fisheye and EuRoC radial-tangential.

Counterparts of reference scripts/undistort_metacam_image.py (equidistant
fisheye -> square pinhole via initUndistortRectifyMap + remap,
undistort_metacam_image.py:135-175, with the hard-coded MetaCam left/right
intrinsics) and scripts/undistort.py (EuRoC cam0 radtan cv2.undistort).

CLI:
  python -m vggt_slam_tpu.tools.undistort metacam --input_dir ... --output_dir ... --camera left
  python -m vggt_slam_tpu.tools.undistort euroc --input_dir ... --output_dir ...
"""
from __future__ import annotations

import argparse
import os
from dataclasses import dataclass, field

import numpy as np


@dataclass
class FisheyeModel:
    """Equidistant (Kannala-Brandt k1..k4) fisheye camera."""
    K: np.ndarray
    D: np.ndarray  # (4,)
    image_size: tuple[int, int]  # (w, h)

    def undistort_maps(self, out_size: int = 1600, fov_deg: float = 90.0):
        import cv2
        f_out = (out_size / 2.0) / np.tan(np.radians(fov_deg) / 2.0)
        K_new = np.array([[f_out, 0, out_size / 2.0],
                          [0, f_out, out_size / 2.0],
                          [0, 0, 1.0]])
        m1, m2 = cv2.fisheye.initUndistortRectifyMap(
            self.K, self.D, np.eye(3), K_new,
            (out_size, out_size), cv2.CV_16SC2)
        return m1, m2, K_new

    def undistort(self, img: np.ndarray, out_size: int = 1600,
                  fov_deg: float = 90.0):
        import cv2
        m1, m2, K_new = self.undistort_maps(out_size, fov_deg)
        return cv2.remap(img, m1, m2, interpolation=cv2.INTER_LINEAR), K_new


# MetaCam stereo fisheye rig intrinsics (reference
# undistort_metacam_image.py:61-85 values).
METACAM_LEFT = FisheyeModel(
    K=np.array([[1430.2,    0.0, 1500.0],
                [0.0,    1430.1, 1500.4],
                [0.0,       0.0,    1.0]]),
    D=np.array([-0.0043, 0.0392, -0.0378, 0.0069]),
    image_size=(3000, 3000),
)
METACAM_RIGHT = FisheyeModel(
    K=np.array([[1429.8,    0.0, 1500.9],
                [0.0,    1429.7, 1501.2],
                [0.0,       0.0,    1.0]]),
    D=np.array([-0.0041, 0.0384, -0.0370, 0.0066]),
    image_size=(3000, 3000),
)

# EuRoC MAV cam0 intrinsics + radial-tangential distortion
# (reference scripts/undistort.py:6-14).
EUROC_CAM0_K = np.array([[458.654, 0.0, 367.215],
                         [0.0, 457.296, 248.375],
                         [0.0, 0.0, 1.0]])
EUROC_CAM0_D = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05])


def undistort_folder_fisheye(input_dir: str, output_dir: str,
                             model: FisheyeModel, out_size: int = 1600,
                             fov_deg: float = 90.0) -> int:
    import cv2
    os.makedirs(output_dir, exist_ok=True)
    m1 = m2 = None
    n = 0
    for name in sorted(os.listdir(input_dir)):
        path = os.path.join(input_dir, name)
        img = cv2.imread(path)
        if img is None:
            continue
        if m1 is None:
            m1, m2, _ = model.undistort_maps(out_size, fov_deg)
        out = cv2.remap(img, m1, m2, interpolation=cv2.INTER_LINEAR)
        cv2.imwrite(os.path.join(output_dir, name), out)
        n += 1
    return n


def undistort_folder_radtan(input_dir: str, output_dir: str,
                            K=EUROC_CAM0_K, D=EUROC_CAM0_D) -> int:
    import cv2
    os.makedirs(output_dir, exist_ok=True)
    n = 0
    for name in sorted(os.listdir(input_dir)):
        path = os.path.join(input_dir, name)
        img = cv2.imread(path)
        if img is None:
            continue
        cv2.imwrite(os.path.join(output_dir, name), cv2.undistort(img, K, D))
        n += 1
    return n


def main():
    p = argparse.ArgumentParser(description="Image undistortion")
    sub = p.add_subparsers(dest="mode", required=True)
    pm = sub.add_parser("metacam")
    pm.add_argument("--input_dir", required=True)
    pm.add_argument("--output_dir", required=True)
    pm.add_argument("--camera", choices=["left", "right"], default="left")
    pm.add_argument("--out_size", type=int, default=1600)
    pm.add_argument("--fov_deg", type=float, default=90.0)
    pe = sub.add_parser("euroc")
    pe.add_argument("--input_dir", required=True)
    pe.add_argument("--output_dir", required=True)
    args = p.parse_args()

    if args.mode == "metacam":
        model = METACAM_LEFT if args.camera == "left" else METACAM_RIGHT
        n = undistort_folder_fisheye(args.input_dir, args.output_dir, model,
                                     args.out_size, args.fov_deg)
    else:
        n = undistort_folder_radtan(args.input_dir, args.output_dir)
    print(f"undistorted {n} images -> {args.output_dir}")


if __name__ == "__main__":
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    main()
