"""Keyframe selection by optical-flow disparity.

Counterpart of reference vggt_slam/frame_overlap.py `FrameTracker`:
Shi-Tomasi corners (max 1000, quality 0.01, min dist 8) tracked with
pyramidal Lucas-Kanade (21x21 window, 3 levels); a frame becomes a keyframe
when the mean track displacement exceeds `min_disparity` (50 px default) or
fewer than 10 tracks survive (frame_overlap.py:117-173).

Backends:
* "cv2": host OpenCV - exact parity with the reference, runs once per input
  frame (cheap relative to the per-submap VGGT forward).
* "jax": on-device pyramidal LK (slam/keyframe_jax.py) for a fully
  device-resident input pipeline.
"""
from __future__ import annotations

import numpy as np


class FrameTracker:
    def __init__(self, backend: str = "cv2", max_corners: int = 1000):
        self.backend = backend
        self.max_corners = max_corners
        self.last_kf = None
        self.kf_pts = None
        self.kf_gray = None
        self._jax_tracker = None
        if backend == "jax":
            from vggt_slam_tpu.slam.keyframe_jax import LKTracker
            self._jax_tracker = LKTracker(max_corners=max_corners)

    def _to_gray(self, image: np.ndarray) -> np.ndarray:
        import cv2
        if image.ndim == 2:
            return image
        return cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)

    def initialize_keyframe(self, image: np.ndarray) -> None:
        import cv2
        self.last_kf = image
        self.kf_gray = self._to_gray(image)
        if self.backend == "jax":
            self.kf_pts = self._jax_tracker.detect(self.kf_gray)
        else:
            self.kf_pts = cv2.goodFeaturesToTrack(
                self.kf_gray, maxCorners=self.max_corners, qualityLevel=0.01,
                minDistance=8, blockSize=7)

    def compute_disparity(self, image: np.ndarray, min_disparity: float,
                          visualize: bool = False) -> bool:
        """True if `image` should start/extend the keyframe set."""
        if self.last_kf is None or self.kf_pts is None or len(self.kf_pts) < 10:
            self.initialize_keyframe(image)
            return True

        curr_gray = self._to_gray(image)
        if self.backend == "jax":
            good_kf, good_next = self._jax_tracker.track(
                self.kf_gray, curr_gray, self.kf_pts)
        else:
            import cv2
            next_pts, status, _ = cv2.calcOpticalFlowPyrLK(
                self.kf_gray, curr_gray, self.kf_pts, None,
                winSize=(21, 21), maxLevel=3,
                criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 30, 0.01))
            status = status.flatten()
            good_kf = self.kf_pts[status == 1]
            good_next = next_pts[status == 1]

        if len(good_kf) < 10:
            self.initialize_keyframe(image)
            return True

        displacement = np.linalg.norm(
            np.asarray(good_next).reshape(-1, 2) -
            np.asarray(good_kf).reshape(-1, 2), axis=1)
        if float(np.mean(displacement)) > min_disparity:
            self.initialize_keyframe(image)
            return True
        return False
