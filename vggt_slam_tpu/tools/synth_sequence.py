"""Synthetic image-sequence generator for smoke tests and demos.

The reference's manual acceptance test is the office_loop.zip sample (its
README.md:132-143; stripped from the mirror) - default params produce
exactly one loop closure. No dataset ships in this environment either, so
this tool generates a deterministic textured sequence with real optical
flow (a smoothly panning view of a procedurally textured scene, optionally
returning to the start so retrieval-based loop closure can fire) that
drives the full CLI end-to-end: keyframe gate, submap forwards,
registration, loop closure, artifact writers.

CLI: python -m vggt_slam_tpu.tools.synth_sequence --out_dir /tmp/seq \
        [--n_frames 60] [--loop] [--size 640 480]
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def make_texture(height: int, width: int, seed: int = 0,
                 blur_sigma: float = 3.0) -> np.ndarray:
    """Procedural RGB texture with enough corners for Shi-Tomasi/LK.

    Must be globally DISTINCTIVE, not just corner-rich: pure blurred noise
    is self-similar, so pyramidal LK locks onto false nearby matches and
    reports a bounded ~30 px displacement no matter how far the viewport
    actually moved - the keyframe gate then never fires. Layering a
    low-frequency color field (unique region appearance) with sparse large
    high-contrast shapes plus light noise keeps matches anchored to the
    true texture location."""
    import cv2

    rng = np.random.default_rng(seed)
    # Low-frequency field: a tiny random image smoothly upsampled so every
    # neighborhood of the full texture has a distinct color context.
    coarse = rng.uniform(0, 255, (9, 9, 3)).astype(np.uint8)
    tex = cv2.resize(coarse, (width, height), interpolation=cv2.INTER_CUBIC)
    # Sparse large unique shapes: strong corners with unambiguous identity.
    n_shapes = max(40, (height * width) // 40000)
    for _ in range(n_shapes):
        c = tuple(int(v) for v in rng.uniform((0, 0), (width, height)))
        color = tuple(int(v) for v in rng.uniform(0, 255, 3))
        r = int(rng.uniform(18, 70))
        if rng.uniform() < 0.5:
            cv2.circle(tex, c, r, color, -1)
        else:
            cv2.rectangle(tex, (c[0] - r, c[1] - r), (c[0] + r, c[1] + r),
                          color, -1)
    # Light high-frequency noise feeds Shi-Tomasi without washing out the
    # large-scale structure.
    noise = rng.normal(0, 18, (height, width, 3))
    tex = np.clip(tex.astype(np.float32) + noise, 0, 255).astype(np.uint8)
    return cv2.GaussianBlur(tex, (0, 0), max(blur_sigma * 0.5, 0.8))


def camera_path(n_frames: int, span_x: float, span_y: float,
                loop: bool) -> np.ndarray:
    """(N, 2) pixel offsets of the viewport. `loop` returns to the start."""
    t = np.linspace(0.0, 1.0, n_frames)
    if loop:
        ang = 2 * np.pi * t
        xs = 0.5 * span_x * (1 - np.cos(ang))
        ys = 0.5 * span_y * np.sin(ang)
    else:
        xs = span_x * t
        ys = span_y * t
    return np.stack([xs, ys], axis=1)


def generate_sequence(out_dir: str, n_frames: int = 60,
                      size: tuple[int, int] = (640, 480), loop: bool = True,
                      seed: int = 0, step_px: float = 18.0,
                      tum_layout: bool = False) -> list[str]:
    """Write frames; returns the file list.

    `tum_layout` writes a TUM-RGBD-style dataset instead of a flat folder:
    rgb/<timestamp>.png frames plus groundtruth.txt ("t x y z qx qy qz qw",
    identity rotations, the pan path as translation) - enough to drive the
    run_eval harness (association + Sim3 ATE + CSV) without a real dataset.
    """
    import cv2

    w, h = size
    span = step_px * n_frames
    span_y = span * 0.15
    tex = make_texture(h + int(span_y) + 200,
                       w + int(span) + 200, seed=seed)
    path = camera_path(n_frames, span_x=span * (0.5 if loop else 1.0),
                       span_y=span_y, loop=loop)
    # Loop paths swing y negative; bias the viewport origin so SIGNED y
    # indexes the texture (an abs() here would fold the path and desync
    # the written groundtruth from the actual camera motion).
    y_bias = int(np.ceil(max(0.0, -path[:, 1].min())))
    img_dir = os.path.join(out_dir, "rgb") if tum_layout else out_dir
    os.makedirs(img_dir, exist_ok=True)
    names = []
    t0 = 1000.0
    gt_rows = []
    for i, (x, y) in enumerate(path):
        x0 = int(100 + x)
        y0 = int(100 + y_bias + y)
        frame = tex[y0:y0 + h, x0:x0 + w]
        stamp = t0 + i / 30.0
        base = f"{stamp:.6f}.png" if tum_layout else f"{i:04d}.png"
        name = os.path.join(img_dir, base)
        cv2.imwrite(name, frame)
        names.append(name)
        gt_rows.append(f"{stamp:.6f} {x / 100.0:.6f} {y / 100.0:.6f} 0.0 "
                       "0.0 0.0 0.0 1.0")
    if tum_layout:
        with open(os.path.join(out_dir, "groundtruth.txt"), "w") as f:
            f.write("# timestamp tx ty tz qx qy qz qw\n")
            f.write("\n".join(gt_rows) + "\n")
    return names


def main():
    p = argparse.ArgumentParser(description="Generate a synthetic sequence")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--n_frames", type=int, default=60)
    p.add_argument("--size", type=int, nargs=2, default=(640, 480),
                   metavar=("W", "H"))
    p.add_argument("--no_loop", action="store_true",
                   help="straight pan instead of a loop trajectory")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tum_layout", action="store_true",
                   help="write rgb/<timestamp>.png + groundtruth.txt")
    args = p.parse_args()
    names = generate_sequence(args.out_dir, n_frames=args.n_frames,
                              size=tuple(args.size), loop=not args.no_loop,
                              seed=args.seed, tum_layout=args.tum_layout)
    print(f"wrote {len(names)} frames to {args.out_dir}")


if __name__ == "__main__":
    main()
