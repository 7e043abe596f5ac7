"""Loop-closure retrieval quality: precision/recall vs ground-truth overlap.

The masker has a quality yardstick (evals/mask_eval.py); loop-closure
retrieval had none (VERDICT r3 item 7) — the smoke test only asserted
"≥1 loop closure found". This harness scores the retrieval BACKENDS
against exact synthetic ground truth:

  * synthetic revisit sequences (tools/synth3d.py "loop" paths: the
    camera returns to its starting viewpoint, like the reference's
    office_loop acceptance sample, reference README.md:132-143);
  * the reference's matching rule exactly — per query frame, best
    (min-L2) frame over all OLDER submaps excluding the previous one
    (reference map.py:38-64), accepted when L2 < 0.80
    (reference loop_closure.py:80-91);
  * ground truth from the GT camera poses: a query↔match pair is a true
    revisit when the camera centers are within `--dist_thresh` (world
    units) AND the optical axes within `--ang_thresh` degrees.

Reported per backend: precision (accepted matches that are true
revisits), recall (queries with ≥1 eligible true revisit whose accepted
match is one), and accept rate. Backends: `tiny` (the weight-free
shipping default for no-checkpoint runs) and `salad_random` (random-init
SALAD — the floor that justifies the trusted-descriptor gate in
slam/loop_closure.py: random descriptors must NOT clear the 0.80 bar).

CLI:
  python -m vggt_slam_tpu.evals.retrieval_quality \
      [--n_sequences 3] [--out evals/results/retrieval_quality.csv]
"""
from __future__ import annotations

import argparse
import csv
import os

import numpy as np


def render_sequence(seed: int, n_frames: int, image_hw: tuple[int, int]):
    """In-memory loop sequence: (frames (S,3,H,W) float[0,1], centers,
    rotations world->cam)."""
    from vggt_slam_tpu.tools import synth3d
    H, W = image_hw
    scene = synth3d.make_scene(seed=seed)
    centers, rots = synth3d.camera_path(n_frames, seed=seed, kind="loop")
    K = synth3d.camera_intrinsics(H, W)
    frames = np.empty((n_frames, 3, H, W), np.float32)
    for i in range(n_frames):
        rgb, _, _ = synth3d.render(scene, centers[i], rots[i], K, (H, W))
        frames[i] = rgb.transpose(2, 0, 1)
    return frames, centers, rots


def make_backend(name: str):
    if name == "tiny":
        from vggt_slam_tpu.models.retrieval import tiny_image_descriptor_fn
        return tiny_image_descriptor_fn()
    if name == "salad_random":
        # Random-init SALAD: the floor. ImageRetrieval's trusted gate
        # DISABLES this in the product path; the harness calls the
        # descriptor directly to measure why that gate exists.
        import jax
        import jax.numpy as jnp

        from vggt_slam_tpu.models.retrieval import SALAD, SALADConfig
        cfg = (SALADConfig() if jax.default_backend() == "tpu"
               else SALADConfig.tiny())
        model = SALAD(cfg)
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 3, 224, 224)))
        fwd = jax.jit(model.apply)

        def run(frames):
            import jax.image as jimage
            x = jnp.asarray(frames, jnp.float32)
            x = jimage.resize(x, (x.shape[0], 3, 224, 224), "bilinear")
            return np.asarray(fwd(params, x))

        return run
    raise ValueError(f"unknown backend {name!r}")


def score_sequence(desc: np.ndarray, centers: np.ndarray, rots: np.ndarray,
                   submap_size: int, accept_thresh: float,
                   dist_thresh: float, ang_thresh_deg: float) -> dict:
    """Apply the reference matching rule and score vs pose ground truth."""
    S = desc.shape[0]
    sub_of = np.arange(S) // submap_size
    n_sub = int(sub_of.max()) + 1
    # viewing direction = camera -z? world->cam rows: optical axis in world
    # is R^T @ [0,0,1] (z forward, synth3d convention).
    axes = np.einsum("nij->nji", rots)[:, :, 2]
    cos_thr = np.cos(np.radians(ang_thresh_deg))

    def is_revisit(i, j) -> bool:
        return (np.linalg.norm(centers[i] - centers[j]) < dist_thresh
                and float(axes[i] @ axes[j]) > cos_thr)

    queries = accepted = true_accepted = gt_pos = 0
    top1_accepted = top1_true = 0
    for q in range(2, n_sub):
        eligible = np.flatnonzero(sub_of <= q - 2)
        if eligible.size == 0:
            continue
        submap_best = None  # (score, query_idx, match_idx)
        for qi in np.flatnonzero(sub_of == q):
            queries += 1
            gt_pos += any(is_revisit(qi, j) for j in eligible)
            d = np.linalg.norm(desc[eligible] - desc[qi], axis=1)
            best = int(eligible[np.argmin(d)])
            score = float(d.min())
            if score < accept_thresh:
                accepted += 1
                # A true accepted match implies the query had a GT
                # revisit, so recall = true_accepted / gt_revisit_queries.
                true_accepted += is_revisit(qi, best)
                if submap_best is None or score < submap_best[0]:
                    submap_best = (score, qi, best)
        if submap_best is not None:
            # max_loops=1 operating point: the single most-similar
            # accepted match per submap is what actually becomes a loop
            # factor (reference LoopMatchQueue + main.py --max_loops 1).
            top1_accepted += 1
            top1_true += is_revisit(submap_best[1], submap_best[2])
    return {"queries": queries, "gt_revisit_queries": gt_pos,
            "accepted": accepted, "true_accepted": true_accepted,
            "precision": round(true_accepted / accepted, 4)
            if accepted else "",
            "recall": round(true_accepted / gt_pos, 4) if gt_pos else "",
            "accept_rate": round(accepted / queries, 4) if queries else "",
            "top1_accepted": top1_accepted, "top1_true": top1_true,
            "top1_precision": round(top1_true / top1_accepted, 4)
            if top1_accepted else ""}


def run(backends, n_sequences=3, n_frames=80, image_hw=(196, 256),
        submap_size=8, accept_thresh=0.80, dist_thresh=0.15,
        ang_thresh_deg=15.0, seed_base=7_000_000):
    rows = []
    for b in backends:
        fn = make_backend(b)
        for s in range(n_sequences):
            frames, centers, rots = render_sequence(seed_base + s, n_frames,
                                                    image_hw)
            desc = np.asarray(fn(frames))
            row = {"backend": b, "sequence": s,
                   **score_sequence(desc, centers, rots, submap_size,
                                    accept_thresh, dist_thresh,
                                    ang_thresh_deg)}
            rows.append(row)
            print(row, flush=True)
    return rows


def summarize(rows):
    out = []
    for b in sorted({r["backend"] for r in rows}):
        sub = [r for r in rows if r["backend"] == b]
        acc = sum(r["accepted"] for r in sub)
        tru = sum(r["true_accepted"] for r in sub)
        gtp = sum(r["gt_revisit_queries"] for r in sub)
        t1a = sum(r["top1_accepted"] for r in sub)
        t1t = sum(r["top1_true"] for r in sub)
        out.append({"backend": b, "n_sequences": len(sub),
                    "queries": sum(r["queries"] for r in sub),
                    "accepted": acc,
                    "precision": round(tru / acc, 4) if acc else "",
                    "recall": round(tru / gtp, 4) if gtp else "",
                    "top1_precision": round(t1t / t1a, 4) if t1a else ""})
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--backends", nargs="+",
                   default=["tiny", "salad_random"])
    p.add_argument("--n_sequences", type=int, default=3)
    p.add_argument("--n_frames", type=int, default=80)
    p.add_argument("--image_hw", type=int, nargs=2, default=(196, 256))
    p.add_argument("--submap_size", type=int, default=8)
    p.add_argument("--accept_thresh", type=float, default=0.80)
    p.add_argument("--dist_thresh", type=float, default=0.15)
    p.add_argument("--ang_thresh_deg", type=float, default=15.0)
    p.add_argument("--out", default="evals/results/retrieval_quality.csv")
    args = p.parse_args()

    rows = run(args.backends, args.n_sequences, args.n_frames,
               tuple(args.image_hw), args.submap_size, args.accept_thresh,
               args.dist_thresh, args.ang_thresh_deg)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}")
    for s in summarize(rows):
        print(s)


if __name__ == "__main__":
    main()
