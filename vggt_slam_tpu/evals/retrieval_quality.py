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
    rotations world->cam, depths (S,H,W), K)."""
    from vggt_slam_tpu.tools import synth3d
    H, W = image_hw
    scene = synth3d.make_scene(seed=seed)
    centers, rots = synth3d.camera_path(n_frames, seed=seed, kind="loop")
    K = synth3d.camera_intrinsics(H, W)
    frames = np.empty((n_frames, 3, H, W), np.float32)
    depths = np.empty((n_frames, H, W), np.float32)
    for i in range(n_frames):
        rgb, depth, _ = synth3d.render(scene, centers[i], rots[i], K, (H, W))
        frames[i] = rgb.transpose(2, 0, 1)
        depths[i] = depth
    return frames, centers, rots, depths, K


def make_gate_fn(depths: np.ndarray, K: np.ndarray, stride: int = 4,
                 depth_noise: float = 0.02, seed: int = 0,
                 ransac_threshold: float = 0.01):
    """Registration-RANSAC inlier fraction between two frames' clouds.

    Mirrors the Solver's geometric loop gate (slam/solver.py
    loop_inlier_thresh): unproject each frame's depth to a camera-frame
    cloud and score the best projective model between them with the
    PRODUCT RANSAC (ops/homography.ransac_projective, 300 hypotheses /
    0.01 inlier threshold). A true revisit sees the same surface from a
    near-identical viewpoint, so a projective map exists and most points
    are inliers; a false retrieval hit has no consistent mapping.
    Multiplicative depth noise approximates a trained-model depth error
    (the product gate runs on predicted, not GT, unprojections); the
    cloud is pixel-strided for host-side speed.

    Like the Solver, the returned score is the RATIO of the pair's
    inlier fraction to a same-image reference (the same frame's cloud
    under two independent noise draws — the harness analog of the
    Solver's sequential overlap-frame registration), so the gate
    threshold is noise-level-invariant: true revisits score ~1.0+,
    false hits below.
    """
    import jax
    import jax.numpy as jnp

    from vggt_slam_tpu.ops.homography import ransac_projective

    S, H, W = depths.shape
    u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64))
    rays = np.linalg.inv(K) @ np.stack(
        [u, v, np.ones_like(u)], 0).reshape(3, -1)  # (3, H*W)
    rays = rays.reshape(3, H, W)[:, ::stride, ::stride].reshape(3, -1)
    rng = np.random.default_rng(seed)

    def cloud(i: int) -> np.ndarray:
        d = depths[i, ::stride, ::stride].reshape(-1)
        d = d * (1.0 + depth_noise * rng.standard_normal(d.shape))
        return (rays * d).T.astype(np.float32)  # (N, 3) camera frame

    def frac(qi: int, mi: int, salt: int = 0) -> float:
        X1, X2 = cloud(qi), cloud(mi)
        _, count = ransac_projective(
            jnp.asarray(X1), jnp.asarray(X2),
            key=jax.random.PRNGKey(qi * S + mi + salt),
            threshold=ransac_threshold)
        return float(count) / X1.shape[0]

    # Self-calibration reference: same-image pairs under independent
    # noise draws (cloud() draws fresh noise each call).
    ref = float(np.median([frac(i, i, salt=9999)
                           for i in range(S // 6, S, max(S // 3, 1))]))

    def gate(qi: int, mi: int) -> float:
        return frac(qi, mi) / max(ref, 1e-9)

    return gate


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
                   dist_thresh: float, ang_thresh_deg: float,
                   gate_fn=None, gate_thresh: float = 0.9) -> dict:
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
    gate_rows: list[tuple[bool, float]] = []  # (is_true_revisit, inlier_frac)
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
            tru = is_revisit(submap_best[1], submap_best[2])
            top1_true += tru
            if gate_fn is not None:
                frac = gate_fn(submap_best[1], submap_best[2])
                gate_rows.append((bool(tru), frac))
    out = {"queries": queries, "gt_revisit_queries": gt_pos,
           "accepted": accepted, "true_accepted": true_accepted,
           "precision": round(true_accepted / accepted, 4)
           if accepted else "",
           "recall": round(true_accepted / gt_pos, 4) if gt_pos else "",
           "accept_rate": round(accepted / queries, 4) if queries else "",
           "top1_accepted": top1_accepted, "top1_true": top1_true,
           "top1_precision": round(top1_true / top1_accepted, 4)
           if top1_accepted else ""}
    if gate_fn is not None:
        # Post-gate numbers at the Solver's operating threshold: a loop
        # only becomes a graph factor when its registration-RANSAC
        # inlier fraction clears gate_thresh (slam/solver.py
        # loop_inlier_thresh). gate_recall = fraction of TRUE top-1
        # loops that survive the gate (the gate's cost); gate_precision
        # = precision among survivors (the gate's benefit).
        kept = [(t, f) for t, f in gate_rows if f >= gate_thresh]
        kept_true = sum(1 for t, _ in kept if t)
        n_true = sum(1 for t, _ in gate_rows if t)
        tf = [f for t, f in gate_rows if t]
        ff = [f for t, f in gate_rows if not t]
        out.update({
            "gate_kept": len(kept),
            "gate_precision": round(kept_true / len(kept), 4)
            if kept else "",
            "gate_recall_of_true": round(kept_true / n_true, 4)
            if n_true else "",
            "gate_true_frac_median": round(float(np.median(tf)), 4)
            if tf else "",
            "gate_false_frac_median": round(float(np.median(ff)), 4)
            if ff else "",
            "gate_fracs": ";".join(f"{int(t)}:{f:.3f}"
                                   for t, f in gate_rows)})
    return out


def run(backends, n_sequences=3, n_frames=80, image_hw=(196, 256),
        submap_size=8, accept_thresh=0.80, dist_thresh=0.15,
        ang_thresh_deg=15.0, seed_base=7_000_000, geometric_gate=False,
        gate_thresh=0.9):
    rows = []
    for b in backends:
        fn = make_backend(b)
        for s in range(n_sequences):
            frames, centers, rots, depths, K = render_sequence(
                seed_base + s, n_frames, image_hw)
            gate_fn = (make_gate_fn(depths, K, seed=seed_base + s)
                       if geometric_gate else None)
            desc = np.asarray(fn(frames))
            row = {"backend": b, "sequence": s,
                   **score_sequence(desc, centers, rots, submap_size,
                                    accept_thresh, dist_thresh,
                                    ang_thresh_deg, gate_fn=gate_fn,
                                    gate_thresh=gate_thresh)}
            rows.append(row)
            print({k: v for k, v in row.items() if k != "gate_fracs"},
                  flush=True)
    return rows


def summarize(rows, gate_thresh: float = 0.9):
    out = []
    for b in sorted({r["backend"] for r in rows}):
        sub = [r for r in rows if r["backend"] == b]
        acc = sum(r["accepted"] for r in sub)
        tru = sum(r["true_accepted"] for r in sub)
        gtp = sum(r["gt_revisit_queries"] for r in sub)
        t1a = sum(r["top1_accepted"] for r in sub)
        t1t = sum(r["top1_true"] for r in sub)
        row = {"backend": b, "n_sequences": len(sub),
               "queries": sum(r["queries"] for r in sub),
               "accepted": acc,
               "precision": round(tru / acc, 4) if acc else "",
               "recall": round(tru / gtp, 4) if gtp else "",
               "top1_precision": round(t1t / t1a, 4) if t1a else ""}
        fracs = []
        for r in sub:
            for item in str(r.get("gate_fracs", "")).split(";"):
                if ":" in item:
                    t, f = item.split(":")
                    fracs.append((t == "1", float(f)))
        if fracs:
            kept = [(t, f) for t, f in fracs if f >= gate_thresh]
            kt = sum(1 for t, _ in kept if t)
            nt = sum(1 for t, _ in fracs if t)
            row.update({"gate_precision": round(kt / len(kept), 4)
                        if kept else "",
                        "gate_recall_of_true": round(kt / nt, 4)
                        if nt else ""})
        out.append(row)
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
    p.add_argument("--geometric_gate", action="store_true",
                   help="additionally score each top-1 accepted match "
                        "with the Solver's registration-RANSAC inlier "
                        "gate (slam/solver.py loop_inlier_thresh) and "
                        "report post-gate precision/recall")
    p.add_argument("--gate_thresh", type=float, default=0.9)
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"],
                   help="force the JAX platform (the axon plugin ignores "
                        "JAX_PLATFORMS=cpu; this applies the config knob "
                        "before backend init, CLAUDE.md gotcha)")
    p.add_argument("--out", default="evals/results/retrieval_quality.csv")
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    rows = run(args.backends, args.n_sequences, args.n_frames,
               tuple(args.image_hw), args.submap_size, args.accept_thresh,
               args.dist_thresh, args.ang_thresh_deg,
               geometric_gate=args.geometric_gate,
               gate_thresh=args.gate_thresh)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}")
    for s in summarize(rows, gate_thresh=args.gate_thresh):
        print(s)


if __name__ == "__main__":
    main()
