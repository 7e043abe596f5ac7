"""Bisect the eval-time scale wobble: model or pipeline? (VERDICT r4 #8)

The r5 scale-consistency training term pins the TRAINING distribution's
scale (depth_scale aux ~= 1.0 on train/val batches,
warmcache/small256_synth/train_log.jsonl), yet the SLAM eval still
reports ate_scale 0.4-2.6 per held-out sequence (evals/results/
ab_attention_s256_rows/). Two candidate sources:

  (a) MODEL: monocular scene scale is visually ambiguous — the model
      cannot recover each held-out scene's absolute scale, so its
      first-submap predictions set a wrong gauge per sequence;
  (b) PIPELINE: the model is scale-correct but registration / graph
      chaining / TUM logging distorts the trajectory scale.

This probe separates them: for each eval sequence, forward the trained
checkpoint on the FIRST submap-sized window (the frames that set the
SLAM gauge) and report pred/GT scale ratios for depth and for the
camera-translation magnitudes — no SLAM in the loop. If these ratios
reproduce the ate_scale spread, the wobble is (a) and absolute-ATE
claims must stay Sim3-aligned; if they sit near 1, dig into (b).

CLI (real chip): python scripts/probe_eval_scale.py [--n_sequences 10]
"""
from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint",
                   default="warmcache/small256_synth/checkpoint.npz")
    p.add_argument("--model_size", default="small256")
    p.add_argument("--seq_root", default="/tmp/ab_synth3d")
    p.add_argument("--n_sequences", type=int, default=10)
    p.add_argument("--frames", type=int, default=10)
    p.add_argument("--out", default="evals/results/eval_scale_probe.csv")
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from vggt_slam_tpu.models.vggt.config import VGGTConfig
    from vggt_slam_tpu.models.vggt.convert import load_checkpoint
    from vggt_slam_tpu.models.vggt.model import VGGT, make_bucketed_model_fn
    from vggt_slam_tpu.tools import synth3d
    from vggt_slam_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    mk = getattr(VGGTConfig, args.model_size)
    cfg = mk(attn_impl="flash" if jax.default_backend() == "tpu"
             else "chunked", global_kv_stride=1, enable_point_head=False)
    model = VGGT(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 3, 392, 518)))
    params = load_checkpoint(args.checkpoint, params)
    fn = make_bucketed_model_fn(model, params, bucket_size=args.frames)

    import csv
    rows = []
    for i in range(args.n_sequences):
        seq = os.path.join(args.seq_root, f"seq{i:03d}")
        rgb_dir = os.path.join(seq, "rgb")
        names = sorted(os.listdir(rgb_dir))[: args.frames]
        import cv2
        imgs = np.stack([
            cv2.cvtColor(cv2.imread(os.path.join(rgb_dir, n)),
                         cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
            for n in names]).transpose(0, 3, 1, 2)
        H, W = imgs.shape[-2:]
        # GT depth for the same frames, re-rendered from the sequence's
        # generator state (write_tum_sequence is seeded by construction:
        # seed = SEQ_SEED_BASE + i, kind="loop").
        from vggt_slam_tpu.evals.ab_attention import SEQ_SEED_BASE
        scene = synth3d.make_scene(seed=SEQ_SEED_BASE + i)
        n_total = len(os.listdir(rgb_dir))
        centers, rots = synth3d.camera_path(n_total, seed=SEQ_SEED_BASE + i,
                                            kind="loop")
        K = synth3d.camera_intrinsics(H, W)
        gt_depth = np.stack([
            synth3d.render(scene, centers[j], rots[j], K, (H, W))[1]
            for j in range(args.frames)])
        extr = synth3d.extrinsics_from_path(centers[:args.frames],
                                            rots[:args.frames])
        rel = synth3d.relative_to_frame0(extr)
        t_gt = np.linalg.norm(rel[1:, :3, 3], axis=1)

        out = fn(imgs)
        pred_depth = np.asarray(out["depth"])[: args.frames, ..., 0]
        enc = np.asarray(out["pose_enc"])[: args.frames]
        t_pred = np.linalg.norm(enc[1:, :3], axis=1)
        row = {
            "sequence": f"seq{i:03d}",
            "depth_ratio": round(float(pred_depth.mean() / gt_depth.mean()),
                                 4),
            "trans_ratio": round(float(t_pred.mean() / (t_gt.mean() + 1e-9)),
                                 4),
            "gt_depth_mean": round(float(gt_depth.mean()), 3),
            "gt_trans_mean": round(float(t_gt.mean()), 4),
        }
        rows.append(row)
        print(row, flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    dr = [r["depth_ratio"] for r in rows]
    tr = [r["trans_ratio"] for r in rows]
    print(f"depth_ratio mean {np.mean(dr):.3f} spread "
          f"[{np.min(dr):.3f}, {np.max(dr):.3f}]")
    print(f"trans_ratio mean {np.mean(tr):.3f} spread "
          f"[{np.min(tr):.3f}, {np.max(tr):.3f}]")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
