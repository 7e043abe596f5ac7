"""Train a small VGGT on synthetic 3D scenes (single chip).

Purpose: make the eval harness ACCURACY-BEARING in this no-egress
environment. The released facebook/VGGT-1B weights cannot be fetched here,
so every end-to-end accuracy number would otherwise ride on random weights
or a deterministic fake. Training `VGGTConfig.small` on the heightfield
generator (tools/synth3d.py) until real geometry emerges gives the SLAM
pipeline a model whose pose/depth predictions respond to the input images -
which is what lets the merged-vs-exact global-attention A/B (evals/ab_*)
measure merging's actual trajectory cost on THIS implementation instead of
citing FastVGGT's paper number.

Losses follow the VGGT paper's recipe (as parallel/train.vggt_loss):
camera pose-encoding regression + confidence-weighted dense depth
(conf * |err| - alpha * log conf), with a pose-weight knob because ATE is a
pose metric. Trains with EXACT attention (global_kv_stride=1); merging is
an inference-time operating point to be A/B'd, not trained through.

CLI:
  python -m vggt_slam_tpu.tools.train_tiny --out warmcache/small_synth \
      [--steps 8000] [--frames 10] [--model_size small]
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_cfg(model_size: str, on_tpu: bool, attn_impl: str | None = None):
    import jax.numpy as jnp

    from vggt_slam_tpu.models.vggt.config import VGGTConfig

    kw = dict(
        # Differentiable flash attention (custom VJP + Pallas backward
        # kernels) on TPU; CPU differentiates through the chunked XLA path.
        # --attn_impl overrides (r4: sustained small64 flash_grad training
        # reliably crashes the axon worker every ~200 steps; chunked XLA
        # sidesteps the Pallas backward kernels entirely).
        attn_impl=attn_impl or ("flash_grad" if on_tpu else "chunked"),
        enable_point_head=False,     # eval CLI unprojects from depth
        global_kv_stride=1,          # train with exact attention
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        # Without remat the backward keeps every global block's chunked
        # softmax residuals live at once - O(depth * (S*N)^2) - which OOMs
        # one chip already at S=10. Per-block recompute caps it at one
        # block's attention matrix.
        remat=True,
    )
    if model_size == "small":
        return VGGTConfig.small(**kw)
    if model_size == "small64":
        return VGGTConfig.small64(**kw)
    if model_size == "small256":
        return VGGTConfig.small256(**kw)
    return VGGTConfig.tiny(img_size=518, **kw)


def save_train_state(opt_state, step: int, path: str) -> None:
    """Optimizer state + step index as a flat npz (crash-resume support).

    The auto-resume wrapper restarts training after axon worker crashes;
    param-only resume (load_checkpoint) restarts Adam moments and the LR
    schedule from scratch each attempt, which under a ~200-step crash
    cadence degenerates into a series of warmup runs. Persisting the
    optax state (whose ScaleByAdamState.count also drives the schedule)
    makes resume a true continuation.
    """
    import jax
    leaves = jax.tree_util.tree_leaves(opt_state)
    np.savez(path, step=np.int64(step),
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})


def load_train_state(opt_state_template, path: str):
    """-> (opt_state, step) restored into the template's tree structure."""
    import jax
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(opt_state_template)
    loaded = [data[f"leaf_{i}"] for i in range(len(leaves))]
    for i, (a, b) in enumerate(zip(loaded, leaves)):
        if np.shape(a) != np.shape(b):
            raise ValueError(f"opt state leaf {i} shape mismatch: "
                             f"{np.shape(a)} vs {np.shape(b)}")
    import jax.numpy as jnp
    restored = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(a, dtype=b.dtype) for a, b in
                  zip(loaded, leaves)])
    return restored, int(data["step"])


def make_loss_fn(cfg, pose_weight: float, conf_alpha: float,
                 scale_weight: float = 0.0):
    import jax.numpy as jnp

    from vggt_slam_tpu.models.vggt.model import VGGT

    model = VGGT(cfg)

    def loss_fn(params, batch):
        out = model.apply(params, batch["images"])
        pose_err = (out["pose_enc"] - batch["pose_enc_gt"]) ** 2
        pose_loss = jnp.mean(pose_err)
        err = jnp.abs(out["depth"][..., 0] - batch["depth_gt"])
        conf = out["depth_conf"]
        depth_loss = jnp.mean(conf * err - conf_alpha * jnp.log(conf))
        aux = {"pose_mse": pose_loss, "depth_l1": jnp.mean(err),
               # Translation-only error: the part ATE actually scores.
               "trans_rmse": jnp.sqrt(jnp.mean(pose_err[:, :3]))}
        loss = pose_weight * pose_loss + depth_loss
        if scale_weight > 0.0:
            # Metric-scale consistency (VERDICT r4 item 8): the eval's
            # Sim3-aligned ATE reports `ate_scale` = GT/estimate scale
            # ratio, and the r4 checkpoints landed at 0.89-1.94 per
            # sequence — the conf-weighted L1 lets a systematic scale
            # bias hide wherever confidence is low (the model down-
            # weights exactly the far regions that anchor scale), and
            # the pose MSE spreads its gradient over all 9 encoding
            # dims rather than the scene-scale mode specifically. Pin
            # the scale mode directly, in log space (symmetric in
            # over/under-scale), on the scene's mean depth and mean
            # camera-translation magnitude: both are smooth O(1)
            # statistics of quantities the batch already carries.
            d_ratio = (jnp.mean(out["depth"][..., 0]) /
                       (jnp.mean(batch["depth_gt"]) + 1e-6))
            t_pred = jnp.linalg.norm(out["pose_enc"][1:, :3], axis=-1)
            t_gt = jnp.linalg.norm(batch["pose_enc_gt"][1:, :3], axis=-1)
            # frame 0 is the identity anchor (zero translation); mean
            # magnitude over the rest is the trajectory's scale mode.
            t_ratio = (jnp.mean(t_pred) + 1e-6) / (jnp.mean(t_gt) + 1e-6)
            scale_loss = (jnp.log(jnp.maximum(d_ratio, 1e-6)) ** 2 +
                          jnp.log(jnp.maximum(t_ratio, 1e-6)) ** 2)
            aux["scale_loss"] = scale_loss
            aux["depth_scale"] = d_ratio
            loss = loss + scale_weight * scale_loss
        return loss, aux

    return loss_fn


def main():
    p = argparse.ArgumentParser(description="Train small VGGT on synth3d")
    p.add_argument("--out", required=True,
                   help="output dir (checkpoint.npz + train_log.jsonl)")
    p.add_argument("--steps", type=int, default=8000)
    p.add_argument("--frames", type=int, default=10,
                   help="frames per scene batch (match the eval submap "
                        "bucket: submap_size + overlap + max_loops)")
    p.add_argument("--image_hw", type=int, nargs=2, default=(392, 518))
    p.add_argument("--model_size", default="small",
                   choices=["small", "small64", "small256", "tiny"])
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--warmup", type=int, default=200)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--clip", type=float, default=1.0)
    p.add_argument("--pose_weight", type=float, default=5.0)
    p.add_argument("--conf_alpha", type=float, default=0.2)
    p.add_argument("--scale_weight", type=float, default=0.0,
                   help="metric-scale consistency weight (log-space depth "
                        "+ translation scale-ratio penalty; 0 = off, the "
                        "pre-r5 recipe). Targets ate_scale ~= 1 on the "
                        "eval set (VERDICT r4 item 8).")
    p.add_argument("--ckpt_every", type=int, default=500)
    p.add_argument("--val_every", type=int, default=250)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", default=None,
                   help="checkpoint.npz to warm-start params from; if a "
                        "sibling <stem>_opt.npz exists, optimizer state + "
                        "step index are restored too (true continuation)")
    p.add_argument("--attn_impl", default=None,
                   choices=["flash_grad", "chunked"],
                   help="override the attention implementation (default: "
                        "flash_grad on TPU, chunked elsewhere)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from vggt_slam_tpu.models.vggt.convert import (load_checkpoint,
                                                   save_checkpoint)
    from vggt_slam_tpu.models.vggt.model import VGGT, param_count
    from vggt_slam_tpu.tools import synth3d
    from vggt_slam_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    on_tpu = jax.default_backend() == "tpu"
    cfg = build_cfg(args.model_size, on_tpu, args.attn_impl)
    H, W = args.image_hw
    os.makedirs(args.out, exist_ok=True)

    model = VGGT(cfg)
    t0 = time.time()
    params = jax.jit(model.init, static_argnums=())(
        jax.random.PRNGKey(args.seed), jnp.zeros((2, 3, H, W)))
    if args.resume:
        params = load_checkpoint(args.resume, params)
        print(f"resumed params from {args.resume}", flush=True)
    n_params = param_count(params)
    print(f"backend={jax.default_backend()} model={args.model_size} "
          f"params={n_params/1e6:.2f}M init={time.time()-t0:.1f}s",
          flush=True)

    warmup = min(args.warmup, max(args.steps // 4, 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, max(args.steps, warmup + 1), args.lr * 1e-2)
    tx = optax.chain(optax.clip_by_global_norm(args.clip),
                     optax.adamw(sched, weight_decay=args.weight_decay))
    opt_state = tx.init(params)
    start_step = 1
    if args.resume:
        opt_path = (args.resume[:-4] if args.resume.endswith(".npz")
                    else args.resume) + "_opt.npz"
        if os.path.exists(opt_path):
            opt_state, last_step = load_train_state(opt_state, opt_path)
            start_step = last_step + 1
            print(f"resumed opt state + step {last_step} from {opt_path}",
                  flush=True)

    loss_fn = make_loss_fn(cfg, args.pose_weight, args.conf_alpha,
                           args.scale_weight)

    @jax.jit
    def train_step(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    eval_loss = jax.jit(loss_fn)

    def get_batch(seed):
        b = synth3d.training_batch(seed, n_frames=args.frames,
                                   image_hw=(H, W))
        return {k: jnp.asarray(v) for k, v in b.items()}

    # Fixed validation scenes (seeds disjoint from the training stream and
    # from the eval sequences, which use small seeds).
    val_batches = [get_batch(1_000_000 + i) for i in range(3)]

    # Prefetch batches on a worker thread: host-side scene rendering
    # (~0.5 s) plus the tunnel transfer (~0.8 s) otherwise serialize with
    # the ~0.4 s device step. device_put from the worker is safe (jax is
    # thread-safe for transfers); the queue bounds host memory.
    import queue
    import threading

    batch_q: "queue.Queue" = queue.Queue(maxsize=3)

    def producer():
        for step in range(start_step, args.steps + 1):
            batch_q.put(get_batch(args.seed * 10_000_000 + step))

    threading.Thread(target=producer, daemon=True).start()

    log_path = os.path.join(args.out, "train_log.jsonl")
    ckpt_path = os.path.join(args.out, "checkpoint.npz")
    meta_path = os.path.join(args.out, "checkpoint_meta.json")
    # Carry best_val across resumes (the auto-resume wrapper restarts this
    # process after transient tunnel/OOM kills): without it, the first
    # validation of a fresh attempt - run at the re-warmed LR, typically
    # worse - would overwrite a better checkpoint.
    best_val = float("inf")
    if args.resume and os.path.exists(meta_path):
        with open(meta_path) as f:
            best_val = float(json.load(f).get("best_val", float("inf")))
        print(f"resumed best_val={best_val:.4f}", flush=True)
    t_start = time.time()
    pending = None  # (step, handles) - read back one step late (async)

    for step in range(start_step, args.steps + 1):
        batch = batch_q.get()
        params, opt_state, loss, aux = train_step(params, opt_state, batch)
        if pending is not None:
            ps, ploss, paux = pending
            row = {"step": ps, "loss": float(ploss),
                   **{k: float(v) for k, v in paux.items()},
                   "wall_s": round(time.time() - t_start, 1)}
            if ps % 25 == 0 or ps == 1:
                with open(log_path, "a") as f:
                    f.write(json.dumps(row) + "\n")
                print(row, flush=True)
        pending = (step, loss, aux)

        if step % args.val_every == 0 or step == args.steps:
            vals = [eval_loss(params, vb) for vb in val_batches]
            vloss = float(np.mean([float(v[0]) for v in vals]))
            vtrans = float(np.mean([float(v[1]["trans_rmse"]) for v in vals]))
            vdepth = float(np.mean([float(v[1]["depth_l1"]) for v in vals]))
            row = {"step": step, "val_loss": vloss, "val_trans_rmse": vtrans,
                   "val_depth_l1": vdepth,
                   "wall_s": round(time.time() - t_start, 1)}
            with open(log_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(row, flush=True)
            if vloss < best_val:
                best_val = vloss
                save_checkpoint(params, ckpt_path)
                with open(meta_path, "w") as f:
                    json.dump({"best_val": best_val, "step": step}, f)
                print(f"saved {ckpt_path} (val_loss {vloss:.4f})", flush=True)

        if step % args.ckpt_every == 0:
            save_checkpoint(params, os.path.join(args.out, "last.npz"))
            save_train_state(opt_state, step,
                             os.path.join(args.out, "last_opt.npz"))

    # Flush the last step's pending train row (the delayed-readback scheme
    # above is always one step behind; without this the final step's
    # metrics never reach the log).
    if pending is not None:
        ps, ploss, paux = pending
        if ps % 25 == 0 or ps == 1:
            row = {"step": ps, "loss": float(ploss),
                   **{k: float(v) for k, v in paux.items()},
                   "wall_s": round(time.time() - t_start, 1)}
            with open(log_path, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(row, flush=True)

    save_checkpoint(params, os.path.join(args.out, "last.npz"))
    save_train_state(opt_state, args.steps,
                     os.path.join(args.out, "last_opt.npz"))
    print(f"done: best val_loss {best_val:.4f}; checkpoint at {ckpt_path}",
          flush=True)


if __name__ == "__main__":
    main()
