"""VGGT-SLAM CLI: incremental dense SLAM over an image folder.

Mirrors the reference entry point (main.py:17-200): same flags, same
per-frame keyframe gate -> per-submap solve loop -> optimize -> write-back
flow, same artifacts (result.pcd, frame_output/*.npz, TUM pose log,
per-frame pointcloud logs), COLMAP alignment hook, and focal-length plot.

Run:  python -m vggt_slam_tpu.main --image_folder <dir> [flags]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

parser = argparse.ArgumentParser(description="TPU-native VGGT-SLAM")
parser.add_argument("--image_folder", type=str, default="examples/kitchen/images/")
parser.add_argument("--vis_map", action="store_true",
                    help="visualize the map incrementally (requires viser)")
parser.add_argument("--vis_flow", action="store_true")
parser.add_argument("--log_results", action="store_true")
parser.add_argument("--skip_dense_log", action="store_true")
parser.add_argument("--log_path", type=str, default="poses.txt")
parser.add_argument("--use_sim3", action="store_true")
parser.add_argument("--plot_focal_lengths", action="store_true")
parser.add_argument("--submap_size", type=int, default=16)
parser.add_argument("--overlapping_window_size", type=int, default=1,
                    help="ONLY DEFAULT OF 1 SUPPORTED RIGHT NOW")
parser.add_argument("--downsample_factor", type=int, default=1)
parser.add_argument("--max_loops", type=int, default=1)
parser.add_argument("--min_disparity", type=float, default=50)
parser.add_argument("--loop_inlier_thresh", type=float, default=0.9,
                    help="geometric loop verification: reject a retrieval "
                         "hit whose registration-RANSAC inlier fraction "
                         "falls below this FRACTION OF the running median "
                         "of the sequential registrations' inlier "
                         "fractions (the sequential registration re-"
                         "registers the same overlap image, so its "
                         "fraction is the achievable max under the "
                         "model's noise — the gate self-calibrates). The "
                         "reference accepts every hit under the 0.80 "
                         "descriptor bar (its SALAD is trained); the "
                         "weight-free tiny backend needs the gate "
                         "(precision 0.31-0.83, evals/results/"
                         "retrieval_quality.csv). 0 = reference "
                         "semantics (no gate). Default calibrated on the "
                         "synthetic revisit harness (retrieval_quality "
                         "--geometric_gate): true revisits land at ratio "
                         "1.0-1.08, false hits at 0.27-0.86")
parser.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="force the JAX platform. The TPU plugin ignores "
                         "JAX_PLATFORMS=cpu, so subprocess drivers (smoke "
                         "runs, CI) that must not touch the chip pass "
                         "--platform cpu instead")
parser.add_argument("--keyframe_backend", default="auto",
                    choices=["auto", "cv2", "jax"],
                    help="keyframe disparity gate: host OpenCV LK or the "
                         "jitted on-device tracker (slam/keyframe_jax). "
                         "auto = cv2 (the gate is gather-bound; measured "
                         "~200x faster on host, see bench.py gate rows)")
parser.add_argument("--use_point_map", action="store_true")
parser.add_argument("--conf_threshold", type=float, default=25.0)
parser.add_argument("--vis_stride", type=int, default=1)
parser.add_argument("--vis_point_size", type=float, default=0.003)
parser.add_argument("--save_path", type=str, default=None)
parser.add_argument("--keep_alive", action="store_true")
parser.add_argument("--semantic_emb_dir", type=str, default=None)
parser.add_argument("--get_voxel", action="store_true")
parser.add_argument("--voxel_size", type=float, default=0.05)
parser.add_argument("--voxel_save_dir", type=str, default=None)
parser.add_argument("--voxel_port", type=int, default=8081)
parser.add_argument("--voxel_point_size", type=float, default=0.01)
parser.add_argument("--colmap_images_txt", type=str, default=None)
parser.add_argument("--align_no_scale", action="store_true")
parser.add_argument("--checkpoint", type=str, default=None,
                    help="path to converted VGGT weights (orbax/npz); random init if absent")
parser.add_argument("--retrieval_checkpoint", type=str, default=None,
                    help="path to converted SALAD retrieval weights; loop "
                         "closure is DISABLED when absent (random "
                         "descriptors would insert bogus loop factors)")
parser.add_argument("--retrieval_backend", default="salad",
                    choices=["salad", "tiny"],
                    help="place-recognition descriptors: the SALAD network "
                         "(needs --retrieval_checkpoint) or the weight-free "
                         "tiny-image descriptor (models/retrieval."
                         "tiny_image_descriptor_fn) - enables loop closure "
                         "with no external weights")
parser.add_argument("--model_size", type=str, default="1b",
                    choices=["1b", "small", "small64", "small256", "tiny"],
                    help="model configuration (small64 = small at the "
                         "flagship D=64 head-dim)")
parser.add_argument("--global_kv_stride", type=int, default=None,
                    help="FastVGGT-style global-attention K/V token merging "
                         "budget: one K/V slot per N patch tokens of "
                         "non-reference frames (1 = exact attention). "
                         "Default: 16 for model widths outside the fenced "
                         "sim-merge family (agg_dim > 128: 1b, small256), "
                         "8 otherwise — the r5 composite A/B measured "
                         "stride 16's trajectory cost statistically "
                         "indistinguishable from stride 8's and from the "
                         "merge-free softmax-matched baseline "
                         "(evals/results/ab_attention_s256_paired.csv: "
                         "merge knob -0.003 m [-0.015, +0.010] at n=40) "
                         "while benching 32.89 vs 30.88 FPS; "
                         "--global_merge sim merges dropped tokens into "
                         "their most-similar kept neighbor rather than "
                         "discarding them")
parser.add_argument("--global_merge", type=str, default="sim",
                    choices=["sim", "stride"],
                    help="how the reduced K/V set is formed when "
                         "--global_kv_stride > 1: 'sim' = ToMe-style "
                         "similarity merging with proportional attention "
                         "(FastVGGT's method); 'stride' = plain subsampling")
parser.add_argument("--global_softmax", type=str, default=None,
                    choices=["online", "static"],
                    help="flash-softmax variant for the global attention "
                         "blocks (default: the model config's default). "
                         "'static' swaps the kernel's running max for a "
                         "precomputed logit bound - exact softmax, one "
                         "fewer VPU pass per logits tile; see "
                         "config.global_softmax")
parser.add_argument("--qk_int8", action="store_true",
                    help="run global-attention QK^T on the in-kernel int8 "
                         "MXU path (measured: +1.2%% FPS merged, -3.6%% "
                         "exact vs the default bf16; max |err| ~1e-3 vs "
                         "f32 instead of ~2e-4 - see config.global_qk_int8)")
parser.add_argument("--attn_impl", type=str, default=None,
                    choices=["flash", "chunked"],
                    help="attention implementation override (default: "
                         "flash Pallas kernels on TPU, chunked XLA "
                         "elsewhere). The two are parity-tested "
                         "(tests/test_attention.py); chunked is the "
                         "fallback when a narrow-width flash geometry "
                         "hits the axon worker fault family "
                         "(ARCHITECTURE.md section 9)")
parser.add_argument("--profile_dir", type=str, default=None,
                    help="write a jax.profiler trace of the run here")
parser.add_argument("--no_pipeline", action="store_true",
                    help="disable the dispatch-ahead pipeline (serial "
                         "reference flow: forward, integrate, repeat)")
parser.add_argument("--shard", action="store_true",
                    help="run the VGGT forward sharded over ALL visible "
                         "devices on a (dp,tp) mesh (frames over dp, "
                         "Megatron TP on qkv/mlp); single-device otherwise")
parser.add_argument("--seq_parallel", action="store_true",
                    help="with --shard and exact attention "
                         "(--global_kv_stride 1): run global attention as "
                         "RING attention over the dp axis (K/V chunks "
                         "rotate via ppermute over ICI) instead of "
                         "all-gathering the full token axis per block")
parser.add_argument("--timing", action="store_true",
                    help="accumulate per-stage wall times (keyframing, "
                         "dispatch, integrate) and print a summary")


def build_model_fn(args):
    """Load / init VGGT and return the prediction callable + metadata."""
    import jax
    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from vggt_slam_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from vggt_slam_tpu.models.vggt.config import VGGTConfig
    from vggt_slam_tpu.models.vggt.model import VGGT
    from vggt_slam_tpu.models.vggt.convert import load_checkpoint

    on_tpu = jax.default_backend() == "tpu"
    attn_impl = (getattr(args, "attn_impl", None)
                 or ("flash" if on_tpu else "chunked"))
    stride = getattr(args, "global_kv_stride", 1)
    if stride is None:
        # Data-backed default (r5): stride 16 where the width is outside
        # the fenced sim-merge family — ATE-equivalent to stride 8 AND to
        # exact attention under the matched softmax
        # (ab_attention_s256_paired.csv) and ~6.5% faster end-to-end
        # (32.89 vs 30.88 FPS). Narrow widths keep 8 (the stride-16
        # narrow-width program is the measured worker-fatal family,
        # aggregator._check_fatal_merge_family).
        agg_dim = {"tiny": 32, "small": 128, "small64": 128,
                   "small256": 256}.get(args.model_size, 1024)
        stride = 16 if agg_dim > 128 else 8
    # In the default depth-unprojection mode the point head's (3,S,H,W) map
    # is never consumed (registration unprojects from depth, reference
    # solver.py:249-256) - skip its ~77 ms of compute and ~320 MB of
    # per-submap readback entirely. --use_point_map re-enables it.
    point_head = bool(getattr(args, "use_point_map", False))
    merge = getattr(args, "global_merge", "sim")
    qk_int8 = bool(getattr(args, "qk_int8", False))
    sm_kw = {}
    if getattr(args, "global_softmax", None):
        sm_kw["global_softmax"] = args.global_softmax
    if args.model_size == "tiny":
        cfg = VGGTConfig.tiny(img_size=518, attn_impl=attn_impl,
                              global_kv_stride=stride,
                              global_merge=merge, global_qk_int8=qk_int8,
                              enable_point_head=point_head, **sm_kw)
    elif args.model_size in ("small", "small64", "small256"):
        mk = {"small": VGGTConfig.small, "small64": VGGTConfig.small64,
              "small256": VGGTConfig.small256}[args.model_size]
        cfg = mk(attn_impl=attn_impl,
                 global_kv_stride=stride, global_merge=merge,
                 global_qk_int8=qk_int8,
                 enable_point_head=point_head, **sm_kw)
    else:
        cfg = VGGTConfig.vggt_1b(attn_impl=attn_impl,
                                 global_kv_stride=stride, global_merge=merge,
                                 global_qk_int8=qk_int8,
                                 enable_point_head=point_head, **sm_kw)
    model = VGGT(cfg)

    h, w = 392, 518  # recomputed per batch below; init shape is flexible
    print("Initializing VGGT model...")
    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 3, h, w)))
    if args.checkpoint:
        params = load_checkpoint(args.checkpoint, params)
        print(f"Loaded checkpoint {args.checkpoint}")
    else:
        print("WARNING: no --checkpoint given; running with RANDOM weights "
              "(pipeline check only, geometry will be meaningless)")
    jax.block_until_ready(params)
    print(f"model ready in {time.time() - t0:.1f}s")

    # Static submap bucket: submap_size + overlap + loop budget, so every
    # per-submap forward (including the last partial one) reuses one
    # compiled program. In pipelined mode the model_fn returns device arrays
    # (dispatch only); the solver materializes them at integration time.
    bucket = args.submap_size + args.overlapping_window_size + args.max_loops
    as_numpy = getattr(args, "no_pipeline", True)
    if getattr(args, "shard", False):
        from vggt_slam_tpu.parallel.infer import make_sharded_bucketed_model_fn
        print(f"Sharding the forward over {jax.device_count()} devices")
        return make_sharded_bucketed_model_fn(
            model, params, bucket, as_numpy=as_numpy,
            with_unprojection=point_head is False,
            seq_parallel=bool(getattr(args, "seq_parallel", False)))
    from vggt_slam_tpu.models.vggt.model import make_bucketed_model_fn
    return make_bucketed_model_fn(model, params, bucket, as_numpy=as_numpy,
                                  with_unprojection=point_head is False)


def run_slam(args, *, model_fn=None, retrieval=None):
    """Run the full SLAM loop for one sequence described by `args`.

    `model_fn` / `retrieval` may be passed in to reuse an already-built
    (and already-compiled) model across runs - the warm-process eval mode
    (evals/run_eval.py --in_process) relies on this: per-trial wall time
    then excludes the ~30-200 s model init + compile that dominates
    subprocess-per-trial sweeps. Returns a dict with the solver and
    end-to-end timing.
    """
    if getattr(args, "platform", None):
        import jax
        jax.config.update("jax_platforms", args.platform)
    import cv2

    from vggt_slam_tpu.data.images import (downsample_images,
                                           list_image_folder)
    from vggt_slam_tpu.slam.solver import Solver

    viewer = None
    if args.vis_map or args.keep_alive:
        try:
            from vggt_slam_tpu.viz.viser_viewer import ViserViewer
            viewer = ViserViewer()
        except ImportError:
            print("viser not installed; continuing headless")

    if retrieval is None:
        from vggt_slam_tpu.slam.loop_closure import ImageRetrieval
        descriptor_fn = None
        if getattr(args, "retrieval_backend", "salad") == "tiny":
            from vggt_slam_tpu.models.retrieval import tiny_image_descriptor_fn
            descriptor_fn = tiny_image_descriptor_fn()
        retrieval = ImageRetrieval(
            descriptor_fn=descriptor_fn,
            batch_bucket=args.submap_size + args.overlapping_window_size,
            checkpoint=args.retrieval_checkpoint)
    solver = Solver(init_conf_threshold=args.conf_threshold,
                    use_point_map=args.use_point_map,
                    use_sim3=args.use_sim3,
                    viewer=viewer,
                    retrieval=retrieval,
                    vis_stride=args.vis_stride,
                    vis_point_size=args.vis_point_size,
                    keyframe_backend=getattr(args, "keyframe_backend",
                                             "auto"),
                    loop_inlier_thresh=getattr(args, "loop_inlier_thresh",
                                               0.0))
    if model_fn is None:
        model_fn = build_model_fn(args)

    image_names = list_image_folder(args.image_folder)
    image_names = downsample_images(image_names, args.downsample_factor)
    print(f"Found {len(image_names)} images")
    if not image_names:
        sys.exit(f"no images in {args.image_folder}")

    if args.profile_dir:
        import jax
        jax.profiler.start_trace(args.profile_dir)

    focal_data = []
    subset: list[str] = []
    t_start = time.time()

    from vggt_slam_tpu.utils.profiling import StageTimer
    timer = StageTimer() if args.timing else None
    solver.timer = timer

    def load_semantics(paths):
        if args.semantic_emb_dir is None:
            return None
        embs = []
        for img_path in paths:
            stem = os.path.splitext(os.path.basename(img_path))[0]
            emb_path = os.path.join(args.semantic_emb_dir, f"{stem}.npz")
            if not os.path.exists(emb_path):
                raise FileNotFoundError(
                    f"Missing semantic embedding for {img_path}: {emb_path}")
            embs.append(np.load(emb_path)["embedding"])
        return np.stack(embs, axis=0)

    import contextlib

    def stage(name):
        return timer.stage(name) if timer else contextlib.nullcontext()

    def integrate(predictions):
        if "outputs" in predictions:  # still a pending dispatch
            with stage("collect_predictions"):
                predictions = solver.collect_predictions(predictions)
        focal_data.append(predictions["intrinsic"][:, 0, 0])
        with stage("add_points"):
            solver.add_points(predictions)
        with stage("graph_optimize"):
            solver.graph.optimize()
            solver.map.update_submap_homographies(solver.graph)
        if args.vis_map:
            if len(predictions["detected_loops"]) > 0:
                solver.update_all_submap_vis()
            else:
                solver.update_latest_submap_vis()

    # Dispatch-ahead pipeline (default): submap k+1's retrieval + forward is
    # dispatched BEFORE submap k is integrated, so the host-side work
    # (keyframing the next frames, the ~100MB prediction readback, RANSAC
    # inputs, graph bookkeeping) overlaps the device forward. The loop
    # search sees the same submap set as the reference's serial flow
    # (solver.dispatch_predictions docstring).
    pipeline = not args.no_pipeline
    pending = None
    next_id = 0
    for image_name in image_names:
        with stage("keyframe_gate"):
            img = cv2.imread(image_name)
            is_kf = solver.flow_tracker.compute_disparity(
                img, args.min_disparity, args.vis_flow)
        if is_kf:
            subset.append(image_name)

        is_last = image_name == image_names[-1]
        if len(subset) == args.submap_size + args.overlapping_window_size or \
                (is_last and len(subset) > 1):
            semantic_embeddings = load_semantics(subset)
            if pipeline:
                with stage("dispatch_predictions"):
                    new_pending = solver.dispatch_predictions(
                        subset, model_fn, args.max_loops,
                        semantic_embeddings=semantic_embeddings,
                        new_id=next_id, previous_in_map=(pending is None))
                if pending is not None:
                    integrate(pending)
                pending = new_pending
            else:
                with stage("run_predictions"):
                    preds = solver.run_predictions(
                        subset, model_fn, args.max_loops,
                        semantic_embeddings=semantic_embeddings)
                integrate(preds)
            next_id += 1
            subset = subset[-args.overlapping_window_size:]
    if pending is not None:
        integrate(pending)

    n_frames = len(image_names)
    dt = time.time() - t_start
    print(f"Total number of submaps in map {solver.map.get_num_submaps()}")
    print(f"Total number of loop closures in map {solver.graph.get_num_loops()}")
    print(f"Processed {n_frames} frames in {dt:.1f}s "
          f"({n_frames / dt:.2f} FPS end-to-end)")
    if timer is not None:
        print("Per-stage timing:")
        print(timer.report())

    if args.profile_dir:
        import jax
        jax.profiler.stop_trace()

    if args.colmap_images_txt is not None:
        print(f"Aligning map to COLMAP poses: {args.colmap_images_txt}")
        solver.map.align_scale_to_colmap(args.colmap_images_txt,
                                         with_scale=not args.align_no_scale)

    if not args.vis_map and viewer is not None:
        solver.update_all_submap_vis()

    if args.save_path:
        os.makedirs(args.save_path, exist_ok=True)
        file_name = os.path.join(args.save_path, "result.pcd")
        print(f"Saving point cloud to {file_name}...")
        solver.map.write_points_to_file(file_name)
        frame_output_dir = os.path.join(args.save_path, "frame_output")
        print(f"Saving per-frame outputs to {frame_output_dir}...")
        solver.map.save_frame_outputs(frame_output_dir,
                                      ignore_loop_closure_frames=True)

    if args.log_results:
        solver.map.write_poses_to_file(args.log_path)
        if not args.skip_dense_log:
            solver.map.save_framewise_pointclouds(
                args.log_path.replace(".txt", "_logs"))

    if args.get_voxel and args.semantic_emb_dir:
        vm = solver.map.build_semantic_voxel_map(voxel_size=args.voxel_size)
        if args.voxel_save_dir:
            vm.save_to_directory(args.voxel_save_dir)
            print(f"Saved semantic voxel map to {args.voxel_save_dir}")

    if args.plot_focal_lengths:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        colors = plt.cm.viridis(np.linspace(0, 1, len(focal_data)))
        plt.figure(figsize=(8, 6))
        for i, values in enumerate(focal_data):
            plt.scatter([i] * len(values), values, color=colors[i])
        plt.xlabel("poses")
        plt.ylabel("Focal lengths")
        plt.grid()
        plt.savefig("focal_lengths.png")
        print("Saved focal_lengths.png")

    if args.keep_alive and viewer is not None:
        print("\nViser server is running. Press Enter to exit...")
        try:
            input()
        except (KeyboardInterrupt, EOFError):
            pass

    return {"solver": solver, "n_frames": n_frames, "wall_s": dt,
            "fps": n_frames / dt, "timer": timer}


def main():
    run_slam(parser.parse_args())


if __name__ == "__main__":
    main()
