"""Benchmark: end-to-end per-submap SLAM step on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures the amortized frames/sec of the full per-submap pipeline at the
north-star operating point (BASELINE.md: submap size 32, TUM-like 392x518
input, >20 FPS target on one v5e chip): SALAD retrieval descriptors +
VGGT-1B forward on S=33 frames (32 new + 1 overlap) + depth unprojection +
SL(4) RANSAC registration + pose-graph LM step, averaged over repeated
submaps. Inputs are synthetic
(no dataset ships in this environment); the compute profile is identical
to the real pipeline for everything except keyframing/IO, which the driver
measures downstream of the open-source datasets.

Operating modes - BOTH are measured every run:
  * merged (the headline + the CLI default --global_kv_stride 8
    --global_merge sim): FastVGGT-style similarity token merging in global
    attention - one K/V slot per 8 patch tokens of non-reference frames,
    dropped tokens merged into their most-similar kept neighbor with
    proportional attention (ToMe), assignment shared across all 24 global
    blocks. Rationale: exact global attention at S=33 costs 116
    TFLOP/submap, above what a single v5e can serve at 20 FPS even at the
    flash kernel's D=64 utilization ceiling; the trained-checkpoint ATE
    A/B measured both stride 4 and stride 8 within the pipeline's numeric
    noise of exact attention (evals/results/ab_attention*.csv), matching
    FastVGGT's negligible-loss report at aggressive merge ratios.
  * exact (reported as "exact_fps" in the same JSON line): stride 1, exact
    attention semantics per reference solver.py:469-471.
BENCH_KV_STRIDE / BENCH_KV_MERGE override the headline operating point.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main_sharded(seq_parallel: bool):
    """Multi-chip bench: the same per-submap step with the forward jitted
    over a ("dp","tp") mesh spanning ALL visible devices — the runnable
    artifact behind the multi-chip exact-attention scaling claim
    (ARCHITECTURE.md §7: ring attention serves the exact path at ~2.36s/n
    per submap). With --seq_parallel the exact path runs RING attention
    over dp (packed-layout stats kernels, K/V rotating via ppermute);
    otherwise the dp all-gather path. On this environment's single chip
    the mesh is dp=1 (the code path is identical; the number becomes
    meaningful the day n>1 chips appear — run `python bench.py
    --seq_parallel` there).
    """
    import jax
    import jax.numpy as jnp

    from vggt_slam_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from vggt_slam_tpu.models.vggt.config import VGGTConfig
    from vggt_slam_tpu.models.vggt.model import VGGT
    from vggt_slam_tpu.ops import pose_graph as pg_ops
    from vggt_slam_tpu.ops.homography import ransac_projective
    from vggt_slam_tpu.parallel.infer import make_sharded_submap_forward
    from vggt_slam_tpu.parallel.mesh import make_mesh
    from vggt_slam_tpu.slam.graph import PoseGraph

    backend = jax.default_backend()
    n_dev = len(jax.devices())
    tp = int(os.environ.get("BENCH_TP", "1"))
    mesh = make_mesh(tp=tp)
    log(f"backend: {backend}; mesh: {dict(mesh.shape)}; "
        f"seq_parallel: {seq_parallel}")

    SUBMAP = 32
    S = SUBMAP + 1
    H, W = 392, 518
    on_tpu = backend == "tpu"
    stride = int(os.environ.get("BENCH_KV_STRIDE", "16"))

    def make_cfg(stride):
        if not on_tpu:
            return VGGTConfig.tiny(img_size=518, global_kv_stride=stride)
        return VGGTConfig.vggt_1b(attn_impl="flash",
                                  global_kv_stride=stride,
                                  enable_point_head=False)

    t0 = time.time()
    model = VGGT(make_cfg(stride))
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 3, H, W)))
    jax.block_until_ready(params)
    log(f"init: {time.time() - t0:.1f}s")

    # Merged path: plain dp/tp sharding (the 4-8x-smaller merged K/V set
    # all-gathers cheaply). Exact path: ring attention iff seq_parallel.
    fwd_m, params_sh, bucket, mesh = make_sharded_submap_forward(
        model, params, S, mesh=mesh, with_unprojection=True,
        image_hw=(H, W))
    fwd_e, _, _, _ = make_sharded_submap_forward(
        VGGT(make_cfg(1)), params, S, mesh=mesh, with_unprojection=True,
        seq_parallel=seq_parallel, image_hw=(H, W))

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(bucket, 3, H, W)), jnp.float32)
    n_pts = H * W
    pts_prev = jnp.asarray(rng.uniform(-1, 1, (n_pts, 3)) + [0, 0, 3],
                           jnp.float32)
    weights = jnp.ones((n_pts,), jnp.float32)
    pg = PoseGraph("sl4", dtype=np.float32)
    pg.add_homography(0, np.eye(4))
    pg.add_prior_factor(0, np.eye(4))
    for k in range(1, 40):
        pg.add_homography(k, np.eye(4))
        pg.add_between_factor(k - 1, k, np.eye(4))
    arrays = pg._build_arrays()

    @jax.jit
    def checksum(a, b, c, d):
        return jnp.sum(a) + jnp.sum(b) + jnp.sum(c) + d

    def make_step(fwd):
        def step(key):
            out = fwd(params_sh, imgs, jnp.int32(S))
            pts = out["unproj_points_cf"][:, 0].reshape(3, -1).T
            Hrel, _ = ransac_projective(pts, pts_prev, weights, key=key)
            values, err = pg_ops.optimize(arrays, manifold="sl4",
                                          max_iters=10)
            return out["pose_enc"], Hrel, values, err
        return step

    def sync(res):
        return float(checksum(res[0], res[1], res[2], res[3]))

    def measure(step, label):
        t0 = time.time()
        sync(step(jax.random.PRNGKey(0)))
        log(f"[{label}] compile+first step: {time.time() - t0:.1f}s")
        times = []
        for i in range(4):
            t0 = time.time()
            sync(step(jax.random.PRNGKey(i)))
            times.append(time.time() - t0)
        best = min(times)
        fps = SUBMAP / best
        log(f"per-submap [{label}]: {best*1e3:.0f} ms -> {fps:.2f} FPS "
            f"(times: {[f'{t:.2f}' for t in times]})")
        return fps

    fps = measure(make_step(fwd_m), f"shard merged stride={stride}")
    exact_fps = measure(
        make_step(fwd_e),
        "shard exact ring" if seq_parallel else "shard exact")

    print(json.dumps({
        "metric": "tum_style_submap32_e2e_fps_shard",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 20.0, 3),
        "exact_fps": round(exact_fps, 2),
        "exact_vs_baseline": round(exact_fps / 20.0, 3),
        "n_devices": n_dev,
        "mesh": dict(mesh.shape),
        "seq_parallel": bool(seq_parallel),
        "operating_point": f"global_kv_stride={stride}",
    }))


def main():
    import jax
    import jax.numpy as jnp

    from vggt_slam_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    from vggt_slam_tpu.models.vggt.config import VGGTConfig
    from vggt_slam_tpu.models.vggt.model import VGGT
    from vggt_slam_tpu.ops import geometry
    from vggt_slam_tpu.ops.homography import ransac_projective
    from vggt_slam_tpu.ops import pose_graph as pg_ops
    from vggt_slam_tpu.slam.graph import PoseGraph

    backend = jax.default_backend()
    log(f"backend: {backend}; devices: {jax.devices()}")

    SUBMAP = 32
    S = SUBMAP + 1
    H, W = 392, 518

    on_tpu = backend == "tpu"
    stride = int(os.environ.get("BENCH_KV_STRIDE", "16"))
    merge = os.environ.get("BENCH_KV_MERGE", "sim")
    # Global-attention QK^T numerics (both operating points): bf16 by
    # default, matching the CLI; BENCH_QK_INT8=1 opts into the in-kernel
    # int8 path (measured slower on the exact path - config.global_qk_int8).
    qk_int8 = os.environ.get("BENCH_QK_INT8", "0") == "1"
    # enable_point_head=False matches the CLI's default depth-unprojection
    # operating point: the point head's map is never consumed there
    # (reference solver.py:249-256), so the SLAM step doesn't pay it.
    # BENCH_POINT_HEAD=1 restores it (the --use_point_map profile).
    point_head = os.environ.get("BENCH_POINT_HEAD", "0") == "1"

    # BENCH_SOFTMAX=online overrides the global-attention flash softmax
    # variant (default: the config default; see VGGTConfig.global_softmax).
    from dataclasses import fields as _dc_fields
    _sm_default = next(f.default for f in _dc_fields(VGGTConfig)
                       if f.name == "global_softmax")
    softmax = os.environ.get("BENCH_SOFTMAX", _sm_default)

    def make_cfg(stride, merge):
        if not on_tpu:
            # CPU fallback so the bench still runs everywhere (tiny model).
            return VGGTConfig.tiny(img_size=518, global_kv_stride=stride,
                                   global_merge=merge, global_qk_int8=qk_int8,
                                   global_softmax=softmax,
                                   enable_point_head=point_head)
        return VGGTConfig.vggt_1b(attn_impl="flash",
                                  global_kv_stride=stride, global_merge=merge,
                                  global_qk_int8=qk_int8,
                                  global_softmax=softmax,
                                  enable_point_head=point_head)

    cfg = make_cfg(stride, merge)
    log(f"global_kv_stride: {stride}; merge: {merge}; qk_int8: {qk_int8}; "
        f"softmax: {softmax}; point_head: {point_head}; "
        f"cpu_fallback: {not on_tpu}")

    model = VGGT(cfg)
    # Exact-attention model shares the SAME parameters (merging is a
    # config-only change); both operating points are measured every run.
    model_exact = VGGT(make_cfg(1, merge))
    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 3, H, W)))
    jax.block_until_ready(params)
    log(f"init: {time.time() - t0:.1f}s")

    # SALAD retrieval descriptors run once per submap in the real loop
    # (reference solver.py:428); include that forward for honesty.
    from vggt_slam_tpu.models.retrieval import SALAD, SALADConfig
    scfg = SALADConfig() if on_tpu else SALADConfig.tiny()
    salad = SALAD(scfg)
    salad_params = jax.jit(salad.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 3, 224, 224)))
    salad_fwd = jax.jit(salad.apply)

    fwd = jax.jit(model.apply)
    fwd_exact = jax.jit(model_exact.apply)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(S, 3, H, W)), dtype=jnp.float32)
    imgs224 = jnp.asarray(rng.uniform(size=(S, 3, 224, 224)),
                          dtype=jnp.float32)

    # Registration inputs: one frame's point map vs the previous anchor.
    n_pts = H * W
    pts_prev = jnp.asarray(rng.uniform(-1, 1, (n_pts, 3)) + [0, 0, 3],
                           dtype=jnp.float32)
    weights = jnp.ones((n_pts,), jnp.float32)

    # Pose graph at a typical size (64-node bucket).
    pg = PoseGraph("sl4", dtype=np.float32)
    pg.add_homography(0, np.eye(4))
    pg.add_prior_factor(0, np.eye(4))
    for k in range(1, 40):
        pg.add_homography(k, np.eye(4))
        pg.add_between_factor(k - 1, k, np.eye(4))
    arrays = pg._build_arrays()

    @jax.jit
    def checksum(a, b, c, d):
        return jnp.sum(a) + jnp.sum(b) + jnp.sum(c) + d

    def make_submap_step(forward):
        def submap_step(params, imgs, imgs224, pts_prev, weights, arrays, key):
            desc = salad_fwd(salad_params, imgs224)
            out = forward(params, imgs)
            extr, intr = geometry.pose_encoding_to_extri_intri(
                out["pose_enc"], (H, W))
            pts = geometry.unproject_depth_map_to_point_map(
                out["depth"], extr, intr)
            Hrel, _ = ransac_projective(pts[0].reshape(-1, 3), pts_prev,
                                        weights, key=key)
            values, err = pg_ops.optimize(arrays, manifold="sl4", max_iters=10)
            return out["pose_enc"] + jnp.sum(desc) * 1e-30, Hrel, values, err
        return submap_step

    submap_step = make_submap_step(fwd)
    submap_step_exact = make_submap_step(fwd_exact)

    def sync(res):
        # axon's block_until_ready does not reliably wait; force a host
        # readback of ONE scalar derived from every output (a single fused
        # readback - per-output readbacks would each pay the tunnel's
        # round-trip latency and overstate the step time).
        return float(checksum(res[0], res[1], res[2], res[3]))

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    sync(submap_step(params, imgs, imgs224, pts_prev, weights, arrays, key))
    log(f"compile+first step: {time.time() - t0:.1f}s")

    trace_dir = os.environ.get("BENCH_TRACE_DIR")
    if trace_dir:
        # One traced step for op-level analysis; read with
        # `python -m vggt_slam_tpu.utils.xplane <dir>`.
        with jax.profiler.trace(trace_dir):
            sync(submap_step(params, imgs, imgs224, pts_prev, weights,
                             arrays, key))
        log(f"trace written to {trace_dir}")

    def measure(step, label):
        times = []
        for i in range(4):
            t0 = time.time()
            sync(step(params, imgs, imgs224, pts_prev, weights, arrays,
                      jax.random.PRNGKey(i)))
            times.append(time.time() - t0)
        best = min(times)
        fps = SUBMAP / best
        log(f"per-submap [{label}]: {best*1e3:.0f} ms -> {fps:.2f} FPS "
            f"(times: {[f'{t:.2f}' for t in times]})")
        return fps

    fps = measure(submap_step, f"merged stride={stride} {merge}")

    if stride > 1:
        t0 = time.time()
        sync(submap_step_exact(params, imgs, imgs224, pts_prev, weights,
                               arrays, key))
        log(f"exact compile+first step: {time.time() - t0:.1f}s")
        exact_fps = measure(submap_step_exact, "exact stride=1")
    else:
        exact_fps = fps

    # Third operating point: exact attention with int8 QK^T. Since the
    # static-max softmax made the global kernel MXU-bound, the int8 2x
    # matmul rate shows through end-to-end on the exact path (measured
    # 12.53 -> 14.03 FPS; on the merged path int8 is a wash, so the
    # headline stays bf16). Skipped when BENCH_QK_INT8=1 already made the
    # main configs int8.
    if qk_int8:
        exact_int8_fps = exact_fps
    else:
        import dataclasses
        model_exact_i8 = VGGT(dataclasses.replace(
            make_cfg(1, merge), global_qk_int8=True))
        step_exact_i8 = make_submap_step(jax.jit(model_exact_i8.apply))
        t0 = time.time()
        sync(step_exact_i8(params, imgs, imgs224, pts_prev, weights,
                           arrays, key))
        log(f"exact-int8 compile+first step: {time.time() - t0:.1f}s")
        exact_int8_fps = measure(step_exact_i8, "exact stride=1 qk_int8")

    # Keyframe disparity gate - runs once per INPUT frame in the CLI loop
    # (more often than the per-submap forward). Compare the host cv2 LK
    # path against the jitted on-device tracker (slam/keyframe_jax). The
    # measured ~200x gap (the LK point loop is gather-bound on TPU) is why
    # --keyframe_backend auto resolves to cv2; "jax" is an explicit opt-in.
    import cv2
    from vggt_slam_tpu.slam.keyframe import FrameTracker
    coarse = rng.uniform(40, 220, (24, 32)).astype(np.float32)
    tex = cv2.resize(coarse, (W, H), interpolation=cv2.INTER_CUBIC)
    img0 = np.clip(np.stack([tex] * 3, -1), 0, 255).astype(np.uint8)
    img1 = np.roll(img0, 3, axis=1)  # ~3 px flow: tracks survive

    def gate_ms(backend):
        try:
            ft = FrameTracker(backend=backend)
            ft.initialize_keyframe(img0)
            ft.compute_disparity(img1, 1e9)  # warm-up / compile
            t0 = time.time()
            n = 20
            for _ in range(n):
                ft.compute_disparity(img1, 1e9)
            ms = (time.time() - t0) / n * 1e3
            log(f"keyframe gate [{backend}]: {ms:.2f} ms/frame")
            return round(ms, 2)
        except Exception as e:  # pragma: no cover - report, don't fail bench
            log(f"keyframe gate [{backend}] failed: {e}")
            return None

    kf_host_ms = gate_ms("cv2")
    kf_device_ms = gate_ms("jax")

    print(json.dumps({
        "metric": "tum_style_submap32_e2e_fps_single_chip",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 20.0, 3),
        "exact_fps": round(exact_fps, 2),
        "exact_vs_baseline": round(exact_fps / 20.0, 3),
        "exact_int8_fps": round(exact_int8_fps, 2),
        "operating_point": f"global_kv_stride={stride},merge={merge},"
                           f"qk_int8={int(qk_int8)},softmax={softmax}",
        "keyframe_gate_ms_host_cv2": kf_host_ms,
        "keyframe_gate_ms_device_jax": kf_device_ms,
    }))


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--shard", action="store_true",
                    help="jit the forward over a (dp,tp) mesh spanning all "
                         "visible devices (BENCH_TP sets tp; dp = n/tp)")
    ap.add_argument("--seq_parallel", action="store_true",
                    help="with the sharded bench: run the exact path as "
                         "ring attention over dp (implies --shard)")
    a = ap.parse_args()
    if a.shard or a.seq_parallel or os.environ.get("BENCH_SHARD") == "1":
        main_sharded(a.seq_parallel
                     or os.environ.get("BENCH_SEQ_PARALLEL") == "1")
    else:
        main()
