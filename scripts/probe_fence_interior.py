"""Map the worker-fatal sim-merge family's WIDTH boundary (VERDICT r4 #5).

`aggregator._check_fatal_merge_family` fences the measured crashes
(flash + sim merge, agg_dim <= 128, stride >= 16 any D / stride >= 8 at
D >= 64) on the strength of "every agg_dim >= 1024 config is clean" —
leaving widths in (128, 1024) allowed but UNPROBED: a future medium
config could walk into a 15-40 min chip wedge. This script probes that
interior empirically, one config per crash-isolated subprocess (the
A/B harness's liveness-probe pattern): each child builds a small-family
VGGT at (agg_dim, heads, stride) with the SHIPPED composite stack —
attn_impl=flash, global_merge=sim, global_softmax=static — random
weights, runs ONE bucketed forward at the eval geometry (bucket 10,
392x518; the geometry of every measured crash) plus a readback, and
exits 0. The parent records clean/crash/timeout per config into a CSV
and waits for the worker to answer a liveness probe before the next
config. Probe order is chosen so the most decision-relevant width
(256 — the small256 A/B config) runs first.

Results feed `_check_fatal_merge_family`'s predicate and the
ARCHITECTURE section 9 fence-boundary table.

CLI (on the real chip):
  python scripts/probe_fence_interior.py [--out evals/results/fence_probe.csv]
  python scripts/probe_fence_interior.py --one 256 4 8   # child mode
"""
from __future__ import annotations

import argparse
import csv
import os
import subprocess
import sys
import time

# (agg_dim, heads, stride): D = agg_dim/heads. 256/384/512 probe at the
# flagship D=64 (the dim whose family extends down to stride 8).
# Width 192 is STRUCTURALLY EXCLUDED: the packed-heads flash layout
# needs D | 128 and heads % (128/D) == 0, and no factorization of 192
# satisfies both (D in {16,32,64} gives heads {12,6,3} vs hp {8,4,2}) —
# a 192-wide config raises a Pallas BlockSpec error at trace time
# (measured: the 192 rows in the first sweep were this trace error,
# not worker faults) and so can never reach the fault family under the
# flash impl at all.
PROBES = [
    (256, 4, 8),    # the small256 composite A/B operating point
    (256, 4, 16),
    (384, 6, 8),    # D=64
    (384, 6, 16),
    (512, 8, 8),    # D=64
    (512, 8, 16),
]


def run_child(agg_dim: int, heads: int, stride: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vggt_slam_tpu.models.vggt.config import VGGTConfig
    from vggt_slam_tpu.models.vggt.model import VGGT, make_bucketed_model_fn
    from vggt_slam_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    cfg = VGGTConfig.small(
        enc_dim=agg_dim, enc_heads=heads, agg_dim=agg_dim, agg_heads=heads,
        attn_impl="flash", global_merge="sim", global_softmax="static",
        global_kv_stride=stride, enable_point_head=False)
    model = VGGT(cfg)
    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 3, 392, 518)))
    jax.block_until_ready(params)
    print(f"[{agg_dim}/{heads}/s{stride}] init {time.time()-t0:.1f}s",
          flush=True)
    fn = make_bucketed_model_fn(model, params, bucket_size=10)
    imgs = np.random.default_rng(0).uniform(
        size=(10, 3, 392, 518)).astype(np.float32)
    # Two iterations: the measured crashes fire at the first post-init
    # readback, but run a second to catch any warm-path variant.
    for it in range(2):
        t0 = time.time()
        out = fn(imgs * (1.0 + 0.01 * it))
        s = float(np.sum(out["pose_enc"])) + float(np.sum(out["depth"][:2]))
        print(f"[{agg_dim}/{heads}/s{stride}] iter {it} OK "
              f"checksum={s:.5g} wall={time.time()-t0:.1f}s", flush=True)
    print("CLEAN", flush=True)


def wait_device(max_probes: int = 40, wait_s: int = 45) -> bool:
    for i in range(max_probes):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "print(float(jnp.sum(jnp.ones((2,2)))))"],
                capture_output=True, timeout=120)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"device probe {i} failed; waiting {wait_s}s", flush=True)
        time.sleep(wait_s)
    return False


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--one", nargs=3, type=int, default=None,
                   metavar=("AGG_DIM", "HEADS", "STRIDE"))
    p.add_argument("--out", default="evals/results/fence_probe.csv")
    p.add_argument("--timeout", type=int, default=1200,
                   help="per-config wall timeout (compile ~2-4 min at "
                        "these widths; a hung tunnel client counts as "
                        "a crash)")
    p.add_argument("--probes", nargs="+", default=None,
                   help="subset as agg_dim/heads/stride strings")
    args = p.parse_args()

    if args.one:
        run_child(*args.one)
        return

    todo = PROBES
    if args.probes:
        want = set(args.probes)
        todo = [t for t in PROBES if f"{t[0]}/{t[1]}/{t[2]}" in want]

    rows = []
    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            rows = list(csv.DictReader(f))
        done = {(int(r["agg_dim"]), int(r["heads"]), int(r["stride"]))
                for r in rows}
    for agg_dim, heads, stride in todo:
        if (agg_dim, heads, stride) in done:
            print(f"skip cached {agg_dim}/{heads}/s{stride}", flush=True)
            continue
        if not wait_device():
            print("device never recovered; aborting sweep", flush=True)
            break
        cmd = [sys.executable, __file__, "--one", str(agg_dim), str(heads),
               str(stride)]
        print(f"=== probing agg_dim={agg_dim} heads={heads} stride={stride}",
              flush=True)
        t0 = time.time()
        verdict = "clean"
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=args.timeout)
            sys.stdout.write(r.stdout[-2000:])
            if r.returncode != 0 or "CLEAN" not in r.stdout:
                sys.stderr.write(r.stderr[-2000:])
                verdict = f"crash_rc{r.returncode}"
        except subprocess.TimeoutExpired:
            verdict = "timeout"
        rows.append({"agg_dim": agg_dim, "heads": heads,
                     "head_dim": agg_dim // heads, "stride": stride,
                     "verdict": verdict,
                     "wall_s": round(time.time() - t0, 1)})
        print(f"=== {agg_dim}/{heads}/s{stride}: {verdict}", flush=True)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
