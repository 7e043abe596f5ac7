"""Tracing & per-stage timing (first-class, unlike the reference).

The reference has no profiler hooks at all (SURVEY.md section 5.1 - the perf
evaluator is a placeholder); here every pipeline stage can be timed with
`StageTimer` and whole runs traced with `jax.profiler` via `trace()`.

Device timing caveat: on the axon TPU tunnel `block_until_ready` returns
early, so `sync()` forces a scalar host readback - use it (or StageTimer's
sync argument) around anything you time.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import jax
import jax.numpy as jnp


def sync(tree) -> float:
    """Force device completion by reading back one scalar per leaf array."""
    total = 0.0
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.number):
            total += float(jnp.sum(leaf))
    return total


class StageTimer:
    """Accumulates wall-time per named pipeline stage.

    with timer.stage("vggt_forward", out):   # syncs `out` on exit
        out = model_fn(images)
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self.samples: dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str, sync_tree=None):
        t0 = time.time()
        holder = {}
        try:
            yield holder
        finally:
            if sync_tree is not None:
                sync(sync_tree)
            elif "out" in holder:
                sync(holder["out"])
            dt = time.time() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            self.samples[name].append(dt)

    def summary(self) -> dict:
        # min distinguishes steady-state cost from first-call jit compiles;
        # "tail_mean_ms" averages everything after the first TWO calls
        # (bucket growth usually compiles twice).
        def tail_mean(xs):
            rest = xs[2:] or xs[-1:]
            return round(sum(rest) / len(rest) * 1e3, 2)

        return {name: {"total_s": round(t, 4),
                       "count": self.counts[name],
                       "mean_ms": round(t / max(self.counts[name], 1) * 1e3, 2),
                       "min_ms": round(min(self.samples[name]) * 1e3, 2),
                       "tail_mean_ms": tail_mean(self.samples[name])}
                for name, t in sorted(self.totals.items(),
                                      key=lambda kv: -kv[1])}

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace of the enclosed region (TensorBoard-readable)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

def enable_compilation_cache(path: str = "/root/.cache/jax_comp") -> None:
    """Turn on jax's persistent compilation cache.

    The SLAM pipeline's pose-graph LM recompiles at every power-of-two
    bucket growth (~25 s each on the TPU); with the persistent cache those
    compiles happen once per machine instead of once per run. Safe to call
    multiple times.

    Cold-start seeding: the repo ships pre-compiled executables for the
    flagship programs (the S=33 VGGT-1B forward at both operating points,
    SALAD, the pose-graph solve) under `warmcache/` — a fresh machine of
    the same image (same jax/libtpu, same device kind) would otherwise pay
    ~25 min of XLA compiles on its first run (measured: BENCH_r01.json
    tail). Any seed entries missing from `path` are hard-linked/copied in
    before the cache is enabled; unknown keys are simply never read.
    """
    import os
    import shutil

    import jax

    os.makedirs(path, exist_ok=True)
    seed = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "warmcache")
    if os.path.isdir(seed):
        for name in os.listdir(seed):
            dst = os.path.join(path, name)
            src = os.path.join(seed, name)
            # The seed dir also holds non-cache artifacts (training run
            # dirs, README) — only cache entry FILES are linkable.
            if not os.path.isfile(src):
                continue
            if not os.path.exists(dst):
                try:
                    os.link(src, dst)
                except OSError:
                    try:
                        shutil.copy2(src, dst)
                    except OSError as e:
                        print(f"[profiling] warmcache seed failed: {e}")
                        break
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # older jax: best-effort
        print(f"[profiling] compilation cache unavailable: {e}")
