"""Time ONE DPT head forward at production shape, standalone.

Isolates the head from the 10-minute full-model compile so head-level
changes can be iterated quickly. Production shape: S=33 frames, 392x518
input (28x37 patch grid), 2048-d captured tokens, out_channels=4.

Usage: python scripts/bench_dpt_head.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from vggt_slam_tpu.models.vggt.config import VGGTConfig
from vggt_slam_tpu.models.vggt.heads import DPTHead


def main():
    print("backend:", jax.default_backend())
    cfg = VGGTConfig.vggt_1b()
    S, H, W = 33, 392, 518
    P = (H // 14) * (W // 14)
    ns = cfg.tokens_per_frame_special
    dim = 2 * cfg.agg_dim

    head = DPTHead(cfg, out_channels=4)
    rng = np.random.default_rng(0)

    def make_captured(x):
        return {**{d: x for d in cfg.dpt_layers}, "patch_start": ns}

    tok = jnp.asarray(rng.normal(size=(S, ns + P, dim)) * 0.1, jnp.bfloat16)
    t0 = time.time()
    # mixed str/int dict keys aren't a valid jit pytree; close over the dict
    params = jax.jit(lambda t: head.init(jax.random.PRNGKey(0),
                                         make_captured(t), (H, W)))(tok)
    jax.block_until_ready(params)
    print(f"init: {time.time() - t0:.1f}s")

    @jax.jit
    def loop(params, tok):
        def body(i, acc):
            t = tok * (1.0 + 1e-6 * i.astype(tok.dtype))
            out = head.apply(params, make_captured(t), (H, W))
            return acc + out.reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, 5, body, jnp.float32(0.0))

    t0 = time.time()
    float(loop(params, tok))
    print(f"compile+first: {time.time() - t0:.1f}s")
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        float(loop(params, tok))
        best = min(best, (time.time() - t0) / 5)
    print(f"DPT head forward: {best * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
