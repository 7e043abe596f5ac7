"""Block-config sweep of the PRODUCTION flash kernel at the exact
global-attention shape (S=33: B=1, H=16, N=34353, D=64, in-kernel rope,
traced valid_len) - checks whether the probe's bk=4096 win transfers.

Usage: python scripts/bench_prod_flash_blocks.py [--iters 6]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from vggt_slam_tpu.ops.attention import flash_attention
from vggt_slam_tpu.utils.profiling import enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--n", type=int, default=34353)
    args = ap.parse_args()
    enable_compilation_cache()

    B, H, N, D = 1, 16, args.n, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.bfloat16)
    cos = jnp.asarray(rng.uniform(-1, 1, size=(N, D // 2)), jnp.float32)
    sin = jnp.asarray(rng.uniform(-1, 1, size=(N, D // 2)), jnp.float32)
    flops = 4.0 * B * H * N * N * D
    iters = args.iters

    for bq, bk in [(1024, 2048), (2048, 2048), (1024, 4096), (2048, 4096),
                   (2048, 8192), (4096, 4096)]:

        def run(bq=bq, bk=bk):
            @jax.jit
            def loop(q, k, v, vl):
                def body(i, carry):
                    acc, q = carry
                    qq = q + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-6))
                    out = flash_attention(qq, k, v, valid_len=vl,
                                          block_q=bq, block_k=bk,
                                          rope_q=(cos, sin),
                                          rope_k=(cos, sin))
                    return acc + jnp.sum(out.astype(jnp.float32)), q

                acc, _ = jax.lax.fori_loop(0, iters, body,
                                           (jnp.float32(0), q))
                return acc

            vl = jnp.int32(N)
            float(loop(q, k, v, vl))  # compile+warm
            t0 = time.time()
            s = float(loop(q, k, v, vl))
            dt = (time.time() - t0) / iters
            return dt, s

        try:
            dt, _ = run()
            print(f"prod bq={bq:5d} bk={bk:5d}: {dt*1e3:7.2f} ms "
                  f"{flops/dt/1e12:6.1f} TF/s")
        except Exception as e:
            print(f"prod bq={bq:5d} bk={bk:5d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:110]}")


if __name__ == "__main__":
    main()
