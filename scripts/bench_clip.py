"""Bench: native flax CLIP crop-encoding throughput on device vs host torch.

The reference embeds every SAM2 mask crop through host-torch CLIP
(reference semantic_embedder.py:215-243, one processor+forward round trip
per mask batch). This measures the native path's batched device
throughput (models/clip.py) at the flagship openai/clip-vit-base-patch32
geometry with random weights (throughput is weight-independent), against
transformers' torch CPU forward on this host.

Methodology per ARCHITECTURE "Axon/tunnel discipline": the device op
loops inside ONE jit with per-iteration input perturbation (else XLA
hoists the forward), and timing uses a scalar host readback.

Usage: python scripts/bench_clip.py [--batch 64] [--loops 8] [--iters 3]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as onp


def device_crops_per_sec(batch: int, loops: int, iters: int,
                         dtype_name: str) -> float:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from vggt_slam_tpu.models.clip import CLIP, CLIPConfig
    from vggt_slam_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    cfg = CLIPConfig.base_patch32(dtype=jnp.bfloat16 if dtype_name == "bf16"
                                  else jnp.float32)
    model = CLIP(cfg)
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (batch, cfg.image_size, cfg.image_size,
                                     3), jnp.float32)
    ids = jnp.zeros((1, cfg.context_length), jnp.int32)
    params = model.init(rng, images, ids)

    # Params ride as jit arguments - closed-over trees embed as HLO
    # constants and axon's remote compile 413s on the oversized body.
    @jax.jit
    def run(p, imgs):
        def body(_, carry):
            x, acc = carry
            x = x + 1e-6  # perturb so XLA cannot hoist the forward
            f = model.apply(p, x, method=CLIP.encode_image)
            return (x, acc + f.sum().astype(jnp.float32))
        return lax.fori_loop(0, loops, body, (imgs, jnp.float32(0.0)))[1]

    float(run(params, images))  # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(params, images))  # scalar readback = real sync on axon
        ts.append(time.perf_counter() - t0)
    return batch * loops / min(ts)


def host_torch_crops_per_sec(batch: int, iters: int) -> float:
    import torch
    import transformers

    torch.manual_seed(0)
    model = transformers.CLIPModel(transformers.CLIPConfig()).eval()
    pix = torch.randn(batch, 3, 224, 224)
    with torch.no_grad():
        model.get_image_features(pix)  # warm
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            model.get_image_features(pix)
            ts.append(time.perf_counter() - t0)
    return batch / min(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--loops", type=int, default=8)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--skip_torch", action="store_true")
    args = p.parse_args()

    out = {"batch": args.batch}
    for dt in ("bf16", "f32"):
        rate = device_crops_per_sec(args.batch, args.loops, args.iters, dt)
        out[f"device_{dt}_crops_per_sec"] = round(rate, 1)
    if not args.skip_torch:
        out["host_torch_f32_crops_per_sec"] = round(
            host_torch_crops_per_sec(args.batch, args.iters), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
