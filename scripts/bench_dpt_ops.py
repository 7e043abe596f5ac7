"""Probe the DPT head's resample ops on the TPU.

The checkpoint-faithful DPT rework (learned ConvTranspose resize layers +
align_corners=True bilinear) regressed the e2e bench 20.9 -> 18.2 FPS, i.e.
~110 ms per DPT head call at S=33, 392x518. This probe times each candidate
implementation of the two new op families on the production shapes so the
fast one can be chosen with evidence:

  resize (align-corners) : gather (jnp.take) vs interp-matrix einsum
                           vs jax.image.resize (half-pixel, for scale only)
  ConvTranspose k=stride : einsum+reshape vs lax.conv_transpose

Timing discipline per ARCHITECTURE.md section 8: ops looped inside one jit
with per-iteration input perturbation (defeats LICM), single fused scalar
readback (axon block_until_ready returns early).

Usage: python scripts/bench_dpt_ops.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, args, iters=10):
    @jax.jit
    def loop(*args):
        def body(i, acc):
            a0 = args[0] * (1.0 + 1e-6 * i.astype(args[0].dtype))
            o = fn(a0, *args[1:])
            return acc + o.reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        float(loop(*args))
        best = min(best, (time.time() - t0) / iters)
    return best


# --- align-corners resize candidates -----------------------------------------

def resize_gather(x, out_hw):
    def axis_interp(x, size, axis):
        n = x.shape[axis]
        if size == n:
            return x
        pos = jnp.arange(size, dtype=jnp.float32) * ((n - 1) / (size - 1))
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
        frac = (pos - lo).astype(x.dtype)
        a = jnp.take(x, lo, axis=axis)
        b = jnp.take(x, lo + 1, axis=axis)
        shape = [1] * x.ndim
        shape[axis] = size
        return a + (b - a) * frac.reshape(shape)

    x = axis_interp(x, out_hw[0], 1)
    return axis_interp(x, out_hw[1], 2)


def interp_matrix(n_in, n_out, dtype):
    """(n_out, n_in) align-corners interpolation weights (2 nonzeros/row)."""
    pos = np.arange(n_out, dtype=np.float64) * ((n_in - 1) / max(n_out - 1, 1))
    lo = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 2)
    frac = pos - lo
    A = np.zeros((n_out, n_in), np.float32)
    A[np.arange(n_out), lo] = 1.0 - frac
    A[np.arange(n_out), lo + 1] = frac
    return jnp.asarray(A, dtype)


def resize_matmul(x, Ah, Aw):
    x = jnp.einsum("shwc,Hh->sHwc", x, Ah)
    return jnp.einsum("sHwc,Ww->sHWc", x, Aw)


# --- ConvTranspose (kernel == stride) candidates ------------------------------

def convt_einsum(x, kern):
    S, h, w, ci = x.shape
    k = kern.shape[0]
    y = jnp.einsum("shwc,abcd->shawbd", x, kern)
    return y.reshape(S, h * k, w * k, kern.shape[-1])


def convt_lax(x, kern):
    k = kern.shape[0]
    return jax.lax.conv_transpose(
        x, kern, strides=(k, k), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    S = 33
    dt = jnp.bfloat16

    # Production resize shapes (392x518 input, 28x37 patch grid):
    cases = [
        ("final up 112x148->392x518 c128", (S, 112, 148, 128), (392, 518)),
        ("refinenet up 56x74->112x148 c256", (S, 56, 74, 256), (112, 148)),
        ("refinenet up 28x37->56x74 c256", (S, 28, 37, 256), (56, 74)),
        ("refinenet up 14x19->28x37 c256", (S, 14, 19, 256), (28, 37)),
    ]
    for name, shp, out_hw in cases:
        x = jnp.asarray(rng.normal(size=shp), dt)
        tg = bench(lambda a: resize_gather(a, out_hw), (x,))
        Ah = interp_matrix(shp[1], out_hw[0], dt)
        Aw = interp_matrix(shp[2], out_hw[1], dt)
        tm = bench(resize_matmul, (x, Ah, Aw))
        tj = bench(lambda a: jax.image.resize(
            a, (shp[0],) + out_hw + (shp[3],), "bilinear"), (x,))
        print(f"{name}: gather {tg*1e3:7.2f} ms | matmul {tm*1e3:7.2f} ms | "
              f"jax.image {tj*1e3:7.2f} ms")

    # ConvTranspose shapes (projects output -> resize_layers.0/1):
    for name, shp, k, co in [
        ("convT x4 28x37 c256", (S, 28, 37, 256), 4, 256),
        ("convT x2 28x37 c512", (S, 28, 37, 512), 2, 512),
    ]:
        x = jnp.asarray(rng.normal(size=shp), dt)
        kern = jnp.asarray(rng.normal(size=(k, k, shp[3], co)) * 0.02, dt)
        te = bench(convt_einsum, (x, kern))
        tl = bench(convt_lax, (x, kern))
        print(f"{name}: einsum {te*1e3:7.2f} ms | lax.conv_transpose "
              f"{tl*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
