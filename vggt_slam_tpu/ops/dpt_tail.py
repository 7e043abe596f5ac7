"""Fused DPT output tail as one Pallas kernel.

The tail of each DPT head (reference vggt dpt_head.py lineage:
output_conv1 -> align-corners upsample to (H, W) -> +UV pos-embed ->
output_conv2 [3x3 conv, ReLU, 1x1 conv]) is memory-bound under XLA: the
full-resolution (S, H, W, 128) upsample and pos-add each round-trip ~1.7 GB
of HBM, the 3x3 conv's 32-channel output and the 1x1 conv's 2..4-channel
output tile their minor dims up to 128 lanes (4..42x physical blowup), and
the trace attributes ~30 ms per head to this chain at S=33, 392x518.

This kernel fuses ROW upsample + pos-embed + 3x3 conv + ReLU + 1x1 conv in
VMEM (the cheap COLUMN upsample stays outside as one einsum so the kernel
only addresses whole rows), reading the (S, 8h, W, 128) input once and
writing the C_out maps channel-FIRST (C, S, H, W) f32 - unpadded buffers
that are also the fast layout for host transfer (ARCHITECTURE.md section
8). The 3x3 conv runs per output row as 9 accumulating (W, cin) @
(cin, cmid) MXU dots (tap-concatenation along K trips Mosaic's concat
sublane-offset check; see the in-kernel comment).

Geometry is specialized to the production operating point: output rows
H = 14*patch_h split into 56-row tiles and input rows 8*patch_h into
56-row blocks, i.e. patch_h % 28 == 0 (the 392x518 TUM bucket: patch_h
28). `supported()` gates it.

STATUS: measured 30.0 ms vs the XLA chain's 29.8 ms at S=33 - the per-row
fori_loop serializes DMA/MXU work that XLA pipelines, and Mosaic's
reshape/concat limits force 3x shifted scratch copies. NOT wired into
DPTHead (which instead emits channel-first via a 1x1-conv einsum - the
part of this design that actually paid). Kept, with tests, as a correct
starting point should Mosaic grow lane-dim reshapes or offset-tolerant
concats.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 56          # output rows per grid step (divisible by 8)
_POS_BLK = 64       # pos-embed row block (window = 2 blocks = 128 rows)


def supported(rows_in: int, rows_out: int) -> bool:
    """rows_in = 8*patch_h (refinenet1-doubled grid), rows_out = 14*patch_h."""
    return (rows_in % _TILE == 0 and rows_out % _TILE == 0
            and rows_in >= 2 * _TILE and 7 * rows_in == 4 * rows_out)


def _u_block(t, rows_in: int, rows_out: int):
    """First 56-row input block of the 2-block window for output tile t.

    Identical in index_map and kernel. Derived from the first input row
    needed by the tile's top conv-halo row (t*56 - 1); the clip guarantees
    the second block stays in range, and coverage of the worst-case 35-row
    span inside the 112-row window holds for the align-corners ratio
    (rows_in-1)/(rows_out-1) < 0.58.
    """
    s0 = jnp.maximum(t * _TILE - 1, 0) * (rows_in - 1) // (rows_out - 1)
    return jnp.clip(s0 // _TILE, 0, rows_in // _TILE - 2)


def _p_block(t, pos_blocks: int):
    """First _POS_BLK-row pos block of the 2-block window for tile t."""
    return jnp.clip(jnp.maximum(t * _TILE - 1, 0) // _POS_BLK,
                    0, pos_blocks - 2)


def _sel_row(ref_a, ref_b, idx, n, lead):
    """Row `idx` of two vertically-stacked blocks of n rows each."""
    ia = jnp.clip(idx, 0, n - 1)
    ib = jnp.clip(idx - n, 0, n - 1)
    if lead:
        va = ref_a[0, pl.ds(ia, 1)][0]
        vb = ref_b[0, pl.ds(ib, 1)][0]
    else:
        va = ref_a[pl.ds(ia, 1)][0]
        vb = ref_b[pl.ds(ib, 1)][0]
    return jnp.where(idx < n, va, vb)


def _kernel(x_a, x_b, p_a, p_b, w0_ref, b0_ref, w1t_ref, b1_ref, o_ref,
            rs0, rs1, rs2, *, rows_in, rows_out, W, cin, cmid, cout,
            pos_blocks):
    t = pl.program_id(1)
    ratio = (rows_in - 1) / (rows_out - 1)
    u = _u_block(t, rows_in, rows_out)
    pstart = _p_block(t, pos_blocks) * _POS_BLK

    zcol = jnp.zeros((1, 1, cin), rs0.dtype)

    def one_row(r, _):
        gor = t * _TILE + r - 1                      # global output row
        pos_f = gor.astype(jnp.float32) * ratio
        lo = jnp.clip(jnp.floor(pos_f), 0, rows_in - 2).astype(jnp.int32)
        frac = jnp.clip(pos_f - lo.astype(jnp.float32), 0.0, 1.0)
        ll = lo - u * _TILE
        a = _sel_row(x_a, x_b, ll, _TILE, True).astype(jnp.float32)
        b = _sel_row(x_a, x_b, ll + 1, _TILE, True).astype(jnp.float32)
        pe = _sel_row(p_a, p_b, gor - pstart, _POS_BLK, False)
        row = a + (b - a) * frac + pe.astype(jnp.float32)
        valid = (gor >= 0) & (gor < rows_out)
        row = jnp.where(valid, row, 0.0).astype(rs0.dtype)  # (W, cin)
        # Three column-shifted copies so the conv taps load sublane-aligned
        # (a lane-dim concat of misaligned slices is unsupported and
        # per-tap relayouts dominated a previous version of this kernel).
        head = jax.lax.slice(row, (0, 0), (W - 1, cin))[None]
        tail = jax.lax.slice(row, (1, 0), (W, cin))[None]
        rs0[pl.ds(r, 1), 1:W, :] = head              # in col j-1 at out j
        rs0[pl.ds(r, 1), 0:1, :] = zcol
        rs1[pl.ds(r, 1), :, :] = row[None]
        rs2[pl.ds(r, 1), 0:W - 1, :] = tail
        rs2[pl.ds(r, 1), W - 1:W, :] = zcol
        return 0

    jax.lax.fori_loop(0, _TILE + 2, one_row, 0)

    # One fat (W, 9*cin) @ (9*cin, cmid) MXU dot per output row: the nine
    # taps concatenate along K from the three aligned shift scratches.
    b0v = b0_ref[...].astype(jnp.float32)
    b1v = b1_ref[...].astype(jnp.float32).reshape(cout, 1)

    def conv_row(r, _):
        taps = jnp.concatenate(
            [s[pl.ds(r + dr, 1)][0] for dr in range(3)
             for s in (rs0, rs1, rs2)], axis=-1)             # (W, 9*cin)
        hrow = jax.lax.dot_general(
            taps, w0_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b0v
        hrow = jnp.maximum(hrow, 0.0).astype(taps.dtype)
        orow = jax.lax.dot_general(
            w1t_ref[...].astype(hrow.dtype), hrow,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (cout, W)
        o_ref[:, 0, pl.ds(r, 1), :] = (orow + b1v)[:, None, :]
        return 0

    jax.lax.fori_loop(0, _TILE, conv_row, 0)


def fused_tail(x, pos, w0, b0, w1, b1, interpret: bool = False):
    """Fused upsample+pos+conv3x3+relu+conv1x1, channel-first output.

    Args:
        x: (S, rows_in, W, cin) - output_conv1's result AFTER the column
           upsample to final width W (one einsum outside the kernel).
        pos: (rows_out, W, cin) positional embedding at full resolution
           (already scaled by its 0.1 ratio).
        w0, b0: 3x3 conv params ((3, 3, cin, cmid), (cmid,)).
        w1, b1: 1x1 conv params ((1, 1, cmid, cout) or (cmid, cout), (cout,)).
    Returns:
        (cout, S, rows_out, W) float32.
    """
    S, rows_in, W, cin = x.shape
    rows_out = pos.shape[0]
    assert supported(rows_in, rows_out), (rows_in, rows_out)
    if w1.ndim == 4:
        w1 = w1[0, 0]
    cmid = w0.shape[-1]
    cout = w1.shape[-1]
    n_tiles = rows_out // _TILE

    dt = x.dtype
    pos_blocks = -(-(rows_out + _TILE) // _POS_BLK) + 1
    pos = jnp.pad(pos.astype(dt),
                  ((0, pos_blocks * _POS_BLK - rows_out), (0, 0), (0, 0)))
    # (dr, dc, cin)-major flatten matches the in-kernel tap concat order
    w0r = jnp.asarray(w0).reshape(9 * cin, cmid).astype(dt)
    w1t = jnp.asarray(w1).T.astype(dt)                # (cout, cmid)
    b0 = jnp.asarray(b0, jnp.float32)
    b1 = jnp.asarray(b1, jnp.float32)

    kern = functools.partial(_kernel, rows_in=rows_in, rows_out=rows_out,
                             W=W, cin=cin, cmid=cmid, cout=cout,
                             pos_blocks=pos_blocks)

    out = pl.pallas_call(
        kern,
        grid=(S, n_tiles),
        in_specs=[
            pl.BlockSpec((1, _TILE, W, cin),
                         lambda s, t: (s, _u_block(t, rows_in, rows_out), 0, 0)),
            pl.BlockSpec((1, _TILE, W, cin),
                         lambda s, t: (s, _u_block(t, rows_in, rows_out) + 1,
                                       0, 0)),
            pl.BlockSpec((_POS_BLK, W, cin),
                         lambda s, t: (_p_block(t, pos_blocks), 0, 0)),
            pl.BlockSpec((_POS_BLK, W, cin),
                         lambda s, t: (_p_block(t, pos_blocks) + 1, 0, 0)),
            pl.BlockSpec((9 * cin, cmid), lambda s, t: (0, 0)),
            pl.BlockSpec((cmid,), lambda s, t: (0,)),
            pl.BlockSpec((cout, cmid), lambda s, t: (0, 0)),
            pl.BlockSpec((cout,), lambda s, t: (0,)),
        ],
        out_specs=pl.BlockSpec((cout, 1, _TILE, W),
                               lambda s, t: (0, s, t, 0)),
        out_shape=jax.ShapeDtypeStruct((cout, S, rows_out, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_TILE + 8, W, cin), dt),
            pltpu.VMEM((_TILE + 8, W, cin), dt),
            pltpu.VMEM((_TILE + 8, W, cin), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(x, x, pos, pos, w0r, b0, w1t, b1)
    return out
