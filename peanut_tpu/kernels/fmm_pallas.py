"""Pallas TPU kernel for the fast-sweeping eikonal block sweep.

The XLA formulation of the blocked sweep (fmm.py::_v_sweep) spends ~30us of
dispatch/loop overhead per tiny vector op — with nb x inner x ~8 ops of
sequential structure a (16, 482, 482) solve costs ~700ms.  This kernel runs
each row-block's inner relaxation entirely in VMEM: one pallas_call per
directed sweep, sequential TPU grid over row blocks, the previous block's
boundary row carried in VMEM scratch across grid steps.  Same math as the
XLA path (segmented min-plus scans + Godunov updates), ~20x faster.

Used automatically on TPU; tests run it in interpreter mode on CPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1.0e10

# Batch-tile VMEM budget for the sweep kernels: bt doubles while
# 2*bt*block*w*4 bytes stays under this.  The grid over row blocks is
# SEQUENTIAL (carry dependency), so larger batch tiles directly divide the
# number of latency-bound grid steps; v5e VMEM comfortably holds the
# ~12 live (bt, block, w) f32 buffers at bt=16/w=480 (~6 MB).
_TILE_BUDGET = int(os.environ.get("PEANUT_SWEEP_TILE_BUDGET", 400_000))


def _seg_scan_lr(d, wall, w: int, reverse: bool):
    """Hillis-Steele segmented min-plus scan along the last axis (in-VMEM).

    Computes x[i] = min(d[i], x[i-1] + 1) (or the mirrored x[i+1] recurrence
    for ``reverse``) with walls blocking propagation; see fmm.py::
    _seg_scan_1d for the affine-min algebra.  No lax.rev (unsupported in
    Mosaic): the reverse scan shifts from the right instead of flipping.
    """
    a = jnp.where(wall, BIG, 1.0)
    b = jnp.where(wall, BIG, d)
    s = 1
    while s < w:
        pad_a = jnp.full(a.shape[:-1] + (s,), 0.0, a.dtype)
        pad_b = jnp.full(b.shape[:-1] + (s,), BIG, b.dtype)
        if not reverse:
            a_n = jnp.concatenate([pad_a, a[..., :-s]], axis=-1)
            b_n = jnp.concatenate([pad_b, b[..., :-s]], axis=-1)
        else:
            a_n = jnp.concatenate([a[..., s:], pad_a], axis=-1)
            b_n = jnp.concatenate([b[..., s:], pad_b], axis=-1)
        # cur outer, neighbour prefix/suffix inner:
        # (a, b) = (a_cur + a_n, min(b_cur, b_n + a_cur))
        b = jnp.minimum(b, b_n + a)
        a = jnp.minimum(a_n + a, BIG)
        s *= 2
    return jnp.minimum(d, b)


def _godunov(a, b):
    diff = a - b
    direct = jnp.minimum(a, b) + 1.0
    disc = jnp.sqrt(jnp.maximum(2.0 - diff * diff, 0.0))
    both = 0.5 * (a + b + disc)
    return jnp.where(jnp.abs(diff) >= 1.0, direct, both)


def _sweep_kernel_batched(d_ref, wall_ref, nxt_ref, out_ref, carry_ref,
                          *, inner: int, w: int, nb: int,
                          scan_chunk: int = 1):
    """One row-block relaxation step.  Shapes: d/wall/nxt blocks are
    (Bt, R, W); carry scratch is (Bt, 1, W).  Grid is (batch_tiles, nb)
    with the row-block index innermost, so the carry resets per tile.

    ``scan_chunk``: run the two segmented min-plus scans once per
    ``scan_chunk`` Godunov stencil iterations instead of every iteration.
    The scans exist to jump distance across long horizontal runs (the
    stencil alone moves 1 cell/iteration); they cost ~4x the stencil
    (2 x log2(W) shift+min steps vs one 5-point update), so amortizing
    them is where the sweep time goes.  All updates stay monotone
    min-updates, so the fixed point is unchanged; scan_chunk=1 is the
    original schedule."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        carry_ref[...] = jnp.full_like(carry_ref, BIG)

    blk = d_ref[...]
    wall = wall_ref[...] > 0.5
    top = carry_ref[...]                                # (B, 1, W)
    # old first row of the NEXT block (garbage-clamped on the last block)
    is_last = k == nb - 1
    nxt_first = nxt_ref[:, 0:1, :]
    bottom = jnp.where(is_last, BIG, nxt_first)

    def stencil(_, blk):
        up = jnp.concatenate([top, blk[:, :-1, :]], axis=1)
        down = jnp.concatenate([blk[:, 1:, :], bottom], axis=1)
        a = jnp.minimum(up, down)
        left = jnp.concatenate(
            [jnp.full(blk.shape[:-1] + (1,), BIG, blk.dtype),
             blk[..., :-1]], axis=-1)
        right = jnp.concatenate(
            [blk[..., 1:],
             jnp.full(blk.shape[:-1] + (1,), BIG, blk.dtype)], axis=-1)
        b = jnp.minimum(left, right)
        cand = _godunov(a, b)
        return jnp.where(wall, BIG, jnp.minimum(blk, cand))

    def body(_, blk):
        blk = _seg_scan_lr(blk, wall, w, reverse=False)
        blk = _seg_scan_lr(blk, wall, w, reverse=True)
        return jax.lax.fori_loop(0, scan_chunk, stencil, blk)

    blk = jax.lax.fori_loop(0, inner // scan_chunk, body, blk)
    out_ref[...] = blk
    carry_ref[...] = blk[:, -1:, :]


@functools.partial(jax.jit,
                   static_argnames=("block", "inner", "scan_chunk",
                                    "interpret"))
def pallas_block_sweep(d, wall, block: int = 16, inner: int = 40,
                       scan_chunk: int = 1, interpret: bool = False):
    """One downward directed sweep over (B, H, W) grids (Pallas).

    H must be padded to a multiple of ``block`` by the caller.
    ``inner`` counts Godunov stencil iterations and must be divisible by
    ``scan_chunk`` (the scans run once per chunk — see the kernel).
    """
    if inner % scan_chunk:
        raise ValueError(f"inner={inner} not divisible by "
                         f"scan_chunk={scan_chunk}")
    bsz, h, w = d.shape
    nb = h // block
    wallf = wall.astype(jnp.float32)

    # tile the batch so VMEM stays within budget (~8 live buffers of
    # bt x block x W f32 plus scan temporaries); power-of-two tiles only,
    # and single-env tiles for narrow grids (Mosaic miscompiles batched
    # blocks at small W — "Check failed: d >> 32 == 0" in lower_to_llo)
    bt = 1
    if w > 256:
        while bt * 2 <= bsz and bt * 2 * block * w * 4 <= _TILE_BUDGET:
            bt *= 2
    pad_b = (-bsz) % bt
    if pad_b:
        d = jnp.pad(d, ((0, pad_b), (0, 0), (0, 0)), constant_values=BIG)
        wallf = jnp.pad(wallf, ((0, pad_b), (0, 0), (0, 0)),
                        constant_values=1.0)
    nbt = d.shape[0] // bt

    kernel = functools.partial(_sweep_kernel_batched, inner=inner, w=w,
                               nb=nb, scan_chunk=scan_chunk)
    out = pl.pallas_call(
        kernel,
        grid=(nbt, nb),
        in_specs=[
            pl.BlockSpec((bt, block, w), lambda t, k: (t, k, 0)),
            pl.BlockSpec((bt, block, w), lambda t, k: (t, k, 0)),
            pl.BlockSpec((bt, block, w),
                         lambda t, k: (t, jnp.minimum(k + 1, nb - 1), 0)),
        ],
        out_specs=pl.BlockSpec((bt, block, w), lambda t, k: (t, k, 0)),
        out_shape=jax.ShapeDtypeStruct(d.shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((bt, 1, w), jnp.float32)],
        interpret=interpret,
    )(d, wallf, d)
    return out[:bsz]


def _axis_ab(u1, u2):
    """Per-axis upwind coefficients (second-order switch; fmm.py::_axis_ab).

    Returns (alpha, beta, known, inv_alpha): alpha only ever takes the
    values {0, 1, 1.5}, so its reciprocal is a SELECT between constants —
    _godunov2 uses inv_alpha to avoid VPU divides (round-5: the order-2
    stencil is compute-bound; 3 divides + their max-guards were ~25%% of
    its cycles)."""
    known1 = u1 < 0.5 * BIG
    use2 = known1 & (u2 < 0.5 * BIG) & (u2 <= u1)
    alpha = jnp.where(known1, jnp.where(use2, 1.5, 1.0), 0.0)
    beta = jnp.where(known1,
                     jnp.where(use2, (4.0 * u1 - u2) * 0.5, u1), 0.0)
    inv_alpha = jnp.where(use2, jnp.float32(2.0 / 3.0), jnp.float32(1.0))
    return alpha, beta, known1, inv_alpha


def _godunov2(u1x, u2x, u1y, u2y):
    """Order-selecting Godunov update (fmm.py::_godunov2, divide-free).

    alpha in {1, 1.5} on known axes, so 1/alpha and 1/(ax^2+ay^2) are
    selects between the four possible constants instead of divides; the
    off-by-ulp difference vs the divide form is inside the oracle
    tolerances (tests/test_fmm_oracle.py) and the planner-decision
    equivalence gate (scripts/validate_fmm_fused.py)."""
    ax, bx, kx, iax = _axis_ab(u1x, u2x)
    ay, by, ky, iay = _axis_ab(u1y, u2y)
    c1x = jnp.where(kx, (1.0 + bx) * iax, BIG)
    c1y = jnp.where(ky, (1.0 + by) * iay, BIG)
    one_d = jnp.minimum(c1x, c1y)
    A = ax * ax + ay * ay
    B = ax * bx + ay * by
    C = bx * bx + by * by - 1.0
    disc = B * B - A * C
    # 1/A by cases: {1+1, 1+2.25, 2.25+2.25} (only consumed when kx & ky)
    both15 = (iax != 1.0) & (iay != 1.0)
    one15 = (iax != 1.0) ^ (iay != 1.0)
    invA = jnp.where(both15, jnp.float32(1.0 / 4.5),
                     jnp.where(one15, jnp.float32(1.0 / 3.25),
                               jnp.float32(0.5)))
    u2d = (B + jnp.sqrt(jnp.maximum(disc, 0.0))) * invA
    ok = (disc >= 0.0) & kx & ky & (ax * u2d >= bx) & (ay * u2d >= by)
    return jnp.minimum(jnp.where(ok, u2d, one_d), BIG)


def _pick_dir(n1, n2, p1, p2):
    """Mirror-invariant upwind direction choice (fmm.py::_pick_dir)."""
    eff_n = jnp.where(n2 <= n1, n2, -BIG)
    eff_p = jnp.where(p2 <= p1, p2, -BIG)
    use_n = (n1 < p1) | ((n1 == p1) & (eff_n >= eff_p))
    return jnp.where(use_n, n1, p1), jnp.where(use_n, n2, p2)


def _sweep2_kernel_batched(d_ref, wall_ref, src_ref, nxt_ref, out_ref,
                           carry_ref, *, inner: int, w: int, nb: int):
    """Second-order row-block relaxation (min-update, no seg scans —
    see fmm.py::_order2_block for why the stencil must only consume values
    produced by this same causal ordering).  carry scratch holds the last
    TWO rows of the previous block."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        carry_ref[...] = jnp.full_like(carry_ref, BIG)

    blk = d_ref[...]
    wall = wall_ref[...] > 0.5
    src = src_ref[...] > 0.5
    top2 = carry_ref[...]                                # (B, 2, W)
    is_last = k == nb - 1
    bottom2 = jnp.where(is_last, BIG, nxt_ref[:, 0:2, :])
    r = blk.shape[1]
    bigcol = jnp.full(blk.shape[:-1] + (1,), BIG, blk.dtype)
    bigcol2 = jnp.full(blk.shape[:-1] + (2,), BIG, blk.dtype)

    def body(_, blk):
        ctx = jnp.concatenate([top2, blk, bottom2], axis=1)  # (B, R+4, W)
        up1 = ctx[:, 1:r + 1, :]
        up2 = ctx[:, 0:r, :]
        dn1 = ctx[:, 3:r + 3, :]
        dn2 = ctx[:, 4:r + 4, :]
        lf1 = jnp.concatenate([bigcol, blk[..., :-1]], axis=-1)
        lf2 = jnp.concatenate([bigcol2, blk[..., :-2]], axis=-1)
        rt1 = jnp.concatenate([blk[..., 1:], bigcol], axis=-1)
        rt2 = jnp.concatenate([blk[..., 2:], bigcol2], axis=-1)
        u1y, u2y = _pick_dir(up1, up2, dn1, dn2)
        u1x, u2x = _pick_dir(lf1, lf2, rt1, rt2)
        cand = _godunov2(u1x, u2x, u1y, u2y)
        out = jnp.where(src, 0.0, jnp.minimum(blk, cand))
        return jnp.where(wall, BIG, out)

    blk = jax.lax.fori_loop(0, inner, body, blk)
    out_ref[...] = blk
    carry_ref[...] = blk[:, -2:, :]


@functools.partial(jax.jit,
                   static_argnames=("block", "inner", "interpret"))
def pallas_block_sweep2(d, wall, src, block: int = 16, inner: int = 40,
                        interpret: bool = False):
    """One downward directed second-order sweep over (B, H, W) grids.

    H must be padded to a multiple of ``block`` by the caller."""
    bsz, h, w = d.shape
    nb = h // block
    wallf = wall.astype(jnp.float32)
    srcf = src.astype(jnp.float32)

    bt = 1
    if w > 256:
        while bt * 2 <= bsz and bt * 2 * block * w * 4 <= _TILE_BUDGET:
            bt *= 2
    pad_b = (-bsz) % bt
    if pad_b:
        d = jnp.pad(d, ((0, pad_b), (0, 0), (0, 0)), constant_values=BIG)
        wallf = jnp.pad(wallf, ((0, pad_b), (0, 0), (0, 0)),
                        constant_values=1.0)
        srcf = jnp.pad(srcf, ((0, pad_b), (0, 0), (0, 0)))
    nbt = d.shape[0] // bt

    kernel = functools.partial(_sweep2_kernel_batched, inner=inner, w=w,
                               nb=nb)
    out = pl.pallas_call(
        kernel,
        grid=(nbt, nb),
        in_specs=[
            pl.BlockSpec((bt, block, w), lambda t, k: (t, k, 0)),
            pl.BlockSpec((bt, block, w), lambda t, k: (t, k, 0)),
            pl.BlockSpec((bt, block, w), lambda t, k: (t, k, 0)),
            pl.BlockSpec((bt, block, w),
                         lambda t, k: (t, jnp.minimum(k + 1, nb - 1), 0)),
        ],
        out_specs=pl.BlockSpec((bt, block, w), lambda t, k: (t, k, 0)),
        out_shape=jax.ShapeDtypeStruct(d.shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((bt, 2, w), jnp.float32)],
        interpret=interpret,
    )(d, wallf, srcf, d)
    return out[:bsz]


def v_sweep2_pallas(d, wall, src, reverse: bool, block: int = 16,
                    inner: int = 40, interpret: bool = False):
    """Directed second-order sweep with the same contract as
    fmm._v_sweep2 (pads H and W, flips rows for the reverse direction)."""
    h, w0 = d.shape[-2], d.shape[-1]
    pad_h = (-h) % block
    pad_w = (-w0) % 128
    if pad_h or pad_w:
        spec = [(0, 0)] * (d.ndim - 2) + [(0, pad_h), (0, pad_w)]
        d = jnp.pad(d, spec, constant_values=BIG)
        wall = jnp.pad(wall, spec, constant_values=True)
        src = jnp.pad(src, spec, constant_values=False)
    if reverse:
        d = jnp.flip(d, axis=-2)
        wall = jnp.flip(wall, axis=-2)
        src = jnp.flip(src, axis=-2)
    out = pallas_block_sweep2(d, wall, src, block=block, inner=inner,
                              interpret=interpret)
    if reverse:
        out = jnp.flip(out, axis=-2)
    return out[..., :h, :w0]


def v_sweep_pallas(d, wall, reverse: bool, block: int = 16, inner: int = 40,
                   scan_chunk: int = 1, interpret: bool = False):
    """Directed sweep with the same contract as fmm._v_sweep (pads H,
    handles the reverse direction by flipping rows)."""
    h, w0 = d.shape[-2], d.shape[-1]
    pad_h = (-h) % block
    # lane-align the row width: Mosaic aborts on batched blocks narrower
    # than one 128-lane tile; wall-padding is semantically inert
    pad_w = (-w0) % 128
    if pad_h or pad_w:
        spec = [(0, 0)] * (d.ndim - 2) + [(0, pad_h), (0, pad_w)]
        d = jnp.pad(d, spec, constant_values=BIG)
        wall = jnp.pad(wall, spec, constant_values=True)
    if reverse:
        d = jnp.flip(d, axis=-2)
        wall = jnp.flip(wall, axis=-2)
    out = pallas_block_sweep(d, wall, block=block, inner=inner,
                             scan_chunk=scan_chunk, interpret=interpret)
    if reverse:
        out = jnp.flip(out, axis=-2)
    return out[..., :h, :w0]
