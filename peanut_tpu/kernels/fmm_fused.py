"""Whole-solve fused eikonal kernel: every sweep of one solve in ONE
pallas_call, the working grid resident in VMEM.

Why: the composed solver (kernels/fmm.py::eikonal_distance) interleaves
Pallas block sweeps with XLA glue — pads, flips, transposes, associative
scans — and on the measured serving geometry (16 x 482^2) the glue plus
per-call boundaries cost ~3x the sweeps themselves (~70 ms vs ~25 ms of a
pure sweep chain; round-5 profiling).  Here the batch is tiled over a
parallel grid, each tile's distance field is DMA'd into VMEM once, all
directed sweeps for all iterations run in-place with no HBM round trips,
and the result is DMA'd out once.  The vertical orientation needs no
transposes: down/up sweeps propagate rows sequentially in both directions,
and each block relaxation runs the same segmented min-plus row scans as
the composed path (fmm_pallas.py::_sweep_kernel_batched), so horizontal
jumps stay log-depth.

Scheduling differences vs the composed path (kept semantically safe —
monotone min-updates toward the same Godunov fixed point; accuracy is
gated by the heap-marching oracle suite, tests/test_fmm_oracle.py):
  * no transposed-orientation sweeps: vertical coverage comes from the
    row-sequential down/up passes themselves; `rounds` compensates.
  * order-2 consumers (skfmm's default order at the reference call
    sites, nav/agent/agent_state.py:391) use this kernel only for the
    first-order blanket; the 4-orientation composed refinement follows in
    fmm.py::eikonal_distance (its stencil needs transposed sweeps).

Replaces skfmm.distance (sequential C heap) at
/root/reference/nav/agent/agent_state.py:391 and
/root/reference/nav/agent/utils/fmm_planner.py:64,72.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1.0e10


def _seg_scan_lr(d, wl, w: int, reverse: bool):
    """Hillis-Steele segmented min-plus scan along lanes (fmm_pallas.py).

    ``wl`` is the wall mask as f32 0/1 — arithmetic masking throughout:
    this Mosaic version miscompiles i1 relayouts of bf16-sourced compares
    at batch tiles > 1 ("Invalid relayout ... replicated in destination").
    """
    a = jnp.minimum(1.0 + wl * BIG, BIG)
    b = jnp.minimum(d + wl * BIG, BIG)
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


def _relax_block(blk, wl, top, bottom, w: int, inner: int,
                 scan_chunk: int):
    """First-order block relaxation: the composed kernel's body
    (fmm_pallas.py::_sweep_kernel_batched) as a pure function.  ``wl`` is
    the f32 0/1 wall mask (see _seg_scan_lr on why not bool)."""

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
        return jnp.minimum(jnp.minimum(blk, cand) + wl * BIG, BIG)

    def body(_, blk):
        blk = _seg_scan_lr(blk, wl, w, reverse=False)
        blk = _seg_scan_lr(blk, wl, w, reverse=True)
        return jax.lax.fori_loop(0, scan_chunk, stencil, blk)

    return jax.lax.fori_loop(0, inner // scan_chunk, body, blk)


# ------------------------------------------------------------------------

def _fused_kernel(d_hbm, wall_hbm, out_hbm, D, WL, sems,
                  *, bt: int, hp: int, wp: int, block: int, rounds: int,
                  inner: int, scan_chunk: int, vscan: bool):
    t = pl.program_id(0)
    nb = hp // block

    cp_d = pltpu.make_async_copy(d_hbm.at[pl.ds(t * bt, bt)], D,
                                 sems.at[0])
    cp_w = pltpu.make_async_copy(wall_hbm.at[pl.ds(t * bt, bt)], WL,
                                 sems.at[1])
    cp_d.start()
    cp_w.start()
    cp_d.wait()
    cp_w.wait()

    big_row = jnp.full((bt, 1, wp), BIG, jnp.float32)

    def down_body(k, carry):
        r0 = pl.multiple_of(k * block, block)
        blk = D[:, pl.ds(r0, block), :]
        wl = WL[:, pl.ds(r0, block), :].astype(jnp.float32)
        nxt0 = pl.multiple_of(jnp.minimum(k + 1, nb - 1) * block, block)
        bottom = jnp.where(k == nb - 1, BIG, D[:, pl.ds(nxt0, 1), :])
        blk = _relax_block(blk, wl, carry, bottom, wp, inner, scan_chunk)
        D[:, pl.ds(r0, block), :] = blk
        return blk[:, block - 1:block, :]

    def up_body(j, carry):
        k = nb - 1 - j
        r0 = pl.multiple_of(k * block, block)
        blk = D[:, pl.ds(r0, block), :]
        wl = WL[:, pl.ds(r0, block), :].astype(jnp.float32)
        prv0 = pl.multiple_of(jnp.maximum(k - 1, 0) * block, block)
        # aligned block load, static tail slice (Mosaic rejects dynamic
        # sublane starts that aren't provably 8-aligned)
        top = jnp.where(k == 0, BIG,
                        D[:, pl.ds(prv0, block), :][:, block - 1:block, :])
        blk = _relax_block(blk, wl, top, carry, wp, inner, scan_chunk)
        D[:, pl.ds(r0, block), :] = blk
        return blk[:, 0:1, :]

    def vscan_chunks():
        """Segmented min-plus scans along rows (axis -2), both directions,
        chunked over 128-lane column groups so temporaries stay ~1 MB.
        Jumps distance down long vertical shafts in log depth — the fused
        substitute for the composed path's transposed orientation."""
        nl = wp // 128

        def chunk_body(c, _):
            c0 = pl.multiple_of(c * 128, 128)
            d = D[:, :, pl.ds(c0, 128)]
            # arithmetic masking (wl is exactly 0/1): Mosaic miscompiles
            # the i1 relayout of `WL_slice > 0.5` at batch tiles > 1
            # ("Invalid relayout ... replicated in destination")
            wl = WL[:, :, pl.ds(c0, 128)].astype(jnp.float32)
            for rev in (False, True):
                a = jnp.minimum(1.0 + wl * BIG, BIG)
                b = jnp.minimum(d + wl * BIG, BIG)
                s = 1
                while s < hp:
                    pad_a = jnp.full((bt, s, 128), 0.0, a.dtype)
                    pad_b = jnp.full((bt, s, 128), BIG, b.dtype)
                    if not rev:
                        a_n = jnp.concatenate([pad_a, a[:, :-s, :]], axis=1)
                        b_n = jnp.concatenate([pad_b, b[:, :-s, :]], axis=1)
                    else:
                        a_n = jnp.concatenate([a[:, s:, :], pad_a], axis=1)
                        b_n = jnp.concatenate([b[:, s:, :], pad_b], axis=1)
                    b = jnp.minimum(b, b_n + a)
                    a = jnp.minimum(a_n + a, BIG)
                    s *= 2
                d = jnp.minimum(d, b)
            D[:, :, pl.ds(c0, 128)] = d
            return 0

        jax.lax.fori_loop(0, nl, chunk_body, 0)

    for _ in range(rounds):
        if vscan:
            vscan_chunks()
        jax.lax.fori_loop(0, nb, down_body, big_row)
        jax.lax.fori_loop(0, nb, up_body, big_row)

    cp_o = pltpu.make_async_copy(D, out_hbm.at[pl.ds(t * bt, bt)],
                                 sems.at[2])
    cp_o.start()
    cp_o.wait()


@functools.partial(jax.jit, static_argnames=(
    "rounds", "block", "inner", "scan_chunk", "bt", "vscan", "interpret"))
def fused_eikonal(traversible, sources, rounds: int = 3, block: int = 8,
                  inner: int = 24, scan_chunk: int = 4, bt: int = 0,
                  vscan: bool = True, interpret: bool = False):
    """Whole FIRST-ORDER eikonal solve in one pallas_call per batch tile.

    Same contract as fmm.py::eikonal_distance at order=1: (B, H, W)
    traversible/sources -> float32 distances, +inf at walls/unreachable.
    A source on a non-traversible cell is still a source (skfmm
    masked-array semantics, fmm_planner.py:70-71).  Order-2 consumers go
    through fmm.py::eikonal_distance, which uses this kernel as the
    first-order blanket and keeps the composed 4-orientation refinement
    (the refinement needs transposed sweeps; measured round 5).
    """
    trav = jnp.asarray(traversible) > 0
    src = jnp.asarray(sources) > 0
    wall = jnp.logical_not(trav) & jnp.logical_not(src)
    d0 = jnp.where(src, 0.0, BIG).astype(jnp.float32)

    bsz, h, w0 = d0.shape
    pad_h = (-h) % max(block, 8)
    pad_w = (-w0) % 128
    spec = ((0, 0), (0, pad_h), (0, pad_w))
    d0 = jnp.pad(d0, spec, constant_values=BIG)
    # bf16 wall/src uploads: 0/1 are exact in bf16 and halve the VMEM
    # residency, which doubles the batch tile (DMA cannot convert dtypes,
    # so the cast happens here)
    wallf = jnp.pad(wall, spec, constant_values=True).astype(jnp.bfloat16)
    hp, wp = d0.shape[-2], d0.shape[-1]

    if bt <= 0:
        # VMEM budget: D f32 + WL bf16 (+ SR bf16 + D2 f32 for order 2)
        # tiles, plus block-op temporaries (vscan's lane-chunked scans add
        # ~4 live (bt, hp, 128) f32 temporaries); stay under the ~16 MB
        # core VMEM.  Larger bt directly divides the latency-bound op
        # count, so push it as high as the budget allows.
        per = hp * wp * (4 + 2)
        if vscan:
            per += 4 * hp * 128 * 4
        budget = int(12.5 * 2 ** 20)
        bt = max(1, int(budget // per))
        bt = 1 << (bt.bit_length() - 1)          # power of two
        bt = min(bt, 8)
    pad_b = (-bsz) % bt
    if pad_b:
        bspec = ((0, pad_b), (0, 0), (0, 0))
        d0 = jnp.pad(d0, bspec, constant_values=BIG)
        wallf = jnp.pad(wallf, bspec, constant_values=1.0)
    nbt = d0.shape[0] // bt

    kernel = functools.partial(
        _fused_kernel, bt=bt, hp=hp, wp=wp, block=block, rounds=rounds,
        inner=inner, scan_chunk=scan_chunk, vscan=vscan)
    scratch = [
        pltpu.VMEM((bt, hp, wp), jnp.float32),           # D
        pltpu.VMEM((bt, hp, wp), jnp.bfloat16),          # WL (0/1: exact)
        pltpu.SemaphoreType.DMA((3,)),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(nbt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(d0.shape, jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(d0, wallf)
    out = out[:bsz, :h, :w0]
    return jnp.where(out >= 0.5 * BIG, jnp.inf, out)
