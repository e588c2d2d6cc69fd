"""Pallas TPU kernel: per-ROI window gather + separable pooling.

The XLA formulation of ROIAlign's square pass (roi_align.py::pool_fast)
element-gathers an aligned ``win x win`` feature window per ROI — at the
serving geometry that is ~13M gather rows per detect and dominates the box
stage (~260 ms of a ~340 ms detect).  The same windows are *rectangular
slices* of the stacked pyramid buffer, so this kernel replaces the gather
with per-ROI async DMA: a sequential grid over ROIs, each step double-
buffering the next ROI's HBM->VMEM window copy behind the current ROI's two
hat-matrix contractions (pooled = A_y @ W @ A_x^T, exactly roi_align.py::
contract without the final /cnt, which the caller applies).

A grid step processes ``lanes`` ROIs (auto-sized to the VMEM budget),
amortizing the per-step fixed cost (index prefetch, branch setup, DMA
issue latency) over the lane count — measured 1.08x over single-ROI
steps at the serving geometry on v5e (scripts/validate_roi_lanes.py;
the DMA stream, not the step overhead, is the bound there, so the gain
is modest but free).  All ``lanes`` window copies of a step are
in flight concurrently, and the NEXT step's copies are still prefetched
behind the current step's compute (double buffering, 2x``lanes`` buffers).

Replaces the hot path of detectron2's CUDA ROIAlignV2 (reference:
detectron2 ROIAlign, used at nav/agent/utils/segmentation.py:38 via
DefaultPredictor).  Numerics match the gather formulation up to float
summation order (same bf16 operands, f32 accumulation).

Hardware constraints honored here: the HBM buffer's W axis is sublane-
tiled (8), so ``col0`` must be 8-aligned — callers align the origin down
and widen ``win_x`` by 8 (the extra columns carry zero hat weight).  The
stacked buffer must be padded by >= win_y rows / win_x cols so slices
never run off the end (padding reads are likewise inert).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM spent on window double-buffers; v5e has 16 MiB less program scratch
_WBUF_BUDGET = 8 * 1024 * 1024
# lane default: "auto" = multi-lane (k ROIs per grid step).  Hardware-
# validated round 3 (scripts/validate_roi_lanes.py on v5e: bit-equal to
# the single-ROI program at the serving geometry, 1.08x); "1" forces the
# round-2 single-ROI program.
_DEFAULT_LANES = "auto"


def _contract(ay, ax, w, win_y, win_x, p, c):
    w = w.reshape(win_y, win_x * c)
    t = jnp.dot(ay.astype(w.dtype), w, preferred_element_type=jnp.float32)
    t = t.reshape(p, win_x, c).transpose(1, 0, 2).reshape(win_x, p * c)
    o = jnp.dot(ax, t, preferred_element_type=jnp.float32)
    return o.reshape(p, p, c).transpose(1, 0, 2)         # (p_y, p_x, c)


def _kernel1(row0_ref, col8_ref, flat_ref, ay_ref, ax_ref, out_ref,
             wbuf, sems, *, win_y: int, win_x: int, p: int, c: int):
    """Single-ROI grid step (the round-2 hardware-validated program)."""
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def copy(j, slot):
        # col8 holds the origin / 8; multiplying here lets Mosaic PROVE
        # the sublane-tiled W origin is 8-aligned (a raw runtime scalar
        # fails its divisibility check)
        return pltpu.make_async_copy(
            flat_ref.at[pl.ds(row0_ref[j], win_y),
                        pl.ds(col8_ref[j] * 8, win_x), :],
            wbuf.at[slot], sems.at[slot])

    @pl.when(i == 0)
    def _():
        copy(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        copy(i + 1, (i + 1) % 2).start()

    slot = i % 2
    copy(i, slot).wait()
    out_ref[0] = _contract(ay_ref[0], ax_ref[0], wbuf[slot],
                           win_y, win_x, p, c)


def _kernel(row0_ref, col8_ref, flat_ref, ay_ref, ax_ref, out_ref,
            wbuf, sems, *, win_y: int, win_x: int, p: int, c: int, k: int):
    """k-ROIs-per-step variant: all k window copies of a step are in
    flight concurrently and the NEXT step's copies prefetch behind this
    step's contractions (2 x k double buffering)."""
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def copy(j, slot, kk):
        return pltpu.make_async_copy(
            flat_ref.at[pl.ds(row0_ref[j * k + kk], win_y),
                        pl.ds(col8_ref[j * k + kk] * 8, win_x), :],
            wbuf.at[slot, kk], sems.at[slot, kk])

    @pl.when(i == 0)
    def _():
        for kk in range(k):
            copy(0, 0, kk).start()

    @pl.when(i + 1 < n)
    def _():
        for kk in range(k):
            copy(i + 1, (i + 1) % 2, kk).start()

    slot = i % 2
    for kk in range(k):
        copy(i, slot, kk).wait()
        out_ref[kk] = _contract(ay_ref[kk], ax_ref[kk], wbuf[slot, kk],
                                win_y, win_x, p, c)


def _pick_lanes(n: int, win_y: int, win_x: int, c: int,
                itemsize: int) -> int:
    """Largest lane count (1/2/4/8) dividing n whose 2x double-buffered
    windows fit the VMEM budget.

    PEANUT_ROI_LANES overrides: an integer forces that lane count (1
    disables multi-lane), "auto" picks the largest fitting the budget.
    Default is auto once validated on hardware; see _DEFAULT_LANES."""
    env = os.environ.get("PEANUT_ROI_LANES", _DEFAULT_LANES)
    if env != "auto":
        forced = int(env)
        return forced if n % forced == 0 else 1
    k = 1
    for cand in (2, 4, 8):
        if n % cand == 0 and \
                2 * cand * win_y * win_x * c * itemsize <= _WBUF_BUDGET:
            k = cand
    return k


@functools.partial(jax.jit,
                   static_argnames=("win_y", "win_x", "interpret"))
def roi_window_pool(flat_padded, ay, ax, row0, col0, *, win_y: int,
                    win_x: int, interpret: bool = False):
    """Pooled (undivided) features for n ROIs.

    Args:
      flat_padded: (Hp, Wp, C) stacked pyramid, padded so every
        ``[row0:row0+win_y, col0:col0+win_x]`` slice is in bounds.
      ay: (n, p, win_y), ax: (n, p, win_x) f32 bilinear hat matrices
        (roi_align.py::hat_matrix) — slot-masked; NOT divided by cnt.
      row0, col0: (n,) int32 window origins (row0 includes the per-
        (image, level) row offset; col0 must be 8-aligned — it is passed
        to the kernel as col0/8 so Mosaic can prove the alignment).

    Returns:
      (n, p, p, C) f32 ``A_y @ W @ A_x^T`` per ROI; caller divides by cnt.
    """
    n, p, _ = ay.shape
    c = flat_padded.shape[-1]
    k = _pick_lanes(n, win_y, win_x, c, flat_padded.dtype.itemsize)
    if k == 1:
        body = functools.partial(_kernel1, win_y=win_y, win_x=win_x,
                                 p=p, c=c)
        scratch = [pltpu.VMEM((2, win_y, win_x, c), flat_padded.dtype),
                   pltpu.SemaphoreType.DMA((2,))]
    else:
        body = functools.partial(_kernel, win_y=win_y, win_x=win_x,
                                 p=p, c=c, k=k)
        scratch = [pltpu.VMEM((2, k, win_y, win_x, c), flat_padded.dtype),
                   pltpu.SemaphoreType.DMA((2, k))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n // k,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k, p, win_y), lambda i, r0, c0: (i, 0, 0)),
            pl.BlockSpec((k, p, win_x), lambda i, r0, c0: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((k, p, p, c), lambda i, r0, c0: (i, 0, 0, 0)),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, p, p, c), jnp.float32),
        interpret=interpret,
    )(row0, col0 // 8, flat_padded, ay, ax)
