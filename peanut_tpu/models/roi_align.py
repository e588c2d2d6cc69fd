"""Multi-level ROIAlign on TPU.

Replaces detectron2's CUDA ROIAlignV2 (aligned=True).  TPU-first design: the
FPN levels — and, in the batched form, the whole image batch — are padded to
a common width and concatenated along H into ONE buffer, each ROI's sample
coordinates get a per-(image, level) row offset, and the whole pooling
becomes batched separable matrix contractions on the MXU — no per-level
dynamic partitioning, fully static shapes.  Serving calls the batched form
directly (NOT through ``vmap``): control flow below stays real branching,
which ``vmap`` would flatten into always-execute ``select``s.

Sampling implements detectron2's adaptive ratio-0 grid (the default at the
reference's serving path, nav/agent/utils/segmentation.py:38 via
DefaultPredictor): per ROI, ``g = ceil(roi_size_px / pooled_size)`` samples
per bin per axis.  Static shapes are preserved by always generating ``gmax``
sample slots per bin — ``gmax`` is a *compile-time* bound derived from the
finest level's extent (the largest per-axis span any assigned ROI can have)
— and masking slots ``j >= g`` out of the average.  Positions of the live
slots are the exact d2 ones, ``(j + 0.5) / g`` bin fractions with per-ROI
``g``, so results match the CUDA kernel up to float summation order.  A
fixed grid (``sampling_ratio > 0``) is kept as an option.

Window exactness: pooling contracts a per-ROI feature *window* with
separable bilinear hat matrices.  A square window sized to the coarsest
level cannot cover elongated ROIs on fine levels (d2 assigns by
sqrt(area), so a 200x60 px box lands on level 0 and spans 50 cells there).
The fix exploits the assignment rule itself: a box on non-coarsest level
``l`` has sqrt(area_px) < canonical * 2^(l - canonical_level + 1), hence its
*cell* area is bounded by AREA_BOUND = (canonical / 2^(canonical_level-1))^2
= 784 cells for the standard (224, 4) parameters.  Therefore a ROI can
overflow the square window on at most ONE axis, and on that ROI the other
axis is provably thin (< AREA_BOUND / (win-3) cells).  Three static window
shapes cover every ROI exactly: square (common case), thin-rows x
full-width (x-elongated), and full-height x thin-cols (y-elongated).  The
ROIs are globally sorted so overflowing ones cluster in the tail chunks and
the two rectangular passes run on a STATIC tail fraction of chunks (a
per-chunk ``lax.cond`` would execute both branches on TPU — measured);
chunks of ordinary ROIs pay only the square pass (``n_tail`` below).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _use_pallas() -> bool:
    """Square-pass windows via per-ROI DMA (kernels/roi_window.py) instead
    of the XLA element gather.  Default on real TPU; PEANUT_ROI_PALLAS=0/1
    overrides (numerics differ from the gather path only in summation
    order)."""
    flag = os.environ.get("PEANUT_ROI_PALLAS")
    if flag is not None:
        return flag == "1"
    return jax.default_backend() == "tpu"


def assign_fpn_levels(boxes, k_min: int = 2, k_max: int = 5,
                      canonical_size: float = 224.0, canonical_level: int = 4):
    """d2 assign_boxes_to_levels: level = floor(k0 + log2(sqrt(area)/224))."""
    area = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * \
        jnp.maximum(boxes[..., 3] - boxes[..., 1], 0)
    s = jnp.sqrt(area)
    lvl = jnp.floor(canonical_level + jnp.log2(s / canonical_size + 1e-8))
    return jnp.clip(lvl, k_min, k_max).astype(jnp.int32) - k_min


def stack_pyramid(feats: Sequence[jnp.ndarray]
                  ) -> Tuple[jnp.ndarray, np.ndarray, np.ndarray]:
    """Concatenate levels along H with right zero padding to a common W.

    Accepts (H_l, W_l, C) or batched (B, H_l, W_l, C) levels.  Returns
    (stacked (..., sumH, maxW, C), row_offsets (L,), heights (L,))."""
    ax_h = feats[0].ndim - 3
    max_w = max(f.shape[ax_h + 1] for f in feats)
    pad = [(0, 0)] * feats[0].ndim
    padded = []
    for f in feats:
        pw = list(pad)
        pw[ax_h + 1] = (0, max_w - f.shape[ax_h + 1])
        padded.append(jnp.pad(f, pw))
    offsets = np.cumsum([0] + [f.shape[ax_h] for f in feats[:-1]])
    heights = np.array([f.shape[ax_h] for f in feats])
    stacked = jnp.concatenate(padded, axis=ax_h)
    return stacked, offsets, heights


def _ceil8(v: float) -> int:
    return int(-(-int(np.ceil(v)) // 8) * 8)


def _cell_area_bound(strides: Sequence[int], k_min: int = 2,
                     canonical_size: float = 224.0,
                     canonical_level: int = 4) -> float:
    """Max cell area of a ROI assigned to any NON-coarsest level.

    A box at level l < k_max satisfies sqrt(area_px) < canonical *
    2^(l - canonical_level + 1); dividing by stride_l^2 gives the per-level
    cell-area bound; take the max over non-coarsest levels."""
    bound = 0.0
    for i, st in enumerate(list(strides)[:-1]):
        l = k_min + i
        smax = canonical_size * (2.0 ** (l - canonical_level + 1))
        bound = max(bound, (smax / st) ** 2)
    return bound


def build_roi_stack(feats: Sequence[jnp.ndarray],
                    strides: Sequence[int]) -> dict:
    """Precompute the stacked pyramid buffers + static window geometry.

    Everything here depends only on the feature pyramid (not on the boxes
    or the pooled size), so one context serves BOTH ROI stages of a
    detect — the box head's 7x7 pooling over 1000 proposals/img and the
    mask head's 14x14 over 100 detections (round-5: rebuilding the
    ~0.5 GB stacked/column-major/padded buffers per stage was a
    measurable slice of the detect program)."""
    bsz = feats[0].shape[0]
    c = feats[0].shape[-1]
    stacked, row_off, heights = stack_pyramid(feats)   # (B, sumH, maxW, C)
    sum_h = int(heights.sum())
    _, _, max_w, _ = stacked.shape
    total_h = bsz * sum_h
    stacked = stacked.reshape(total_h, max_w, c)

    fin_h, fin_w = feats[0].shape[-3], feats[0].shape[-2]
    max_coarse = max(feats[-1].shape[-3], feats[-1].shape[-2])
    area_bound = _cell_area_bound(strides)
    win = _ceil8(max(max_coarse + 4, np.sqrt(area_bound) + 4))
    win = int(min(win, _ceil8(max(sum_h, max_w))))
    thin = int(np.ceil(area_bound / max(win - 3, 1) + 3)) + 1
    long_y = _ceil8(fin_h + 2)
    square_covers_all = win >= max(_ceil8(fin_w + 2), long_y)
    if os.environ.get("PEANUT_ROI_DEBUG") == "square":
        square_covers_all = True   # diagnostic only: skip overflow passes

    t2 = col_cum = None
    sum_w = 0
    if not square_covers_all:
        widths = [f.shape[-2] for f in feats]
        col_cum = np.cumsum([0] + widths[:-1])
        sum_w = int(sum(widths))
        blocks = []
        for f in feats:
            ft = jnp.swapaxes(f, 1, 2)          # (B, W_l, H_l, C)
            ft = jnp.pad(ft, ((0, 0), (0, 0),
                              (0, long_y - f.shape[-3]), (0, 0)))
            blocks.append(ft)
        t2 = jnp.concatenate(blocks, axis=1)    # (B, sumW, long_y, C)
        t2 = t2.reshape(bsz * sum_w, long_y, c)

    use_pallas = _use_pallas() and c % 128 == 0
    padded3 = t2pad = None
    thin8 = _ceil8(thin)
    winx_long = _ceil8(fin_w + 2) + 8
    if use_pallas:
        pad_r = max(win, thin8)
        pad_c = max(win + 8, winx_long)
        padded3 = jnp.pad(stacked, ((0, pad_r), (0, pad_c), (0, 0)))
        if t2 is not None:
            t2pad = jnp.pad(t2, ((0, thin8), (0, 0), (0, 0)))

    return dict(stacked=stacked, row_off=row_off, heights=heights,
                sum_h=sum_h, max_w=max_w, total_h=total_h, t2=t2,
                col_cum=col_cum, sum_w=sum_w, padded3=padded3, t2pad=t2pad,
                win=win, thin=thin, thin8=thin8, long_y=long_y,
                winx_long=winx_long, square_covers_all=square_covers_all,
                use_pallas=use_pallas, fin_h=fin_h, fin_w=fin_w, c=c,
                bsz=bsz)


def multilevel_roi_align(feats: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                         strides: Sequence[int], output_size: int,
                         sampling_ratio: int = 0,
                         ctx: Optional[dict] = None) -> jnp.ndarray:
    """ROIAlign over an FPN pyramid (d2 ROIAlignV2 semantics).

    Args:
      feats: per-level (H_l, W_l, C) maps — or (B, H_l, W_l, C) for the
        batched form — levels ordered fine->coarse.
      boxes: (N, 4) XYXY in input-image coordinates, or (B, N, 4) matching
        batched ``feats`` (box i of batch b pools from image b's pyramid).
      strides: per-level feature strides (e.g. 4, 8, 16, 32).
      output_size: pooled resolution P (P x P bins).
      sampling_ratio: 0 = d2 adaptive grid (ceil(bin px), the reference
        default); > 0 = fixed grid of that many samples per bin per axis.

    Returns:
      (N, P, P, C) pooled features ((B, N, P, P, C) for the batched form).
    """
    single = boxes.ndim == 2
    if single:
        boxes = boxes[None]
        feats = [f[None] for f in feats]
    if ctx is None:
        ctx = build_roi_stack(feats, strides)
    bsz, nroi = boxes.shape[0], boxes.shape[1]
    c = ctx["c"]
    p = output_size
    stacked = ctx["stacked"]
    row_off, heights = ctx["row_off"], ctx["heights"]
    sum_h, max_w, total_h = ctx["sum_h"], ctx["max_w"], ctx["total_h"]

    n = bsz * nroi
    boxes = boxes.reshape(n, 4)
    levels = assign_fpn_levels(boxes)                      # (n,)
    stride = jnp.asarray(strides, jnp.float32)[levels]     # (n,)
    batch_off = jnp.repeat(jnp.arange(bsz, dtype=jnp.float32) * sum_h, nroi)
    lvl_off = jnp.asarray(row_off, jnp.float32)[levels] + batch_off
    lvl_h = jnp.asarray(heights, jnp.float32)[levels]
    lvl_w_arr = np.array([f.shape[-2] for f in feats], np.float32)
    lvl_w = jnp.asarray(lvl_w_arr)[levels]

    # ROI in level-feature coordinates, aligned=True (-0.5 pixel shift)
    x1 = boxes[:, 0] / stride - 0.5
    y1 = boxes[:, 1] / stride - 0.5
    x2 = boxes[:, 2] / stride - 0.5
    y2 = boxes[:, 3] / stride - 0.5
    roi_w = x2 - x1
    roi_h = y2 - y1
    bin_w = roi_w / p
    bin_h = roi_h / p

    fin_h, fin_w = ctx["fin_h"], ctx["fin_w"]
    if sampling_ratio > 0:
        s = sampling_ratio
        gx = jnp.full((n,), float(s))
        gy = jnp.full((n,), float(s))
    else:
        # adaptive slot bound: a ROI's per-axis span at its assigned level
        # is bounded by that level's extent, and the finest level has the
        # largest extent — so gmax = ceil(finest_extent / p) covers every
        # in-image ROI's exact d2 sample count (boxes beyond the image edge
        # get their g clipped; their samples clamp to the edge either way)
        s = max(1, int(-(-max(fin_h, fin_w) // p)))
        gx = jnp.clip(jnp.ceil(roi_w / p), 1.0, s)
        gy = jnp.clip(jnp.ceil(roi_h / p), 1.0, s)

    # sample lattice: bin b, slot j at fraction (j + 0.5) / g of the bin;
    # slots j >= g are masked out of the average
    slots = jnp.arange(s, dtype=jnp.float32)               # (s,)
    frac_x = (slots[None, :] + 0.5) / gx[:, None]          # (n, s)
    frac_y = (slots[None, :] + 0.5) / gy[:, None]
    mask_x = (slots[None, :] < gx[:, None]).astype(jnp.float32)
    mask_y = (slots[None, :] < gy[:, None]).astype(jnp.float32)
    bins = jnp.arange(p, dtype=jnp.float32)                # (p,)
    # (n, p, s) sample coordinates, clamped into the level's valid extent
    # (d2 clamps sampling coords)
    sample_x = jnp.clip(x1[:, None, None]
                        + (bins[None, :, None] + frac_x[:, None, :])
                        * bin_w[:, None, None], 0.0,
                        lvl_w[:, None, None] - 1.0)
    sample_y = jnp.clip(y1[:, None, None]
                        + (bins[None, :, None] + frac_y[:, None, :])
                        * bin_h[:, None, None], 0.0,
                        lvl_h[:, None, None] - 1.0)

    flat = stacked.reshape(total_h * max_w, c)

    # --- MXU formulation -------------------------------------------------
    # Instead of gathering the full (P*s)^2 bilinear lattice (4 corner
    # gathers — memory- and gather-bound), extract ONE aligned window per
    # ROI and fold sampling + bilinear interpolation + slot averaging into
    # per-ROI separable matrices:  pooled = A_y @ window @ A_x^T, batched
    # over ROIs/channels on the MXU.  A_y[i, r] = sum_j mask_j *
    # hat(sy[i,j] - r) is the exact bilinear hat-function weight, so the
    # result is identical to the gather formulation up to summation order.
    # Window rows that alias other pyramid levels (or other images) get
    # zero hat weight, so the aliasing is inert.  Window geometry and
    # overflow-pass derivations: build_roi_stack above.
    win = ctx["win"]
    thin = ctx["thin"]
    long_y = ctx["long_y"]
    square_covers_all = ctx["square_covers_all"]

    # live-sample extremes, analytically: first live slot sits at bin 0
    # fraction 0.5/g, last at bin p-1 fraction (g-0.5)/g.  (Taking min/max
    # over the sample tensors would include MASKED slots, whose positions
    # run past the ROI and clamp to the level edge — that misclassified
    # nearly every ROI as overflowing.)
    min_sx = jnp.clip(x1 + (0.5 / gx) * bin_w, 0.0, lvl_w - 1.0)
    max_sx = jnp.clip(x1 + ((p - 1) + (gx - 0.5) / gx) * bin_w, 0.0,
                      lvl_w - 1.0)
    min_sy = jnp.clip(y1 + (0.5 / gy) * bin_h, 0.0, lvl_h - 1.0)
    max_sy = jnp.clip(y1 + ((p - 1) + (gy - 0.5) / gy) * bin_h, 0.0,
                      lvl_h - 1.0)
    oy = jnp.clip(jnp.floor(min_sy), 0.0, None)
    ox = jnp.clip(jnp.floor(min_sx), 0.0, None)
    fit_x = (max_sx - ox) <= win - 2
    fit_y = (max_sy - oy) <= win - 2
    cnt = jnp.maximum(gx * gy, 1.0)

    # column-major twin (built once in build_roi_stack); per-call offsets
    t2 = ctx["t2"]
    t2_col_off = None
    if not square_covers_all:
        batch_col = jnp.repeat(
            jnp.arange(bsz, dtype=jnp.float32) * ctx["sum_w"], nroi)
        t2_col_off = jnp.asarray(ctx["col_cum"], jnp.float32)[levels] \
            + batch_col

    def hat_matrix(sam, msk, origin, length):
        """(m, p, s) sample coords + slot mask -> (m, p, length) weights."""
        r_idx = jnp.arange(length, dtype=jnp.float32)
        local = sam - origin[:, None, None]                # window-local
        hat = jnp.clip(1.0 - jnp.abs(local[..., None]
                                     - r_idx[None, None, None, :]), 0.0, 1.0)
        return (hat * msk[:, None, :, None]).sum(axis=2)   # (m, p, length)

    def gather_window(oy_, ox_, off_, wy, wx):
        """Element-level 2-D window gather (the square pass)."""
        m = oy_.shape[0]
        ry = jnp.arange(wy, dtype=jnp.float32)
        rx = jnp.arange(wx, dtype=jnp.float32)
        rows = (oy_[:, None] + off_[:, None] + ry[None, :]).astype(jnp.int32)
        cols = (ox_[:, None] + rx[None, :]).astype(jnp.int32)
        rows = jnp.clip(rows, 0, total_h - 1)
        cols = jnp.clip(cols, 0, max_w - 1)
        lin = rows[:, :, None] * max_w + cols[:, None, :]
        return flat[lin.reshape(-1)].reshape(m, wy, wx, c)

    def contract(ay_, ax_, window, cnt_):
        # big contraction runs in the feature dtype (bf16 serving) on the
        # MXU with f32 accumulation; the small second contraction in f32
        t = jnp.einsum("npr,nrwc->npwc", ay_.astype(window.dtype), window,
                       preferred_element_type=jnp.float32)
        t = jnp.einsum("nqw,npwc->npqc", ax_, t)
        return t / cnt_[:, None, None, None]

    # padded kernel buffers (built once in build_roi_stack); the kernel
    # reshapes (win, win_x, C) -> (win, win_x*C), which Mosaic only lays
    # out when C fills whole 128-lane registers (serving C=256)
    use_pallas = ctx["use_pallas"]
    padded3 = ctx["padded3"]
    t2pad = ctx["t2pad"]
    thin8 = ctx["thin8"]
    winx_long = ctx["winx_long"]

    def pool_fast(args):
        sy, sx, my, mx, oy_, ox_, off_, _, cnt_, *_rest = args
        if use_pallas:
            from ..kernels.roi_window import roi_window_pool
            ox_al = jnp.floor(ox_ / 8.0) * 8.0
            ay = hat_matrix(sy, my, oy_, win)
            ax = hat_matrix(sx, mx, ox_al, win + 8)
            row0 = (oy_ + off_).astype(jnp.int32)
            col0 = ox_al.astype(jnp.int32)
            pooled = roi_window_pool(padded3, ay, ax, row0, col0,
                                     win_y=win, win_x=win + 8)
            return pooled / cnt_[:, None, None, None]
        ay = hat_matrix(sy, my, oy_, win)
        ax = hat_matrix(sx, mx, ox_, win)
        return contract(ay, ax, gather_window(oy_, ox_, off_, win, win),
                        cnt_)

    sub_chunk = 64

    def pool_slow(args):
        """Square pass + both elongated-overflow passes + per-ROI select.
        The overflow windows are ROW gathers (contiguous feature rows of
        the stacked / column-major buffers), which stream at near-HBM
        bandwidth instead of element-gathering."""
        def one(sargs):
            sy_, sx_, my_, mx_, oyy, oxx, off_, t2o, c_, fxx, fyy = sargs
            pooled = pool_fast(sargs)
            if use_pallas:
                from ..kernels.roi_window import roi_window_pool
                # x-elongated: (thin8, winx_long) rectangular DMA window —
                # the x-support of ANY ROI is <= fin_w + 2 cells, so the
                # window starts at the ROI's own x-origin instead of
                # contracting against the full stacked width
                ox_al = jnp.floor(oxx / 8.0) * 8.0
                ay_b = hat_matrix(sy_, my_, oyy, thin8)
                ax_b = hat_matrix(sx_, mx_, ox_al, winx_long)
                pb = roi_window_pool(
                    padded3, ay_b, ax_b, (oyy + off_).astype(jnp.int32),
                    ox_al.astype(jnp.int32), win_y=thin8, win_x=winx_long
                ) / c_[:, None, None, None]
                # y-elongated on the column-major twin: rows are x cells
                # (origin t2o + ox), cols are the full level height long_y
                # (origin 0, 8-aligned by construction); the kernel output
                # is (n, p_x, p_y, c) -> transpose
                ay_c = hat_matrix(sx_, mx_, oxx, thin8)
                ax_c = hat_matrix(sy_, my_, jnp.zeros_like(oyy), long_y)
                pc = roi_window_pool(
                    t2pad, ay_c, ax_c, (t2o + oxx).astype(jnp.int32),
                    jnp.zeros_like(oyy, jnp.int32), win_y=thin8,
                    win_x=long_y).transpose(0, 2, 1, 3) \
                    / c_[:, None, None, None]
            else:
                # x-elongated: thin feature rows at oy, full stacked width
                rows = (off_[:, None] + oyy[:, None]
                        + jnp.arange(thin, dtype=jnp.float32)).astype(
                    jnp.int32)
                wb = stacked[jnp.clip(rows, 0, total_h - 1)]
                ay_b = hat_matrix(sy_, my_, oyy, thin)
                ax_b = hat_matrix(sx_, mx_, jnp.zeros_like(oyy), max_w)
                pb = contract(ay_b, ax_b, wb, c_)
                # y-elongated: thin column strips at ox = contiguous rows
                # of the column-major twin, full level height
                rows_t = (t2o[:, None] + oxx[:, None]
                          + jnp.arange(thin, dtype=jnp.float32)).astype(
                    jnp.int32)
                wc = t2[jnp.clip(rows_t, 0, t2.shape[0] - 1)]
                # wc: (m, thin, long_y, C); contract y (big) then x (thin)
                ay_c = hat_matrix(sy_, my_, jnp.zeros_like(oyy), long_y)
                ax_c = hat_matrix(sx_, mx_, oxx, thin)
                t = jnp.einsum("npy,ntyc->nptc", ay_c.astype(wc.dtype), wc,
                               preferred_element_type=jnp.float32)
                pc = jnp.einsum("nqt,nptc->npqc", ax_c, t) \
                    / c_[:, None, None, None]
            po = jnp.where(fxx[:, None, None, None], pc, pb)
            overflow = ~(fxx & fyy)
            return jnp.where(overflow[:, None, None, None], po, pooled)

        m = args[0].shape[0]
        if m > sub_chunk:
            ns = m // sub_chunk     # chunk sizes are multiples of 64
            sh = tuple(a.reshape((ns, sub_chunk) + a.shape[1:])
                       for a in args)
            return jax.lax.map(one, sh).reshape((m, p, p, c))
        return one(args)

    zeros_off = jnp.zeros_like(lvl_off)
    args = (sample_y, sample_x, mask_y, mask_x, oy, ox, lvl_off,
            t2_col_off if t2_col_off is not None else zeros_off, cnt,
            fit_x, fit_y)
    # chunk ROIs so the window transient stays bounded; sort so overflow
    # ROIs cluster in the tail chunks.  Dynamic branching is NOT an
    # option: lax.cond inside lax.map executes both branches on TPU
    # (measured: overflow-fraction-independent cost), so the partition is
    # STATIC — the sorted tail eighth of chunks always runs the exact
    # overflow passes, the head chunks only the square pass.  Exactness
    # therefore holds for up to tail_budget overflowing ROIs (12.5% of
    # the set, >= 1 chunk); any excess beyond the budget falls back to
    # the square window.  Real-weight serving geometries measure 2-5%
    # proposal overflow (the round-4 25% budget was sized to the
    # random-weight bench's sliver boxes); the elongated passes DMA
    # ~9 MB of windows per tail ROI, so the tail budget is a direct
    # ~10 ms/batch lever on the box stage (round-5 profile).
    roi_chunk = 256
    pad_n = (-n) % sub_chunk if n <= roi_chunk else (-n) % roi_chunk
    if pad_n:
        # padded ROIs must read as in-window (fit=True) with cnt=1 so they
        # neither select the overflow result nor divide by zero
        pad_vals = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0,
                    True, True)
        args = tuple(
            jnp.pad(a, ((0, pad_n),) + ((0, 0),) * (a.ndim - 1),
                    constant_values=v)
            for a, v in zip(args, pad_vals))
    np_ = n + pad_n
    nch = max(1, np_ // roi_chunk)
    perm = None
    if square_covers_all:
        n_tail = 0
    elif np_ <= roi_chunk:
        n_tail = 1
    else:
        n_tail = max(1, nch // 8)
        overflow_all = ~(args[9] & args[10])
        perm = jnp.argsort(overflow_all)   # stable: non-overflow first
        args = tuple(a[perm] for a in args)

    if np_ <= roi_chunk:
        out = pool_slow(args) if n_tail else pool_fast(args)
    else:
        chunked = tuple(a.reshape((nch, roi_chunk) + a.shape[1:])
                        for a in args)
        parts = []
        if nch - n_tail > 0:
            head = tuple(a[:nch - n_tail] for a in chunked)
            parts.append(jax.lax.map(pool_fast, head))
        if n_tail:
            tail = tuple(a[nch - n_tail:] for a in chunked)
            parts.append(jax.lax.map(pool_slow, tail))
        out = jnp.concatenate(parts).reshape((np_, p, p, c))
    if perm is not None:
        out = out[jnp.argsort(perm)]
    out = out[:n].astype(feats[0].dtype).reshape(bsz, nroi, p, p, c)
    return out[0] if single else out
