"""Multi-level ROIAlign on TPU.

Replaces detectron2's CUDA ROIAlignV2 (aligned=True).  TPU-first design: the
FPN levels are padded to a common width and concatenated along H into ONE
buffer, each ROI's sample coordinates get a per-level row offset, and the
whole pooling becomes a single batched bilinear gather — no per-level
dynamic partitioning, fully static shapes.

Sampling implements detectron2's adaptive ratio-0 grid (the default at the
reference's serving path, nav/agent/utils/segmentation.py:38 via
DefaultPredictor): per ROI, ``g = ceil(roi_size_px / pooled_size)`` samples
per bin per axis.  Static shapes are preserved by always generating ``gmax``
sample slots per bin — ``gmax`` is a *compile-time* bound derived from the
coarsest level's extent — and masking slots ``j >= g`` out of the average.
Positions of the live slots are the exact d2 ones, ``(j + 0.5) / g`` bin
fractions with per-ROI ``g``, so results match the CUDA kernel bit-for-bit
up to float summation order.  A fixed grid (``sampling_ratio > 0``) is kept
as an option.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


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
    """Concatenate (H_l, W_l, C) levels along H with right zero padding.

    Returns (stacked (sumH, maxW, C), row_offsets (L,), widths (L,))."""
    max_w = max(f.shape[1] for f in feats)
    padded = [jnp.pad(f, ((0, 0), (0, max_w - f.shape[1]), (0, 0)))
              for f in feats]
    offsets = np.cumsum([0] + [f.shape[0] for f in feats[:-1]])
    heights = np.array([f.shape[0] for f in feats])
    stacked = jnp.concatenate(padded, axis=0)
    return stacked, offsets, heights


def multilevel_roi_align(feats: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                         strides: Sequence[int], output_size: int,
                         sampling_ratio: int = 0) -> jnp.ndarray:
    """ROIAlign over an FPN pyramid (d2 ROIAlignV2 semantics).

    Args:
      feats: per-level (H_l, W_l, C) maps, levels ordered fine->coarse.
      boxes: (N, 4) XYXY in input-image coordinates.
      strides: per-level feature strides (e.g. 4, 8, 16, 32).
      output_size: pooled resolution P (P x P bins).
      sampling_ratio: 0 = d2 adaptive grid (ceil(bin px), the reference
        default); > 0 = fixed grid of that many samples per bin per axis.

    Returns:
      (N, P, P, C) pooled features.
    """
    n = boxes.shape[0]
    c = feats[0].shape[-1]
    p = output_size
    stacked, row_off, heights = stack_pyramid(feats)
    total_h, max_w, _ = stacked.shape

    levels = assign_fpn_levels(boxes)                      # (N,)
    stride = jnp.asarray(strides, jnp.float32)[levels]     # (N,)
    lvl_off = jnp.asarray(row_off, jnp.float32)[levels]    # (N,)
    lvl_h = jnp.asarray(heights, jnp.float32)[levels]
    lvl_w_arr = np.array([f.shape[1] for f in feats], np.float32)
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

    if sampling_ratio > 0:
        s = sampling_ratio
        gx = jnp.full((n,), float(s))
        gy = jnp.full((n,), float(s))
    else:
        # adaptive bound: the largest ROI lives on the coarsest level and
        # spans at most its full extent, so gmax is static per geometry
        coarse = feats[-1]
        s = max(1, int(-(-max(coarse.shape[0], coarse.shape[1]) // p)))
        gx = jnp.clip(jnp.ceil(roi_w / p), 1.0, s)
        gy = jnp.clip(jnp.ceil(roi_h / p), 1.0, s)

    # sample lattice: bin b, slot j at fraction (j + 0.5) / g of the bin;
    # slots j >= g are masked out of the average
    slots = jnp.arange(s, dtype=jnp.float32)               # (s,)
    frac_x = (slots[None, :] + 0.5) / gx[:, None]          # (N, s)
    frac_y = (slots[None, :] + 0.5) / gy[:, None]
    mask_x = (slots[None, :] < gx[:, None]).astype(jnp.float32)
    mask_y = (slots[None, :] < gy[:, None]).astype(jnp.float32)
    bins = jnp.arange(p, dtype=jnp.float32)                # (p,)
    # (N, p, s) sample coordinates, clamped into the level's valid extent
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
    # Window rows that alias other pyramid levels get zero hat weight, so
    # the aliasing is inert.
    max_roi_px = max(feats[-1].shape[0], feats[-1].shape[1])
    win = int(min(total_h, -(-(max_roi_px + 2) // 8) * 8))
    r_idx = jnp.arange(win, dtype=jnp.float32)             # (win,)

    def interp_matrix(sam, msk, origin):
        """(N, p, s) sample coords + slot mask -> (N, p, win) weights."""
        local = sam - origin[:, None, None]                # window-local
        hat = jnp.clip(1.0 - jnp.abs(local[..., None]
                                     - r_idx[None, None, None, :]), 0.0, 1.0)
        return (hat * msk[:, None, :, None]).sum(axis=2)   # (N, p, win)

    oy = jnp.clip(jnp.floor(sample_y.min(axis=(1, 2))), 0.0, None)
    ox = jnp.clip(jnp.floor(sample_x.min(axis=(1, 2))), 0.0, None)
    ay = interp_matrix(sample_y, mask_y, oy)               # (N, p, win)
    ax = interp_matrix(sample_x, mask_x, ox)
    cnt = jnp.maximum(gx * gy, 1.0)

    def pool_rois(args):
        ay_, ax_, oy_, ox_, off_, cnt_ = args
        n_c = ay_.shape[0]
        rows = (oy_[:, None] + off_[:, None]
                + r_idx[None, :]).astype(jnp.int32)        # (n_c, win)
        cols = (ox_[:, None] + r_idx[None, :]).astype(jnp.int32)
        rows = jnp.clip(rows, 0, total_h - 1)
        cols = jnp.clip(cols, 0, max_w - 1)
        lin = rows[:, :, None] * max_w + cols[:, None, :]
        window = flat[lin.reshape(-1)].reshape(n_c, win, win, c)
        pooled = jnp.einsum("npr,nrwc->npwc", ay_,
                            window.astype(jnp.float32))
        pooled = jnp.einsum("nqw,npwc->npqc", ax_, pooled)
        return pooled / cnt_[:, None, None, None]

    args = (ay, ax, oy, ox, lvl_off, cnt)
    # chunk ROIs so the window transient stays bounded under a batched
    # detect vmap; one chunk when the ROI set is already small
    roi_chunk = 256
    if n <= roi_chunk:
        out = pool_rois(args)
    else:
        pad_n = (-n) % roi_chunk
        if pad_n:
            args = tuple(jnp.pad(a, ((0, pad_n),) + ((0, 0),) * (a.ndim - 1))
                         for a in args)
        nch = (n + pad_n) // roi_chunk
        chunked = tuple(a.reshape((nch, roi_chunk) + a.shape[1:])
                        for a in args)
        out = jax.lax.map(pool_rois, chunked).reshape(
            (n + pad_n, p, p, c))[:n]
    return out.astype(feats[0].dtype)
