"""Multi-level ROIAlign on TPU.

Replaces detectron2's CUDA ROIAlignV2 (aligned=True).  TPU-first design: the
FPN levels are padded to a common width and concatenated along H into ONE
buffer, each ROI's sample coordinates get a per-level row offset, and the
whole pooling becomes a single batched bilinear gather — no per-level
dynamic partitioning, fully static shapes.

Sampling uses a fixed sampling_ratio (detectron2's ratio-0 "adaptive" mode
varies the grid per ROI, which is hostile to static compilation; a fixed 2x2
grid per bin matches d2's accuracy in practice).
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
                         sampling_ratio: int = 2) -> jnp.ndarray:
    """ROIAlign over an FPN pyramid.

    Args:
      feats: per-level (H_l, W_l, C) maps, levels ordered fine->coarse.
      boxes: (N, 4) XYXY in input-image coordinates.
      strides: per-level feature strides (e.g. 4, 8, 16, 32).
      output_size: pooled resolution P (P x P bins).

    Returns:
      (N, P, P, C) pooled features.
    """
    n = boxes.shape[0]
    c = feats[0].shape[-1]
    p = output_size
    s = sampling_ratio
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
    roi_w = jnp.maximum(x2 - x1, 1e-6)
    roi_h = jnp.maximum(y2 - y1, 1e-6)
    bin_w = roi_w / p
    bin_h = roi_h / p

    # sample grid: (P*s) points per axis at bin-subdivided centres
    grid = (jnp.arange(p * s, dtype=jnp.float32) + 0.5) / s  # in bin units
    sample_x = x1[:, None] + grid[None, :] * bin_w[:, None]  # (N, P*s)
    sample_y = y1[:, None] + grid[None, :] * bin_h[:, None]

    # clamp into the level's valid extent (d2 clamps sampling coords)
    sample_x = jnp.clip(sample_x, 0.0, lvl_w[:, None] - 1.0)
    sample_y = jnp.clip(sample_y, 0.0, lvl_h[:, None] - 1.0)

    x0f = jnp.floor(sample_x)
    y0f = jnp.floor(sample_y)
    wx1 = sample_x - x0f
    wy1 = sample_y - y0f

    flat = stacked.reshape(total_h * max_w, c)

    def gather(yi, xi):
        # yi: (N, PS) level-local rows; xi: (N, PS) cols
        rows = jnp.clip(yi, 0, total_h - 1).astype(jnp.int32)
        cols = jnp.clip(xi, 0, max_w - 1).astype(jnp.int32)
        # combine into (N, PS, PS) sample lattice indices
        lin = (rows[:, :, None] + jnp.zeros_like(cols[:, None, :],
                                                 dtype=jnp.int32)) * max_w \
            + cols[:, None, :]
        return flat[lin.reshape(-1)].reshape(n, p * s, p * s, c)

    y0 = y0f + lvl_off[:, None]
    y1i = jnp.minimum(y0f + 1, lvl_h[:, None] - 1) + lvl_off[:, None]
    x0 = x0f
    x1i = jnp.minimum(x0f + 1, lvl_w[:, None] - 1)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1i)
    v10 = gather(y1i, x0)
    v11 = gather(y1i, x1i)

    wy1e = wy1[:, :, None, None]
    wx1e = wx1[:, None, :, None]
    val = (v00 * (1 - wy1e) * (1 - wx1e) + v01 * (1 - wy1e) * wx1e
           + v10 * wy1e * (1 - wx1e) + v11 * wy1e * wx1e)

    # average the s x s samples per bin
    val = val.reshape(n, p, s, p, s, c).mean(axis=(2, 4))
    return val
