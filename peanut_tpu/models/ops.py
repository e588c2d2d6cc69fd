"""Shared tensor ops with torch-parity semantics (resize, adaptive pooling).

These replace the reference's mmseg/ops/wrappers.py resize (F.interpolate)
and torch AdaptiveAvgPool2d.  Both are expressed as separable matrix products
precomputed at trace time, which XLA maps onto the MXU — faster on TPU than a
gather formulation and bit-stable across calls.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=256)
def _linear_resize_matrix(in_size: int, out_size: int, align_corners: bool):
    """(out, in) interpolation weights matching torch bilinear semantics."""
    w = np.zeros((out_size, in_size), np.float32)
    if out_size == 1:
        # torch convention: sample at 0 for align_corners, else scale*0.5-0.5
        src = np.array([0.0 if align_corners else
                        (in_size / out_size * 0.5 - 0.5)])
    elif align_corners:
        src = np.linspace(0, in_size - 1, out_size)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size) + 0.5) * scale - 0.5
    src = np.clip(src, 0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    w[np.arange(out_size), lo] += 1 - frac
    w[np.arange(out_size), hi] += frac
    return w


def resize_bilinear(x, size, align_corners: bool = False):
    """Bilinear resize of NHWC (or NCHW via axis detection is NOT done —
    input must be NHWC) feature maps, matching ``F.interpolate(mode=
    'bilinear')`` for both align_corners conventions.

    Args:
      x: (..., H, W, C).
      size: (out_h, out_w).
    """
    out_h, out_w = size
    in_h, in_w = x.shape[-3], x.shape[-2]
    if (in_h, in_w) == (out_h, out_w):
        return x
    wh = jnp.asarray(_linear_resize_matrix(in_h, out_h, align_corners))
    ww = jnp.asarray(_linear_resize_matrix(in_w, out_w, align_corners))
    x = jnp.einsum("oh,...hwc->...owc", wh, x)
    x = jnp.einsum("ow,...hwc->...hoc", ww, x)
    return x


@functools.lru_cache(maxsize=256)
def _adaptive_pool_matrix(in_size: int, out_size: int):
    """(out, in) averaging weights matching torch AdaptiveAvgPool2d bins."""
    w = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil
        w[i, start:end] = 1.0 / (end - start)
    return w


def adaptive_avg_pool(x, output_size):
    """torch-parity adaptive average pooling over NHWC feature maps.

    Args:
      x: (..., H, W, C); output_size: int or (oh, ow).
    """
    if isinstance(output_size, int):
        oh = ow = output_size
    else:
        oh, ow = output_size
    wh = jnp.asarray(_adaptive_pool_matrix(x.shape[-3], oh))
    ww = jnp.asarray(_adaptive_pool_matrix(x.shape[-2], ow))
    x = jnp.einsum("oh,...hwc->...owc", wh, x)
    x = jnp.einsum("ow,...hwc->...hoc", ww, x)
    return x
