"""Binary morphology on TPU via convolution thresholding.

Replaces the reference's skimage.morphology calls (Cython) used for obstacle
dilation, goal erosion/dilation and traversibility computation
(/root/reference/nav/agent/agent_state.py:84-85,382,438-440 and
agent_helper.py:408-451).  A disk dilation is a windowed max — expressed here
as conv2d(input, footprint) > 0, which XLA lowers to an MXU-friendly
convolution; erosion is its dual.

Both jnp (device) and numpy (host planner) twins are provided: the planner
state machines run host-side on small grids where numpy's C loops win over a
device round-trip.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def disk(radius) -> np.ndarray:
    """Disk footprint, identical to ``skimage.morphology.disk(radius)``."""
    r = int(radius)
    y, x = np.mgrid[-r:r + 1, -r:r + 1]
    return (x ** 2 + y ** 2 <= r ** 2).astype(np.uint8)


# skimage's default footprint: connectivity-1 cross (3x3 diamond)
DEFAULT_CROSS = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=np.uint8)


def _conv2d_same(x, kernel):
    """2D correlation with zero padding, x: (H, W), kernel: (kh, kw)."""
    x4 = x[None, None].astype(jnp.float32)
    k4 = jnp.asarray(kernel, dtype=jnp.float32)[None, None]
    out = lax.conv_general_dilated(
        x4, k4, window_strides=(1, 1),
        padding=[(kernel.shape[0] // 2,) * 2, (kernel.shape[1] // 2,) * 2],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out[0, 0]


def binary_dilation(image, footprint=None):
    """jnp binary dilation; matches skimage.morphology.binary_dilation."""
    if footprint is None:
        footprint = DEFAULT_CROSS
    x = jnp.asarray(image).astype(jnp.float32)
    return _conv2d_same(x > 0, footprint) > 0.5


def binary_erosion(image, footprint=None):
    """jnp binary erosion; matches skimage.morphology.binary_erosion."""
    if footprint is None:
        footprint = DEFAULT_CROSS
    x = jnp.asarray(image) > 0
    inv = jnp.logical_not(x).astype(jnp.float32)
    return _conv2d_same(inv, footprint) < 0.5


# ----------------------------------------------------------------------
# Host (numpy) twins for the planner's small-grid state machines
# ----------------------------------------------------------------------

def _np_hits(image, footprint):
    """Count of set pixels under the footprint at each location (zero pad)."""
    img = np.asarray(image) > 0
    fp = np.asarray(footprint) > 0
    kh, kw = fp.shape
    ph, pw = kh // 2, kw // 2
    padded = np.zeros((img.shape[0] + 2 * ph, img.shape[1] + 2 * pw), dtype=np.int32)
    padded[ph:ph + img.shape[0], pw:pw + img.shape[1]] = img
    out = np.zeros(img.shape, dtype=np.int32)
    offs = np.argwhere(fp)
    for dy, dx in offs:
        out += padded[dy:dy + img.shape[0], dx:dx + img.shape[1]]
    return out


def np_binary_dilation(image, footprint=None) -> np.ndarray:
    if footprint is None:
        footprint = DEFAULT_CROSS
    return _np_hits(image, footprint) > 0


def np_binary_erosion(image, footprint=None) -> np.ndarray:
    if footprint is None:
        footprint = DEFAULT_CROSS
    fp = np.asarray(footprint) > 0
    return _np_hits(image, footprint) == int(fp.sum())
