"""Affine sampling grids + bilinear resampling with torch-parity semantics.

The reference warps each egocentric map into the allocentric frame with
``F.affine_grid`` (align_corners **False**, the torch default at 1.10) followed
by two ``F.grid_sample`` calls with align_corners **True** and zero padding
(/root/reference/nav/agent/utils/model.py:40-41 and
/root/reference/nav/agent/mapping.py:172-173).  Bit-comparable maps require
reproducing exactly that mixed convention, so both functions take an
``align_corners`` flag implementing both torch behaviours.

These are pure-jnp gather formulations: XLA fuses the index arithmetic and the
4-tap gather into one HBM pass, which is the right shape for TPU — a scatter
formulation would serialize on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def _base_grid_1d(n: int, align_corners: bool, dtype):
    """Normalized sample coordinates along one axis, matching torch."""
    if align_corners:
        if n == 1:
            return jnp.zeros((1,), dtype=dtype)
        return jnp.linspace(-1.0, 1.0, n, dtype=dtype)
    # torch: ((2i + 1) / n) - 1
    i = jnp.arange(n, dtype=dtype)
    return (2.0 * i + 1.0) / n - 1.0


def affine_grid(theta, size, align_corners: bool = False):
    """2D affine sampling grid, matching ``torch.nn.functional.affine_grid``.

    Args:
      theta: (N, 2, 3) affine matrices.
      size: (N, C, H, W) target size tuple.
      align_corners: torch semantics flag (torch default False).

    Returns:
      (N, H, W, 2) grid of (x, y) normalized coords.
    """
    n, _, h, w = size
    theta = jnp.asarray(theta)
    dtype = theta.dtype
    xs = _base_grid_1d(w, align_corners, dtype)          # (W,)
    ys = _base_grid_1d(h, align_corners, dtype)          # (H,)
    gx, gy = jnp.meshgrid(xs, ys)                        # (H, W) each
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1)            # (H, W, 3)
    # grid[n,h,w,:] = theta[n] @ base[h,w]
    grid = jnp.einsum("hwk,njk->nhwj", base, theta)
    return grid


def grid_sample(inp, grid, align_corners: bool = True):
    """Bilinear sampling with zero padding, matching ``F.grid_sample``.

    Args:
      inp: (N, C, H, W) input feature map.
      grid: (N, Ho, Wo, 2) normalized (x, y) sample locations in [-1, 1].
      align_corners: unnormalization convention (reference uses True).

    Returns:
      (N, C, Ho, Wo) sampled output.
    """
    inp = jnp.asarray(inp)
    n, c, h, w = inp.shape
    x = grid[..., 0]
    y = grid[..., 1]
    if align_corners:
        ix = (x + 1.0) * 0.5 * (w - 1)
        iy = (y + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((x + 1.0) * w - 1.0) * 0.5
        iy = ((y + 1.0) * h - 1.0) * 0.5

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    ix1 = ix0 + 1.0
    iy1 = iy0 + 1.0

    wx1 = ix - ix0
    wx0 = 1.0 - wx1
    wy1 = iy - iy0
    wy0 = 1.0 - wy1

    def tap(iy_f, ix_f, wy_f, wx_f):
        inside = ((ix_f >= 0) & (ix_f <= w - 1) & (iy_f >= 0) & (iy_f <= h - 1))
        ixc = jnp.clip(ix_f, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy_f, 0, h - 1).astype(jnp.int32)
        # gather: (N, Ho, Wo) index maps applied per channel
        batch = jnp.arange(n).reshape(n, 1, 1)
        vals = inp[batch, :, iyc, ixc]                   # (N, Ho, Wo, C)
        wgt = (wy_f * wx_f * inside.astype(inp.dtype))[..., None]
        return vals * wgt

    out = (tap(iy0, ix0, wy0, wx0) + tap(iy0, ix1, wy0, wx1)
           + tap(iy1, ix0, wy1, wx0) + tap(iy1, ix1, wy1, wx1))
    return jnp.moveaxis(out, -1, 1)


def pose_warp_grids(st_pose, size, dtype=jnp.float32):
    """Rotation + translation sampling grids from a normalized pose.

    Replicates reference get_grid (nav/agent/utils/model.py:7-43): ``st_pose``
    is (N, 3) [x_norm, y_norm, theta_deg]; returns (rot_grid, trans_grid) each
    (N, H, W, 2) built with torch's affine_grid default (align_corners=False).
    """
    import numpy as np

    x = st_pose[:, 0]
    y = st_pose[:, 1]
    t = st_pose[:, 2] * (np.pi / 180.0)
    cos_t = jnp.cos(t)
    sin_t = jnp.sin(t)
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)

    theta1 = jnp.stack(
        [jnp.stack([cos_t, -sin_t, zero], axis=1),
         jnp.stack([sin_t, cos_t, zero], axis=1)], axis=1).astype(dtype)
    theta2 = jnp.stack(
        [jnp.stack([one, zero, x], axis=1),
         jnp.stack([zero, one, y], axis=1)], axis=1).astype(dtype)

    rot_grid = affine_grid(theta1, size, align_corners=False)
    trans_grid = affine_grid(theta2, size, align_corners=False)
    return rot_grid, trans_grid
