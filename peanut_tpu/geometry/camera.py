"""Pinhole camera model and depth back-projection (pure jnp, jit-friendly).

Numerics match the reference implementation
(/root/reference/nav/agent/utils/depth_utils.py:27-34,129-155): principal
point at ((W-1)/2, (H-1)/2), focal length (W/2)/tan(hfov/2), and an
image-space grid whose vertical axis is flipped so Z increases upward.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class CameraMatrix(NamedTuple):
    xc: float
    zc: float
    f: float


def get_camera_matrix(width: int, height: int, fov_deg: float) -> CameraMatrix:
    """Camera intrinsics from image size and horizontal FOV (degrees)."""
    xc = (width - 1.0) / 2.0
    zc = (height - 1.0) / 2.0
    f = (width / 2.0) / np.tan(np.deg2rad(fov_deg / 2.0))
    return CameraMatrix(xc=float(xc), zc=float(zc), f=float(f))


def point_cloud_from_depth(depth, camera: CameraMatrix, scale: int = 1):
    """Back-project a depth image into a camera-frame point cloud.

    Args:
      depth: (..., H, W) depth in the same units the output should carry.
      camera: intrinsics from :func:`get_camera_matrix`.
      scale: integer stride for subsampling rows/cols.

    Returns:
      (..., H//scale, W//scale, 3) array; axis order (X right, Y forward
      into the image, Z up) — identical to the reference
      get_point_cloud_from_z_t (depth_utils.py:129-155).
    """
    depth = jnp.asarray(depth)
    h, w = depth.shape[-2], depth.shape[-1]
    grid_x = jnp.arange(w, dtype=depth.dtype)[None, :]          # (1, W)
    grid_z = jnp.arange(h - 1, -1, -1, dtype=depth.dtype)[:, None]  # (H, 1)

    y = depth[..., ::scale, ::scale]
    gx = grid_x[::1, ::scale] if scale != 1 else grid_x
    gz = grid_z[::scale, ::1] if scale != 1 else grid_z
    x = (gx - camera.xc) * y / camera.f
    z = (gz - camera.zc) * y / camera.f
    return jnp.stack((x, y, z), axis=-1)
