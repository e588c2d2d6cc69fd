"""Point-cloud frame transforms (pure jnp).

Semantics match /root/reference/nav/agent/utils/depth_utils.py:158-195: the
rotation matrices are built host-side (static angles) and applied as a single
matmul over the flattened cloud.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .rotation import get_r_matrix


def transform_camera_view(xyz, sensor_height: float, camera_elevation_deg: float):
    """Rotate camera-frame points by the camera elevation and lift by height.

    Args:
      xyz: (..., 3) point cloud.
      sensor_height: camera height above the floor (same units as xyz).
      camera_elevation_deg: static elevation angle in degrees.
    """
    import jax.lax

    r = get_r_matrix([1.0, 0.0, 0.0], angle=np.deg2rad(camera_elevation_deg))
    rt = jnp.asarray(r.T, dtype=xyz.dtype)
    out = jnp.matmul(xyz.reshape(-1, 3), rt,
                     precision=jax.lax.Precision.HIGHEST).reshape(xyz.shape)
    return out.at[..., 2].add(sensor_height)


def transform_pose(xyz, pose_xyt):
    """Transform points into the frame given by (x, y, theta_radians).

    ``pose_xyt`` must be static python/numpy values (the reference only ever
    calls this with the fixed shift_loc = [vr*res/2, 0, pi/2]; mapping.py:34).
    """
    import jax.lax

    x0, y0, theta = pose_xyt
    r = get_r_matrix([0.0, 0.0, 1.0], angle=theta - np.pi / 2.0)
    rt = jnp.asarray(r.T, dtype=xyz.dtype)
    out = jnp.matmul(xyz.reshape(-1, 3), rt,
                     precision=jax.lax.Precision.HIGHEST).reshape(xyz.shape)
    out = out.at[..., 0].add(x0)
    out = out.at[..., 1].add(y0)
    return out
