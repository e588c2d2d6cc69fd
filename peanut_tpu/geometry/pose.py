"""Planar pose math (host-side numpy; tiny per-step scalars).

Matches /root/reference/nav/agent/utils/pose.py.
"""

from __future__ import annotations

import numpy as np


def get_l2_distance(x1, x2, y1, y2):
    return ((x1 - x2) ** 2 + (y1 - y2) ** 2) ** 0.5


def get_rel_pose_change(pos2, pos1):
    """Relative (dx, dy, dtheta) of pos2 w.r.t. pos1; poses are (x, y, o_rad)."""
    x1, y1, o1 = pos1
    x2, y2, o2 = pos2
    theta = np.arctan2(y2 - y1, x2 - x1) - o1
    dist = get_l2_distance(x1, x2, y1, y2)
    dx = dist * np.cos(theta)
    dy = dist * np.sin(theta)
    do = o2 - o1
    return dx, dy, do


def get_new_pose(pose, rel_pose_change):
    """Integrate a relative pose change; orientation in degrees."""
    x, y, o = pose
    dx, dy, do = rel_pose_change
    global_dx = dx * np.sin(np.deg2rad(o)) + dy * np.cos(np.deg2rad(o))
    global_dy = dx * np.cos(np.deg2rad(o)) - dy * np.sin(np.deg2rad(o))
    x += global_dy
    y += global_dx
    o += np.rad2deg(do)
    if o > 180.0:
        o -= 360.0
    return x, y, o


# jnp twin used inside the fused mapping step (reference mapping.py:143-158)
RAD2DEG = 57.29577951308232


def integrate_pose(pose, rel):
    """Batched pose integration in degrees, jnp-friendly.

    pose: (B, 3) [x, y, o_deg]; rel: (B, 3) [dx, dy, do_rad].
    Matches get_new_pose_batch in reference mapping.py:143-158 including the
    double-fmod wraparound of the heading.
    """
    import jax.numpy as jnp

    o_rad = pose[:, 2] / RAD2DEG
    y = pose[:, 1] + rel[:, 0] * jnp.sin(o_rad) + rel[:, 1] * jnp.cos(o_rad)
    x = pose[:, 0] + rel[:, 0] * jnp.cos(o_rad) - rel[:, 1] * jnp.sin(o_rad)
    o = pose[:, 2] + rel[:, 2] * RAD2DEG
    o = jnp.fmod(o - 180.0, 360.0) + 180.0
    o = jnp.fmod(o + 180.0, 360.0) - 180.0
    return jnp.stack([x, y, o], axis=1)


def integrate_pose_np(pose: np.ndarray, rel: np.ndarray) -> np.ndarray:
    """Host float32 twin of :func:`integrate_pose`.

    The agent runtimes integrate poses host-side (so the host's collision /
    line-drawing cells and the device's stamping cells come from the same
    values); this is the single source of that arithmetic.
    pose: (B, 3) [x, y, o_deg]; rel: (B, 3) [dx, dy, do_rad].
    """
    pose = np.asarray(pose, np.float32)
    rel = np.asarray(rel, np.float32)
    o_rad = pose[:, 2] / np.float32(RAD2DEG)
    y = pose[:, 1] + rel[:, 0] * np.sin(o_rad) + rel[:, 1] * np.cos(o_rad)
    x = pose[:, 0] + rel[:, 0] * np.cos(o_rad) - rel[:, 1] * np.sin(o_rad)
    o = pose[:, 2] + rel[:, 2] * np.float32(RAD2DEG)
    o = np.fmod(o - 180.0, 360.0) + 180.0
    o = np.fmod(o + 180.0, 360.0) - 180.0
    return np.stack([x, y, o], axis=1).astype(np.float32)


def threshold_poses(coords, shape):
    coords[0] = min(max(0, coords[0]), shape[0] - 1)
    coords[1] = min(max(0, coords[1]), shape[1] - 1)
    return coords
