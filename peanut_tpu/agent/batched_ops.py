"""Device-side batched ops for the parallel-episode runtime.

Each function here is the batched (B leading axis) equivalent of a host-side
step in the single-env agent; together they keep the per-tick host<->device
traffic down to poses, flags, and an 11x11 planning window per episode —
the maps never leave HBM.

Coordinate/threshold semantics match the single-env code paths (which are
themselves reference-parity; see agent/state.py and agent/planner.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import eikonal_distance, masked_fill_unreachable
from ..kernels.morphology import disk, DEFAULT_CROSS


def _conv_batch(x, kernel):
    """(B, H, W) correlation with zero padding."""
    k = jnp.asarray(kernel, jnp.float32)[None, None]
    out = jax.lax.conv_general_dilated(
        x[:, None].astype(jnp.float32), k, (1, 1),
        [(kernel.shape[0] // 2,) * 2, (kernel.shape[1] // 2,) * 2],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out[:, 0]


def batch_dilate(x, footprint):
    return _conv_batch((x > 0).astype(jnp.float32), footprint) > 0.5


def batch_erode(x, footprint):
    inv = jnp.logical_not(x > 0).astype(jnp.float32)
    return _conv_batch(inv, footprint) < 0.5


def mark_agent(maps, loc_r, loc_c, radius: int, channels: Tuple[int, ...],
               value: float = 1.0):
    """Stamp a (2r+1)^2 square at per-env (loc_r, loc_c) into ``channels``.

    maps: (B, C, H, W); loc_r/loc_c: (B,) int32.  Equivalent of the host
    slice-assignments in agent/state.py update_local_map (with edge clip).
    """
    b, c, h, w = maps.shape
    dr = jnp.arange(-radius, radius + 1)
    rr = jnp.clip(loc_r[:, None] + dr[None, :], 0, h - 1)      # (B, K)
    cc = jnp.clip(loc_c[:, None] + dr[None, :], 0, w - 1)

    def stamp(m, r_idx, c_idx):
        for ch in channels:
            m = m.at[ch, r_idx[:, None], c_idx[None, :]].set(value)
        return m

    return jax.vmap(stamp)(maps, rr, cc)


def fill_disk(maps, channel: int, loc_r, loc_c, selem_idx_r, selem_idx_c,
              offset: int):
    """Set a disk footprint of cells to 1 in one channel, per env (the
    explored-under-agent fill, agent/state.py:_fill_explored)."""
    b, c, h, w = maps.shape
    rr = jnp.clip(loc_r[:, None] + jnp.asarray(selem_idx_r)[None, :] - offset,
                  0, h - 1)
    cc = jnp.clip(loc_c[:, None] + jnp.asarray(selem_idx_c)[None, :] - offset,
                  0, w - 1)

    def stamp(m, r_idx, c_idx):
        return m.at[channel, r_idx, c_idx].set(1.0)

    return jax.vmap(stamp)(maps, rr, cc)


def window_shuttle_out(full_maps, local_maps, lmb):
    """Write each env's local window back into its full map.

    lmb: (B, 4) int32 [gx1, gx2, gy1, gy2] (sizes are static)."""
    def one(fm, lm, box):
        return jax.lax.dynamic_update_slice(
            fm, lm, (jnp.int32(0), box[0], box[2]))

    return jax.vmap(one)(full_maps, local_maps, lmb)


def window_shuttle_in(full_maps, lmb, local_h: int, local_w: int):
    """Slice each env's local window out of its full map."""
    def one(fm, box):
        return jax.lax.dynamic_slice(
            fm, (jnp.int32(0), box[0], box[2]),
            (fm.shape[0], local_h, local_w))

    return jax.vmap(one)(full_maps, lmb)


class PlanOutputs(NamedTuple):
    window: jnp.ndarray        # (B, K, K) distance window around each agent
    distance: jnp.ndarray      # (B,) raw fmm distance at the agent cell
    fmax: jnp.ndarray          # (B,) per-env max finite distance (debug)


def build_traversible(obstacle, collision, visited, loc_r, loc_c,
                      col_rad: int, close_left, close_right, close_top,
                      close_bottom):
    """Batched traversibility (agent/planner.py _traversible + border
    closing), WITHOUT the +1 boundary ring (handled by the caller's padded
    solve).  obstacle/collision/visited: (B, H, W); close_*: (B,) bool flags
    for global-map-edge walls."""
    b, h, w = obstacle.shape
    grid = jnp.rint(obstacle)
    # close off rows/cols at the global map edge
    grid = jnp.where(close_top[:, None, None]
                     & (jnp.arange(h)[None, :, None] == 0), 1.0, grid)
    grid = jnp.where(close_bottom[:, None, None]
                     & (jnp.arange(h)[None, :, None] == h - 1), 1.0, grid)
    grid = jnp.where(close_left[:, None, None]
                     & (jnp.arange(w)[None, None, :] == 0), 1.0, grid)
    grid = jnp.where(close_right[:, None, None]
                     & (jnp.arange(w)[None, None, :] == w - 1), 1.0, grid)

    trav = jnp.logical_not(batch_dilate(grid, disk(col_rad)))
    trav = trav & jnp.logical_not(collision > 0)
    trav = trav | (visited > 0)

    # agent 3x3 always traversible
    dr = jnp.arange(-1, 2)
    rr = jnp.clip(loc_r[:, None] + dr[None, :], 0, h - 1)
    cc = jnp.clip(loc_c[:, None] + dr[None, :], 0, w - 1)

    def stamp(t, r_idx, c_idx):
        return t.at[r_idx[:, None], c_idx[None, :]].set(True)

    trav = jax.vmap(stamp)(trav, rr, cc)
    return trav, grid


def dilate_goal(goal, found_goal, is_toilet):
    """Goal-region dilation with per-env footprint choice (planner._get_stg):
    disk(8) found / disk(6) found+toilet / disk(2) otherwise."""
    d8 = batch_dilate(goal, disk(8))
    d6 = batch_dilate(goal, disk(6))
    d2 = batch_dilate(goal, disk(2))
    found = found_goal[:, None, None] > 0
    toilet = is_toilet[:, None, None]
    return jnp.where(found & toilet, d6, jnp.where(found, d8, d2))


@functools.partial(jax.jit, static_argnames=("n_iters", "win", "block",
                                             "inner"))
def plan_distance_fields(traversible, goal_dilated, loc_r, loc_c,
                         n_iters: int = 2, win: int = 5,
                         block: int = 16, inner: int = 40):
    """Batched boundary-padded eikonal solve + per-env window extraction.

    Equivalent to FMMPlanner construction with add_boundary (traversible ring
    of 1s, goal ring of 0s; agent/planner.py:_get_stg) followed by
    fmm_dist filling; returns the (2*win+1)^2 window centred at each agent
    (in padded coordinates: agent at loc+1).
    """
    b, h, w = traversible.shape
    trav_b = jnp.pad(traversible, ((0, 0), (1, 1), (1, 1)),
                     constant_values=True)
    goal_b = jnp.pad(goal_dilated, ((0, 0), (1, 1), (1, 1)),
                     constant_values=False)
    d = eikonal_distance(trav_b, goal_b, n_iters=n_iters, block=block,
                         inner=inner)
    d = masked_fill_unreachable(d)

    # pad by win with the same sentinel the host planner uses (shape^2)
    sentinel = float((h + 2) ** 2)
    dp = jnp.pad(d, ((0, 0), (win, win), (win, win)),
                 constant_values=sentinel)
    k = 2 * win + 1

    def extract(dmap, r, c):
        # agent at (r+1, c+1) in padded solve coords; +win for the pad
        return jax.lax.dynamic_slice(dmap, (r + 1, c + 1), (k, k))

    window = jax.vmap(extract)(dp, loc_r, loc_c)
    distance = window[:, win, win]
    fmax = jnp.max(jnp.where(jnp.isfinite(d), d, 0.0), axis=(1, 2))
    return PlanOutputs(window=window, distance=distance, fmax=fmax)
