"""Test-only numpy fast-marching oracle with skfmm's order-2 update.

Reconstructs what ``skfmm.distance(np.ma.MaskedArray(trav, walls), dx=1)``
computes at the reference call sites (fmm_planner.py:64,72 — phi is 1 on
traversible cells, 0 at goal cells, masked at walls):

* cells with phi == 0 are frozen at distance 0 (the zero contour passes
  exactly through goal cell centres; neighbours do NOT get interpolated
  inits because 1 * 0 is not a sign change),
* a binary heap marches the narrow band outward (accepted / trial / far),
* each update solves the Godunov quadratic with skfmm's second-order
  one-sided stencil per axis — (3T - 4*u1 + u2)/2 when the 2-away
  neighbour is frozen with u2 <= u1, else first-order (T - u1) — falling
  back to the all-first-order quadratic when the discriminant is negative
  (distance_marcher.cpp updatePointOrderTwo semantics),
* masked cells never participate and come back +inf, as do unreachable
  pockets.

Pure numpy + heapq; O(N log N). Used by tests/test_fmm_oracle.py to
cross-check kernels/fmm.py's sweeping solver on cluttered floor plans.
"""

from __future__ import annotations

import heapq

import numpy as np

INF = float("inf")


def heap_fmm(trav: np.ndarray, src: np.ndarray) -> np.ndarray:
    """Order-2 fast-marching distance to ``src`` cells.

    Args:
      trav: (H, W) bool — True = passable.
      src: (H, W) bool — True = distance-0 cells (a source on a wall is
        still a source, matching the masked-array assignment).

    Returns:
      (H, W) float64 distances, +inf at walls and unreachable cells.
    """
    trav = np.asarray(trav, bool)
    src = np.asarray(src, bool)
    h, w = trav.shape
    wall = (~trav) & (~src)
    FAR, TRIAL, FROZEN = 0, 1, 2
    d = np.full((h, w), INF)
    state = np.full((h, w), FAR, np.int8)
    d[src] = 0.0
    state[src] = FROZEN

    def solve(y, x, order):
        a = 0.0
        b = 0.0
        c = -1.0
        fallback = INF
        used = False
        for axis in range(2):
            u1 = INF
            u2 = INF
            for sgn in (-1, 1):
                yy = y + sgn * (axis == 0)
                xx = x + sgn * (axis == 1)
                if not (0 <= yy < h and 0 <= xx < w):
                    continue
                if wall[yy, xx] or state[yy, xx] != FROZEN:
                    continue
                if d[yy, xx] < u1:
                    u1 = d[yy, xx]
                    y2 = y + 2 * sgn * (axis == 0)
                    x2 = x + 2 * sgn * (axis == 1)
                    if (order == 2 and 0 <= y2 < h and 0 <= x2 < w
                            and not wall[y2, x2]
                            and state[y2, x2] == FROZEN
                            and d[y2, x2] <= u1):
                        u2 = d[y2, x2]
                    else:
                        u2 = INF
            if u1 < INF:
                used = True
                fallback = min(fallback, u1)
                if u2 < INF:
                    alpha, gamma = 1.5, 2.0 * u1 - 0.5 * u2
                else:
                    alpha, gamma = 1.0, u1
                a += alpha * alpha
                b -= 2.0 * alpha * gamma
                c += gamma * gamma
        if not used:
            return INF
        disc = b * b - 4.0 * a * c
        if disc < 0:
            if order == 2:
                return solve(y, x, 1)
            return fallback + 1.0
        return (-b + np.sqrt(disc)) / (2.0 * a)

    heap = []
    ys, xs = np.nonzero(src)
    for y, x in zip(ys.tolist(), xs.tolist()):
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            yy, xx = y + dy, x + dx
            if (0 <= yy < h and 0 <= xx < w and not wall[yy, xx]
                    and state[yy, xx] != FROZEN):
                t = solve(yy, xx, 2)
                if t < d[yy, xx]:
                    d[yy, xx] = t
                    state[yy, xx] = TRIAL
                    heapq.heappush(heap, (t, yy, xx))

    while heap:
        t, y, x = heapq.heappop(heap)
        if state[y, x] == FROZEN or t > d[y, x]:
            continue  # stale heap entry
        state[y, x] = FROZEN
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            yy, xx = y + dy, x + dx
            if (0 <= yy < h and 0 <= xx < w and not wall[yy, xx]
                    and state[yy, xx] != FROZEN):
                tn = solve(yy, xx, 2)
                if tn < d[yy, xx]:
                    d[yy, xx] = tn
                    state[yy, xx] = TRIAL
                    heapq.heappush(heap, (tn, yy, xx))

    d[wall] = INF
    return d
