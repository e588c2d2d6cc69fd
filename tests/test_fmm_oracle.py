"""Cross-check kernels/fmm.py against a heap-based marching oracle.

VERDICT round-2 item 2: the order-2 sweeping solver had only ever been
validated against itself and open-field analytics.  Here it is compared to
an actual fast-marching *algorithm* (tests/heap_fmm_oracle.py — binary
heap, accepted/trial/far, skfmm's order-2 Godunov update) on obstacle-rich
indoor floor plans (rooms + corridors + clutter), on a committed golden
map, and at the reference's planning geometry — including zero-flip checks
of the downstream planner decisions (stop, short-term-goal argmin, replan).

Measured bounds (recorded in PARITY.md): with the default n_iters2=2 the
max cell error vs the oracle is ~0.9 on 240^2 cluttered plans; n_iters2=1
left +5.7-cell unconverged overshoots (why 2 is the default).
"""

from __future__ import annotations

import numpy as np
import pytest

from heap_fmm_oracle import heap_fmm
from peanut_tpu.kernels import eikonal_distance
from peanut_tpu.planning.fmm_planner import FMMPlanner

MAX_CELL_ERR = 1.2      # measured ~0.9 over 20 plans; margin for seeds
MEAN_CELL_ERR = 0.5


def make_floorplan(rng, n=240, room=60, wall_t=2, door=7, clutter=45):
    """Rooms + corridors + clutter: walls on a room grid with random door
    gaps, plus random furniture-sized boxes."""
    occ = np.zeros((n, n), bool)
    occ[:wall_t] = occ[-wall_t:] = True
    occ[:, :wall_t] = occ[:, -wall_t:] = True
    for x in range(room, n - room // 2, room):
        occ[:, x:x + wall_t] = True
        for y0 in range(0, n - door - 4, room):
            dy = rng.randint(y0 + 2, y0 + room - door - 2)
            occ[dy:dy + door, x:x + wall_t] = False
    for y in range(room, n - room // 2, room):
        occ[y:y + wall_t, :] = True
        for x0 in range(0, n - door - 4, room):
            dx = rng.randint(x0 + 2, x0 + room - door - 2)
            occ[y:y + wall_t, dx:dx + door] = False
    for _ in range(clutter):
        cy, cx = rng.randint(wall_t + 2, n - 14, 2)
        hh, ww = rng.randint(2, 12, 2)
        occ[cy:cy + hh, cx:cx + ww] = True
    return ~occ


def random_goal(rng, trav, blob=False):
    free = np.argwhere(trav)
    gy, gx = free[rng.randint(len(free))]
    src = np.zeros_like(trav)
    if blob:
        src[max(gy - 2, 0):gy + 3, max(gx - 2, 0):gx + 3] = True
        src &= trav
        src[gy, gx] = True
    else:
        src[gy, gx] = True
    return src


def solver_field(trav, src, **kw):
    d = np.asarray(eikonal_distance(trav, src, **kw)).astype(np.float64)
    return np.where(d > 1e9, np.inf, d)


def compare(trav, src, **kw):
    want = heap_fmm(trav, src)
    got = solver_field(trav, src, **kw)
    # reachability must agree exactly (sealed pockets, walls)
    np.testing.assert_array_equal(np.isfinite(got), np.isfinite(want))
    both = np.isfinite(want)
    err = np.abs(got[both] - want[both])
    return err.max(), err.mean(), want, got


@pytest.mark.slow
def test_fmm_matches_marching_oracle_floorplans():
    """20 random cluttered 240^2 floor plans, point + blob goals."""
    worst = (0.0, 0.0)
    for seed in range(10):
        rng = np.random.RandomState(seed)
        trav = make_floorplan(rng)
        for blob in (False, True):
            src = random_goal(rng, trav, blob=blob)
            mx, mean, _, _ = compare(trav, src)
            worst = (max(worst[0], mx), max(worst[1], mean))
    assert worst[0] <= MAX_CELL_ERR, f"max cell error {worst}"
    assert worst[1] <= MEAN_CELL_ERR, f"mean cell error {worst}"


def test_fmm_oracle_decision_parity():
    """Zero flips of the planner decisions (stop, short-term-goal argmin,
    replan) between the device field and the oracle field on sampled
    agent states."""
    flips = 0
    checked = 0
    for seed in (0, 1, 2, 3):
        rng = np.random.RandomState(100 + seed)
        trav = make_floorplan(rng)
        src = random_goal(rng, trav)
        want = heap_fmm(trav, src)
        planner = FMMPlanner(trav.astype(np.float64))
        planner.set_multi_goal(src.astype(np.float64))
        got_filled = planner.fmm_dist

        fin = np.isfinite(want)
        want_filled = np.where(fin, want, want[fin].max() + 1)
        oracle_planner = FMMPlanner(trav.astype(np.float64))
        oracle_planner.fmm_dist = want_filled.astype(np.float32)

        cand = np.argwhere(trav & fin)
        for i in rng.choice(len(cand), size=25, replace=False):
            sy, sx = cand[i]
            a = planner.get_short_term_goal((float(sy), float(sx), 0.0))
            b = oracle_planner.get_short_term_goal((float(sy), float(sx),
                                                   0.0))
            checked += 1
            # stg cell, stop flag, replan flag
            if (a[0], a[1], a[3], a[4]) != (b[0], b[1], b[3], b[4]):
                flips += 1
    assert checked == 100
    assert flips == 0, f"{flips}/{checked} planner decisions flipped"


def test_fmm_oracle_golden_map():
    """The committed golden navigation map (sparse obstacles, open space)."""
    import os

    path = os.path.join(os.path.dirname(__file__), "data", "golden_maps",
                        "f00000.npz")
    maps = np.load(path)["maps"]
    occ = maps[0, 0] > 0
    trav = ~occ
    rng = np.random.RandomState(7)
    # a goal near the observed region so distances traverse the obstacles
    ys, xs = np.nonzero(occ)
    gy = int(np.clip(ys.mean() + 20, 0, trav.shape[0] - 1))
    gx = int(np.clip(xs.mean() + 20, 0, trav.shape[1] - 1))
    src = np.zeros_like(trav)
    src[gy, gx] = True
    # crop to a 480^2 window around the action to keep the oracle fast
    y0 = max(0, gy - 240)
    x0 = max(0, gx - 240)
    mx, mean, _, _ = compare(trav[y0:y0 + 480, x0:x0 + 480],
                             src[y0:y0 + 480, x0:x0 + 480])
    assert mx <= MAX_CELL_ERR
    assert mean <= MEAN_CELL_ERR


def stg_descent_gap(planner_oracle, state, stg):
    """How much worse (in cells of geodesic descent) the solver's chosen
    short-term goal is than the oracle's optimum, measured in the ORACLE's
    planning window.  0 = identical or equally good."""
    from peanut_tpu.planning.fmm_planner import step_dist, step_mask

    sy, sx = int(state[0]), int(state[1])
    du = planner_oracle.du
    fd = planner_oracle.fmm_dist
    dist = np.pad(fd, du, "constant", constant_values=fd.shape[0] ** 2)
    sub = dist[sy:sy + 2 * du + 1, sx:sx + 2 * du + 1].copy()
    m = step_mask(0.0, 0.0, 1.0, planner_oracle.step_size)
    dm = step_dist(0.0, 0.0, 1.0, planner_oracle.step_size)
    sub = sub * m + (1 - m) * fd.shape[0] ** 2
    sub -= sub[du, du]
    r = sub / dm
    sub[r < -1.5] = 1
    ay, ax = int(stg[0] - sy + du), int(stg[1] - sx + du)
    if not (0 <= ay <= 2 * du and 0 <= ax <= 2 * du):
        return np.inf
    return float(sub[ay, ax] - sub.min())


def check_decisions(trav, want, got, rng, n_states=60, stg_gap_tol=1.0):
    """stop/replan must match exactly; the short-term goal may differ by a
    waypoint whose geodesic descent is within ``stg_gap_tol`` cells of the
    oracle's optimum (the fields are re-solved every step, so equally-good
    adjacent waypoints are behavioral ties, not divergence)."""
    fin = np.isfinite(want)
    wantf = np.where(fin, want, want[fin].max() + 1).astype(np.float32)
    gotf = np.where(np.isfinite(got), got,
                    got[np.isfinite(got)].max() + 1).astype(np.float32)
    pa = FMMPlanner(trav.astype(np.float64))
    pa.fmm_dist = gotf
    pb = FMMPlanner(trav.astype(np.float64))
    pb.fmm_dist = wantf
    cand = np.argwhere(trav & fin)
    hard_flips = 0
    max_gap = 0.0
    for i in rng.choice(len(cand), size=n_states, replace=False):
        sy, sx = cand[i]
        a = pa.get_short_term_goal((float(sy), float(sx), 0.0))
        b = pb.get_short_term_goal((float(sy), float(sx), 0.0))
        if (a[3], a[4]) != (b[3], b[4]):
            hard_flips += 1
        if (a[0], a[1]) != (b[0], b[1]):
            max_gap = max(max_gap,
                          stg_descent_gap(pb, (sy, sx), (a[0], a[1])))
    assert hard_flips == 0, f"{hard_flips} stop/replan flips"
    assert max_gap <= stg_gap_tol, f"stg descent gap {max_gap}"


@pytest.mark.slow
def test_fmm_oracle_480():
    """Planning-geometry-sized (480^2) cluttered plans.  Longer paths
    accumulate scheme drift between sweeping and marching fixed points
    (measured max 7.0 cells = ~1.2% of the 600-cell geodesics, PARITY.md
    delta 1); decisions stay behaviorally tied."""
    for seed in (11, 12, 13):
        rng = np.random.RandomState(seed)
        trav = make_floorplan(rng, n=480, room=96, clutter=120)
        src = random_goal(rng, trav)
        mx, mean, want, got = compare(trav, src)
        assert mx <= 8.0, f"seed {seed}: {mx}"
        assert mean <= 2.0, f"seed {seed}: mean {mean}"
        check_decisions(trav, want, got, rng)


@pytest.mark.slow
def test_fmm_oracle_960():
    """Full-map geometry (960^2).  The sweeping fixed point undershoots
    marching by up to ~3.5% on 1300-cell geodesics (measured 45.4 max /
    9.4 mean, iteration-independent — scheme-intrinsic, PARITY.md delta 1).
    At those distances the goal weighting exp(-dd/100) is ~2e-6, and the
    planner's decisions are window-local, so the check here is the honest
    relative bound plus zero behavioral flips."""
    rng = np.random.RandomState(21)
    trav = make_floorplan(rng, n=960, room=160, wall_t=3, door=10,
                          clutter=300)
    src = random_goal(rng, trav)
    mx, mean, want, got = compare(trav, src)
    fin = np.isfinite(want)
    rel = (np.abs(got[fin] - want[fin]) / np.maximum(want[fin], 1.0)).max()
    assert rel <= 0.045, f"960^2 relative err {rel}"
    assert mx <= 60.0, f"960^2 max err {mx}"
    check_decisions(trav, want, got, rng, n_states=40)


@pytest.mark.slow
def test_plan_serving_tiling_decisions():
    """The serving STG tiling (NavConfig.plan_block=8/plan_inner=24, 1.35x
    faster sweeps at 480^2) must keep planner decisions behaviorally tied
    to the marching oracle: zero stop/replan flips and short-term goals
    within a fraction of a cell of geodesic descent (measured: flips=0,
    stg_gap<=0.19, field max err 11.0 far-field / mean 2.0 over seeds
    11-13).  The exact tiling (16/40) stays the config default."""
    for seed in (11, 12, 13):
        rng = np.random.RandomState(seed)
        trav = make_floorplan(rng, n=480, room=96, clutter=120)
        src = random_goal(rng, trav)
        want = heap_fmm(trav, src)
        got = solver_field(trav, src, block=8, inner=24)
        fin = np.isfinite(want) & np.isfinite(got)
        err = np.abs(got[fin] - want[fin])
        assert err.max() <= 14.0, f"seed {seed}: {err.max()}"
        assert err.mean() <= 3.0, f"seed {seed}: mean {err.mean()}"
        check_decisions(trav, want, got, rng, stg_gap_tol=0.5)
