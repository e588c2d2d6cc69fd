"""Eikonal solver tests: convergence to the Godunov fixed point (the
first-order FMM solution skfmm approximates) and planner-facing semantics."""

import numpy as np
import pytest

from peanut_tpu.kernels import eikonal_distance, masked_fill_unreachable
from peanut_tpu.kernels.fmm import _jacobi_pass, BIG

import jax.numpy as jnp


def brute_force_fixed_point(trav, src, max_iter=2000):
    """Oracle: iterate the Godunov update to convergence (slow, small grids)."""
    wall = (~(trav > 0)) & (~(src > 0))
    d = np.where(src > 0, 0.0, BIG).astype(np.float32)
    d = jnp.asarray(d)
    w = jnp.asarray(wall)
    for _ in range(max_iter):
        nd = _jacobi_pass(d, w)
        if float(jnp.max(jnp.abs(nd - d))) < 1e-6:
            d = nd
            break
        d = nd
    return np.where(np.asarray(d) >= 0.5 * BIG, np.inf, np.asarray(d))


def test_empty_grid_point_source():
    n = 33
    trav = np.ones((n, n), np.float32)
    src = np.zeros((n, n), np.float32)
    src[0, 0] = 1
    d = np.asarray(eikonal_distance(trav, src, n_iters=3, order=1))
    want = brute_force_fixed_point(trav, src)
    np.testing.assert_allclose(d, want, rtol=1e-4, atol=1e-3)
    # axis distances are exact integers
    assert d[0, 10] == pytest.approx(10.0, abs=1e-3)
    assert d[20, 0] == pytest.approx(20.0, abs=1e-3)
    # diagonal between Euclidean lower bound and Manhattan upper bound
    assert np.sqrt(2) * 10 <= d[10, 10] <= 20


def test_wall_blocks_and_detour():
    n = 21
    trav = np.ones((n, n), np.float32)
    trav[10, :20] = 0  # wall with a gap at the right edge
    src = np.zeros((n, n), np.float32)
    src[0, 0] = 1
    d = np.asarray(eikonal_distance(trav, src, n_iters=4, order=1))
    want = brute_force_fixed_point(trav, src)
    np.testing.assert_allclose(d, want, rtol=1e-4, atol=1e-3)
    assert np.isinf(d[10, 0])          # wall cell
    assert d[20, 0] > 30               # must detour around the wall


def test_unreachable_region_is_inf():
    n = 15
    trav = np.ones((n, n), np.float32)
    trav[:, 7] = 0  # full vertical wall
    src = np.zeros((n, n), np.float32)
    src[0, 0] = 1
    d = np.asarray(eikonal_distance(trav, src, n_iters=3, order=1))
    assert np.isinf(d[:, 8:]).all()
    filled = np.asarray(masked_fill_unreachable(d))
    mx = d[np.isfinite(d)].max()
    assert (filled[:, 8:] == mx + 1).all()


def test_source_on_wall_is_unmasked():
    # fmm_planner.py:70-71: assigning 0 to a masked cell unmasks it
    n = 9
    trav = np.ones((n, n), np.float32)
    trav[4, 4] = 0
    src = np.zeros((n, n), np.float32)
    src[4, 4] = 1
    d = np.asarray(eikonal_distance(trav, src, n_iters=2, order=1))
    assert d[4, 4] == 0.0
    assert d[4, 5] == pytest.approx(1.0, abs=1e-3)


def test_batched_solve():
    n = 17
    trav = np.ones((2, n, n), np.float32)
    src = np.zeros((2, n, n), np.float32)
    src[0, 0, 0] = 1
    src[1, 8, 8] = 1
    d = np.asarray(eikonal_distance(trav, src, n_iters=3, order=1))
    d0 = np.asarray(eikonal_distance(trav[0], src[0], n_iters=3, order=1))
    d1 = np.asarray(eikonal_distance(trav[1], src[1], n_iters=3, order=1))
    np.testing.assert_allclose(d[0], d0, atol=1e-5)
    np.testing.assert_allclose(d[1], d1, atol=1e-5)


def test_maze_converges():
    # zigzag corridor: worst case for sweep count
    rng = np.random.RandomState(3)
    n = 31
    trav = np.ones((n, n), np.float32)
    for i, r in enumerate(range(3, n - 3, 4)):
        if i % 2 == 0:
            trav[r, :n - 4] = 0
        else:
            trav[r, 4:] = 0
    src = np.zeros((n, n), np.float32)
    src[0, 0] = 1
    d = np.asarray(eikonal_distance(trav, src, n_iters=8, order=1))
    want = brute_force_fixed_point(trav, src, max_iter=5000)
    finite = np.isfinite(want)
    np.testing.assert_allclose(d[finite], want[finite], rtol=1e-3, atol=1e-2)


# ----------------------------------------------------------------------
# Second-order scheme (skfmm's default order; VERDICT round-1 item 5)
# ----------------------------------------------------------------------

def test_order2_point_source_accuracy():
    """Analytic cross-check: point source in the open — order 2 must be
    within 0.5 cells of the Euclidean field everywhere (skfmm territory),
    where order 1 overestimates diagonals by >1 cell."""
    n = 101
    trav = np.ones((n, n), np.float32)
    src = np.zeros((n, n), np.float32)
    src[n // 2, n // 2] = 1
    yy, xx = np.mgrid[0:n, 0:n]
    true = np.sqrt((yy - n // 2) ** 2.0 + (xx - n // 2) ** 2.0)

    d1 = np.asarray(eikonal_distance(trav, src, order=1))
    d2 = np.asarray(eikonal_distance(trav, src, order=2))
    err1 = np.abs(d1 - true).max()
    err2 = np.abs(d2 - true).max()
    assert err2 <= 0.5, f"order-2 max error {err2:.3f} cells"
    assert err2 < 0.5 * err1  # materially better than first order


@pytest.mark.slow
def test_order2_below_first_order():
    """First-order Godunov only overestimates; the refinement can only
    bring values down (and never below the Euclidean lower bound)."""
    rng = np.random.RandomState(7)
    n = 65
    trav = (rng.rand(n, n) > 0.25).astype(np.float32)
    src = np.zeros((n, n), np.float32)
    src[2, 2] = 1
    trav[2, 2] = 1
    d1 = np.asarray(eikonal_distance(trav, src, n_iters=4, order=1))
    d2 = np.asarray(eikonal_distance(trav, src, n_iters=4, order=2))
    finite = np.isfinite(d1)
    assert (np.isfinite(d2) == finite).all()  # same reachable set
    assert (d2[finite] <= d1[finite] + 1e-4).all()
    yy, xx = np.mgrid[0:n, 0:n]
    lower = np.sqrt((yy - 2) ** 2.0 + (xx - 2) ** 2.0)
    assert (d2[finite] >= lower[finite] - 1e-3).all()


@pytest.mark.slow
def test_order2_slit_diffraction():
    """Wall with a 1-cell slit: beyond the slit the field is a point
    source re-expansion (geodesic = src->slit + slit->cell)."""
    n = 101
    trav = np.ones((n, n), np.float32)
    trav[50, :] = 0
    trav[50, 50] = 1
    src = np.zeros((n, n), np.float32)
    src[10, 50] = 1
    d = np.asarray(eikonal_distance(trav, src, n_iters=3, order=2))
    yy, xx = np.mgrid[0:n, 0:n]
    true_below = 40.0 + np.sqrt((yy - 50) ** 2.0 + (xx - 50) ** 2.0)
    sel = yy >= 65
    err = np.abs(d[sel] - true_below[sel])
    assert err.max() <= 1.0  # slit cell itself is a 1st-order singularity
    assert err.mean() <= 0.5


def test_order2_semantics_match_first_order():
    """Wall/unreachable/source-on-wall semantics are order-independent."""
    n = 15
    trav = np.ones((n, n), np.float32)
    trav[:, 7] = 0
    trav[4, 4] = 0
    src = np.zeros((n, n), np.float32)
    src[4, 4] = 1  # source on a wall cell is unmasked (fmm_planner.py:70)
    d = np.asarray(eikonal_distance(trav, src, order=2))
    assert d[4, 4] == 0.0
    assert d[4, 5] == pytest.approx(1.0, abs=1e-3)
    assert np.isinf(d[:, 8:]).all()


def test_order2_batched_matches_single():
    n = 33
    trav = np.ones((2, n, n), np.float32)
    src = np.zeros((2, n, n), np.float32)
    src[0, 3, 3] = 1
    src[1, 16, 16] = 1
    d = np.asarray(eikonal_distance(trav, src, order=2))
    for b in range(2):
        db = np.asarray(eikonal_distance(trav[b], src[b], order=2))
        np.testing.assert_allclose(d[b], db, atol=1e-5)


def test_set_goal_auto_improve_snaps_to_traversible():
    """set_goal(auto_improve=True) on a non-traversible goal must solve
    from the nearest traversible cell instead (reference
    fmm_planner.py:56-60,118-133; dead on PEANUT's call path but part of
    the planner API — VERDICT r4 item 10)."""
    from peanut_tpu.planning.fmm_planner import FMMPlanner

    trav = np.ones((40, 40), np.float32)
    trav[10:30, 18:22] = 0.0          # wall band; goal dropped inside it
    p = FMMPlanner(trav.copy())
    p.set_goal([20, 20], auto_improve=True)
    # the distance field must have a zero ON a traversible cell adjacent
    # to the wall band (nearest by Euclidean distance), not inside it
    zr, zc = np.unravel_index(np.argmin(p.fmm_dist), p.fmm_dist.shape)
    assert trav[zr, zc] == 1.0
    assert abs(zr - 20) <= 1 and abs(zc - 20) <= 4
    assert p.fmm_dist[zr, zc] < 1e-6

    # nearest-goal helper alone: picks the closest traversible cell
    g = p._find_nearest_goal([20, 20])
    assert trav[g[0], g[1]] == 1.0

    # auto_improve=False keeps the literal cell as the source
    q = FMMPlanner(trav.copy())
    q.set_goal([20, 20], auto_improve=False)
    assert q.fmm_dist[20, 20] < 1e-6
