"""Pallas sweep kernel vs the XLA sweep (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from peanut_tpu.kernels.fmm import _v_sweep, BIG
from peanut_tpu.kernels.fmm_pallas import v_sweep_pallas


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("shape", [(2, 48, 40), (3, 50, 200), (1, 33, 33)])
@pytest.mark.parametrize("scan_chunk", [1, 2, 5])
def test_pallas_sweep_matches_xla(rng, reverse, shape, scan_chunk):
    b, h, w = shape
    d = np.where(rng.rand(b, h, w) > 0.95, 0.0, BIG).astype(np.float32)
    wall = rng.rand(b, h, w) > 0.8
    d = np.where(wall, BIG, d).astype(np.float32)
    want = np.asarray(_v_sweep(jnp.asarray(d), jnp.asarray(wall), reverse,
                               block=16, inner=10, scan_chunk=scan_chunk))
    got = np.asarray(v_sweep_pallas(jnp.asarray(d), jnp.asarray(wall),
                                    reverse, block=16, inner=10,
                                    scan_chunk=scan_chunk,
                                    interpret=True))
    np.testing.assert_allclose(np.minimum(got, 1e9), np.minimum(want, 1e9),
                               atol=1e-4)


def test_pallas_sweep_carry_isolated_between_batch_tiles(rng):
    """Batch tiling must reset the carry per tile (grid order check)."""
    b, h, w = 4, 32, 200  # w large enough to force bt < b
    d = np.full((b, h, w), BIG, np.float32)
    d[0, 0, 0] = 0.0      # source only in env 0
    wall = np.zeros((b, h, w), bool)
    got = np.asarray(v_sweep_pallas(jnp.asarray(d), jnp.asarray(wall), False,
                                    block=16, inner=10, interpret=True))
    # other envs must stay BIG (no leakage across batch tiles)
    assert (got[1:] >= 0.5 * BIG).all()
    assert got[0, 5, 0] < 10.0


# ---- second-order sweep kernel ----

from peanut_tpu.kernels.fmm import _v_sweep2  # noqa: E402
from peanut_tpu.kernels.fmm_pallas import v_sweep2_pallas  # noqa: E402


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("shape", [(2, 48, 40), (3, 50, 200), (1, 33, 33)])
def test_pallas_sweep2_matches_xla(rng, reverse, shape):
    b, h, w = shape
    src = rng.rand(b, h, w) > 0.97
    wall = (rng.rand(b, h, w) > 0.8) & ~src
    d = np.where(src, 0.0, BIG).astype(np.float32)
    args = (jnp.asarray(d), jnp.asarray(wall), jnp.asarray(src), reverse)
    want = np.asarray(_v_sweep2(*args, block=16, inner=10))
    got = np.asarray(v_sweep2_pallas(*args, block=16, inner=10,
                                     interpret=True))
    np.testing.assert_allclose(np.minimum(got, 1e9), np.minimum(want, 1e9),
                               atol=1e-4)


def test_pallas_sweep2_carry_isolated_between_batch_tiles(rng):
    b, h, w = 4, 32, 200
    src = np.zeros((b, h, w), bool)
    src[0, 0, 0] = True
    d = np.where(src, 0.0, BIG).astype(np.float32)
    wall = np.zeros((b, h, w), bool)
    got = np.asarray(v_sweep2_pallas(jnp.asarray(d), jnp.asarray(wall),
                                     jnp.asarray(src), False,
                                     block=16, inner=10, interpret=True))
    assert (got[1:] >= 0.5 * BIG).all()
    assert got[0, 5, 0] < 10.0


# ---- whole-solve fused kernel (fmm_fused.py) ----

from peanut_tpu.kernels.fmm_fused import fused_eikonal  # noqa: E402


def test_fused_eikonal_matches_composed(rng):
    """The fused whole-solve kernel must match the composed first-order
    solver on small grids (interpret mode; the real-TPU twin of this
    check is scripts/validate_fmm_fused.py, which also pins planner
    decisions on full serving geometry)."""
    from peanut_tpu.kernels.fmm import eikonal_distance

    b, h, w = 2, 48, 40
    trav = rng.rand(b, h, w) > 0.2
    src = np.zeros((b, h, w), bool)
    src[:, 10, 8] = True
    ref = np.asarray(eikonal_distance(jnp.asarray(trav), jnp.asarray(src),
                                      n_iters=3, order=1))
    got = np.asarray(fused_eikonal(jnp.asarray(trav), jnp.asarray(src),
                                   rounds=4, bt=1, interpret=True))
    assert (np.isfinite(ref) == np.isfinite(got)).all()
    m = np.isfinite(ref)
    assert np.abs(ref[m] - got[m]).max() <= 1e-4
