"""roi_window_pool (Pallas DMA pooling) == the gather/einsum formulation."""

import numpy as np
import jax.numpy as jnp

from peanut_tpu.kernels.roi_window import roi_window_pool


def _reference(flat, ay, ax, row0, col0, win_y, win_x):
    n, p, _ = ay.shape
    c = flat.shape[-1]
    out = np.zeros((n, p, p, c), np.float32)
    for i in range(n):
        w = np.asarray(flat[row0[i]:row0[i] + win_y,
                            col0[i]:col0[i] + win_x], np.float32)
        t = np.einsum("pr,rwc->pwc", ay[i], w)
        out[i] = np.einsum("qw,pwc->pqc", ax[i], t)
    return out


def test_roi_window_pool_matches_einsum():
    rng = np.random.default_rng(0)
    win_y, win_x, p, c, n = 16, 24, 7, 128, 6
    hp, wp = 80, 64
    flat = rng.standard_normal((hp, wp, c)).astype(np.float32)
    ay = rng.standard_normal((n, p, win_y)).astype(np.float32)
    ax = rng.standard_normal((n, p, win_x)).astype(np.float32)
    row0 = rng.integers(0, hp - win_y, n).astype(np.int32)
    col0 = (rng.integers(0, (wp - win_x) // 8, n) * 8).astype(np.int32)

    got = np.asarray(roi_window_pool(jnp.asarray(flat), jnp.asarray(ay),
                                     jnp.asarray(ax), jnp.asarray(row0),
                                     jnp.asarray(col0), win_y=win_y,
                                     win_x=win_x, interpret=True))
    want = _reference(flat, ay, ax, row0, col0, win_y, win_x)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_roi_window_pool_multilane(monkeypatch):
    """n divisible by 4 -> the kernel packs 4 ROIs per grid step."""
    monkeypatch.setenv("PEANUT_ROI_LANES", "auto")
    rng = np.random.default_rng(2)
    win_y, win_x, p, c, n = 16, 16, 7, 128, 8
    hp, wp = 64, 48
    flat = rng.standard_normal((hp, wp, c)).astype(np.float32)
    ay = rng.standard_normal((n, p, win_y)).astype(np.float32)
    ax = rng.standard_normal((n, p, win_x)).astype(np.float32)
    row0 = rng.integers(0, hp - win_y, n).astype(np.int32)
    col0 = (rng.integers(0, (wp - win_x) // 8, n) * 8).astype(np.int32)

    from peanut_tpu.kernels import roi_window
    assert roi_window._pick_lanes(n, win_y, win_x, c, 4) >= 4
    got = np.asarray(roi_window_pool(jnp.asarray(flat), jnp.asarray(ay),
                                     jnp.asarray(ax), jnp.asarray(row0),
                                     jnp.asarray(col0), win_y=win_y,
                                     win_x=win_x, interpret=True))
    want = _reference(flat, ay, ax, row0, col0, win_y, win_x)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_roi_window_pool_bf16_inputs():
    rng = np.random.default_rng(1)
    win, p, c, n = 8, 4, 128, 3
    flat = rng.standard_normal((40, 32, c)).astype(np.float32)
    ay = rng.standard_normal((n, p, win)).astype(np.float32)
    ax = rng.standard_normal((n, p, win)).astype(np.float32)
    row0 = np.array([0, 5, 32], np.int32)
    col0 = np.array([0, 8, 24], np.int32)
    got = np.asarray(roi_window_pool(
        jnp.asarray(flat, jnp.bfloat16), jnp.asarray(ay), jnp.asarray(ax),
        jnp.asarray(row0), jnp.asarray(col0), win_y=win, win_x=win,
        interpret=True))
    # the kernel casts ay to the window dtype (bf16) before the matmul
    ay_b = np.asarray(jnp.asarray(ay, jnp.bfloat16), np.float32)
    want = _reference(flat.astype(jnp.bfloat16).astype(np.float32),
                      ay_b, ax, row0, col0, win, win)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
