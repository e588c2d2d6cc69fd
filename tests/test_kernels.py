"""Kernel parity tests: torch (CPU) is used only as a golden oracle here —
the framework itself never imports torch on the compute path."""

import numpy as np
import pytest

import jax.numpy as jnp

from peanut_tpu.kernels import (
    affine_grid,
    grid_sample,
    pose_warp_grids,
    disk,
    binary_dilation,
    binary_erosion,
    splat_feat_nd,
)
from peanut_tpu.kernels.morphology import (
    np_binary_dilation,
    np_binary_erosion,
    DEFAULT_CROSS,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


# ----------------------------------------------------------------------
# affine_grid / grid_sample vs torch
# ----------------------------------------------------------------------

@pytest.mark.parametrize("align_corners", [False, True])
def test_affine_grid_matches_torch(rng, align_corners):
    theta = rng.randn(3, 2, 3).astype(np.float32)
    size = (3, 2, 15, 21)
    want = F.affine_grid(torch.from_numpy(theta), size,
                         align_corners=align_corners).numpy()
    got = np.asarray(affine_grid(theta, size, align_corners=align_corners))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(rng, align_corners):
    inp = rng.randn(2, 3, 17, 19).astype(np.float32)
    # grids extending past [-1,1] exercise the zero-padding path
    grid = (rng.rand(2, 10, 12, 2).astype(np.float32) * 2.6 - 1.3)
    want = F.grid_sample(torch.from_numpy(inp), torch.from_numpy(grid),
                         mode="bilinear", padding_mode="zeros",
                         align_corners=align_corners).numpy()
    got = np.asarray(grid_sample(inp, grid, align_corners=align_corners))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pose_warp_pipeline_matches_torch(rng):
    """Full reference warp: affine_grid(ac=False) + grid_sample(ac=True) x2
    (reference model.py:40-41 + mapping.py:172-173)."""
    bs, c, m = 1, 5, 48
    agent_view = rng.rand(bs, c, m, m).astype(np.float32)
    st_pose = np.array([[0.21, -0.4, 33.0]], dtype=np.float32)

    rot_grid, trans_grid = pose_warp_grids(st_pose, (bs, c, m, m))
    rotated = grid_sample(agent_view, rot_grid, align_corners=True)
    translated = np.asarray(grid_sample(rotated, trans_grid, align_corners=True))

    # torch oracle
    t = torch.from_numpy(st_pose)
    x, y, th = t[:, 0], t[:, 1], t[:, 2] * np.pi / 180.0
    z = torch.zeros_like(x)
    o = torch.ones_like(x)
    theta1 = torch.stack([torch.stack([th.cos(), -th.sin(), z], 1),
                          torch.stack([th.sin(), th.cos(), z], 1)], 1)
    theta2 = torch.stack([torch.stack([o, z, x], 1),
                          torch.stack([z, o, y], 1)], 1)
    rg = F.affine_grid(theta1, torch.Size((bs, c, m, m)))
    tg = F.affine_grid(theta2, torch.Size((bs, c, m, m)))
    av = torch.from_numpy(agent_view)
    want = F.grid_sample(F.grid_sample(av, rg, align_corners=True), tg,
                         align_corners=True).numpy()
    np.testing.assert_allclose(translated, want, rtol=1e-4, atol=1e-5)


# ----------------------------------------------------------------------
# morphology
# ----------------------------------------------------------------------

def test_disk_footprint():
    d4 = disk(4)
    assert d4.shape == (9, 9)
    assert d4[4, 4] == 1 and d4[0, 0] == 0 and d4[4, 0] == 1
    # row sums of skimage.morphology.disk(4)
    assert list(d4.sum(axis=1)) == [1, 5, 7, 7, 9, 7, 7, 5, 1]


def test_dilation_erosion_roundtrip(rng):
    img = (rng.rand(20, 20) > 0.8).astype(np.float32)
    fp = disk(2)
    dil = np.asarray(binary_dilation(img, fp))
    ero = np.asarray(binary_erosion(dil, fp))
    # closing contains the original
    assert (ero.astype(bool) | ~img.astype(bool)).all()
    # numpy twins agree with jnp versions
    np.testing.assert_array_equal(dil, np_binary_dilation(img, fp))
    np.testing.assert_array_equal(
        np.asarray(binary_erosion(img, fp)), np_binary_erosion(img, fp))


def test_default_cross_is_connectivity1():
    img = np.zeros((5, 5), np.float32)
    img[2, 2] = 1
    dil = np.asarray(binary_dilation(img))
    assert dil.sum() == 5  # cross
    np.testing.assert_array_equal(dil[2], [0, 1, 1, 1, 0])


# ----------------------------------------------------------------------
# splat vs torch scatter_add oracle
# ----------------------------------------------------------------------

def torch_splat(init_grid, feat, coords):
    """Oracle reimplementation of reference splat_feat_nd semantics in torch."""
    import itertools
    init_grid = torch.from_numpy(init_grid.copy())
    feat = torch.from_numpy(feat)
    coords = torch.from_numpy(coords)
    grid_dims = init_grid.shape[2:]
    B, Fc = init_grid.shape[:2]
    n_dims = len(grid_dims)
    grid_flat = init_grid.view(B, Fc, -1)
    pos_dim, wts_dim = [], []
    for d in range(n_dims):
        pos = coords[:, [d], :] * grid_dims[d] / 2 + grid_dims[d] / 2
        pos_d, wts_d = [], []
        for ix in (0, 1):
            pos_ix = torch.floor(pos) + ix
            safe = ((pos_ix > 0) & (pos_ix < grid_dims[d])).type(pos.dtype)
            wts_ix = (1 - torch.abs(pos - pos_ix)) * safe
            pos_d.append(pos_ix * safe)
            wts_d.append(wts_ix)
        pos_dim.append(pos_d)
        wts_dim.append(wts_d)
    for ix_d in itertools.product(*([(0, 1)] * n_dims)):
        wts = torch.ones_like(wts_dim[0][0])
        index = torch.zeros_like(wts_dim[0][0])
        for d in range(n_dims):
            index = index * grid_dims[d] + pos_dim[d][ix_d[d]]
            wts = wts * wts_dim[d][ix_d[d]]
        grid_flat.scatter_add_(2, index.long().expand(-1, Fc, -1), feat * wts)
        grid_flat = torch.round(grid_flat)
    return grid_flat.view(init_grid.shape).numpy()


def test_splat_matches_torch_oracle(rng):
    B, Fc, V, Z, P = 1, 4, 12, 6, 200
    init = np.zeros((B, Fc, V, V, Z), np.float32)
    feat = np.ones((B, Fc, P), np.float32)
    feat[:, 1:] = (rng.rand(B, Fc - 1, P) > 0.5).astype(np.float32)
    coords = (rng.rand(B, 3, P).astype(np.float32) * 2.4 - 1.2)  # some OOB
    want = torch_splat(init, feat, coords)
    got = np.asarray(splat_feat_nd(jnp.asarray(init), jnp.asarray(feat),
                                   jnp.asarray(coords), exact=True))
    np.testing.assert_array_equal(got, want)


def test_splat_fast_path_unrounded_mass(rng):
    """Fast path = single fused scatter, no per-corner rounding: total mass
    equals the sum of in-bounds trilinear weights times features."""
    B, Fc, V, Z, P = 1, 3, 10, 5, 150
    init = np.zeros((B, Fc, V, V, Z), np.float32)
    feat = np.ones((B, Fc, P), np.float32)
    coords = (rng.rand(B, 3, P).astype(np.float32) * 2 - 1)
    fast = np.asarray(splat_feat_nd(init, feat, coords, exact=False))

    # numpy oracle for the unrounded total weight per point
    dims = (V, V, Z)
    total = np.zeros((B, P), np.float64)
    wts_per_dim = []
    for d in range(3):
        pos = coords[:, d, :] * dims[d] / 2 + dims[d] / 2
        w_d = []
        for ix in (0, 1):
            pos_ix = np.floor(pos) + ix
            safe = ((pos_ix > 0) & (pos_ix < dims[d])).astype(np.float64)
            w_d.append((1 - np.abs(pos - pos_ix)) * safe)
        wts_per_dim.append(w_d)
    import itertools
    for ixs in itertools.product(*([(0, 1)] * 3)):
        w = np.ones((B, P))
        for d in range(3):
            w = w * wts_per_dim[d][ixs[d]]
        total += w
    # cell (0,...) accumulates clipped mass too; compare full sums
    np.testing.assert_allclose(fast.sum(), Fc * total.sum(), rtol=1e-4)
