"""Dense (scatter-free) splat vs the exact 3D path."""

import numpy as np
import pytest

import jax.numpy as jnp

from peanut_tpu.kernels.splat import splat_feat_nd, splat_projected_2d


def reference_projections(feat, coords, vr, nz, min_z, max_z):
    """Exact path WITHOUT rounding: 3D unrounded splat + band sums."""
    init = np.zeros((feat.shape[0], feat.shape[1], vr, vr, nz), np.float32)
    voxels = np.asarray(splat_feat_nd(jnp.asarray(init), jnp.asarray(feat),
                                      jnp.asarray(coords), exact=False))
    voxels = np.swapaxes(voxels, 2, 3)
    return voxels[..., min_z:max_z].sum(axis=4), voxels.sum(axis=4)


@pytest.mark.parametrize("seed", [0, 1])
def test_dense_splat_matches_unrounded_3d(seed):
    rng = np.random.RandomState(seed)
    B, C, P, VR, NZ = 2, 5, 700, 24, 16
    feat = np.ones((B, C, P), np.float32)
    feat[:, 1:] = (rng.rand(B, C - 1, P) > 0.5).astype(np.float32)
    coords = (rng.rand(B, 3, P).astype(np.float32) * 2.4 - 1.2)
    # some invalid sentinel points (stair-mask semantics)
    coords[:, :, :20] = 99999.0
    band, total = splat_projected_2d(jnp.asarray(feat), jnp.asarray(coords),
                                     VR, NZ, min_z=3, max_z=9)
    want_band, want_total = reference_projections(feat, coords, VR, NZ, 3, 9)
    np.testing.assert_allclose(np.asarray(band), want_band,
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(total), want_total,
                               rtol=1e-4, atol=1e-3)


def test_mapper_fast_path_close_to_exact(rng):
    from peanut_tpu.config import NavConfig
    from peanut_tpu.mapping import SemanticMapper
    from test_mapping import SMALL, make_inputs

    cfg_exact = NavConfig(**SMALL)
    cfg_fast = cfg_exact.replace(exact_parity=False)
    m_exact = SemanticMapper(cfg_exact)
    m_fast = SemanticMapper(cfg_fast)
    obs, pd, ml, pl = make_inputs(rng, cfg_exact)
    _, fused_e, pose_e = m_exact(obs, pd, ml, pl)
    _, fused_f, pose_f = m_fast(obs, pd, ml, pl)
    np.testing.assert_allclose(np.asarray(pose_e), np.asarray(pose_f),
                               atol=1e-5)
    # maps agree except for per-corner-rounding differences (sub-count)
    diff = np.abs(np.asarray(fused_e) - np.asarray(fused_f))
    assert diff.max() <= 1.0 + 1e-4
    assert (diff > 0.2).mean() < 0.02
