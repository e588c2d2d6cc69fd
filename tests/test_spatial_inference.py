"""Spatially-sharded whole-map inference == unsharded (SURVEY.md §5.7).

The 'long-context' analog of this framework is the 960^2x14 map; scaling it
across chips means sharding the conv HEIGHT dimension over the mesh and
letting GSPMD insert halo exchanges.  This asserts device-layout invariance
on the virtual CPU mesh.
"""

import numpy as np
import pytest

import jax

from peanut_tpu.config import NavConfig
from peanut_tpu.core.mesh import make_mesh
from peanut_tpu.prediction import PredictionModel


@pytest.mark.slow
def test_spatial_sharded_prediction_matches():
    cfg = NavConfig(num_sem_categories=10, prediction_window=128)
    # narrow model: full structure, tiny tensors (same recipe as the
    # multichip dryrun)
    base = 16
    model_cfg = dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNetV1c", depth=50, num_stages=4,
                      out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                      strides=(1, 2, 1, 1), contract_dilation=True,
                      base_channels=base, stem_channels=base,
                      in_channels=14),
        decode_head=dict(type="PSPHead", in_channels=base * 32, in_index=3,
                         channels=base * 8, pool_scales=(1, 2, 3, 6),
                         dropout_ratio=0.1, num_classes=6,
                         align_corners=False),
        test_cfg=dict(mode="whole"),
    )
    pm = PredictionModel(cfg, model_cfg=model_cfg, input_size=128)

    rng = np.random.RandomState(0)
    full_map = rng.rand(14, 128, 128).astype(np.float32)

    plain = pm.get_prediction(full_map)
    mesh = make_mesh({"spatial": len(jax.devices())})
    sharded = pm.get_prediction_sharded(full_map, mesh)
    assert plain.shape == sharded.shape == (6, 128, 128)
    np.testing.assert_allclose(sharded, plain, atol=2e-5)
