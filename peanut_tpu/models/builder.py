"""Model construction from dict configs + parameter initialization."""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..registry import SEGMENTORS


def build_segmentor(cfg: Dict[str, Any]):
    """Build a segmentor module from an mmseg-style dict config.

    Accepts the reference's config shape (nav/pred_model_cfg.py:2-42) —
    unknown torch-specific keys (norm_cfg, pretrained) are tolerated by the
    modules themselves.
    """
    cfg = dict(cfg)
    typ = cfg.pop("type")
    return SEGMENTORS.get(typ)(**cfg)


def init_segmentor_params(model, input_shape: Tuple[int, ...],
                          seed: int = 0, train: bool = False):
    """Initialize parameter/batch-stats collections for a segmentor.

    Returns the full variables dict {'params': ..., 'batch_stats': ...}.
    """
    rng = jax.random.PRNGKey(seed)
    dummy = jnp.zeros(input_shape, jnp.float32)
    # with_aux ensures auxiliary-head params are created at init time; jit
    # compiles the whole init as one program (much faster than eager per-op).
    try:
        fn = jax.jit(lambda r, d: model.init({"params": r}, d, train=train,
                                             with_aux=True))
        return fn(rng, dummy)
    except TypeError:
        fn = jax.jit(lambda r, d: model.init({"params": r}, d, train=train))
        return fn(rng, dummy)


def peanut_prediction_config(in_channels: int = 14, num_classes: int = 6,
                             remat: bool = False) -> Dict[str, Any]:
    """The PEANUT target-prediction model config (nav/pred_model_cfg.py:2-42).

    ``remat=True`` rematerializes backbone blocks in backward — required to
    train the reference recipe (batch 8, crop 960) within one chip's HBM."""
    return dict(
        type="EncoderDecoder",
        backbone=dict(
            type="ResNetV1c",
            depth=50,
            num_stages=4,
            out_indices=(0, 1, 2, 3),
            dilations=(1, 1, 2, 4),
            strides=(1, 2, 1, 1),
            contract_dilation=True,
            in_channels=in_channels,
            remat=remat,
        ),
        decode_head=dict(
            type="PSPHead",
            in_channels=2048,
            in_index=3,
            channels=512,
            pool_scales=(1, 2, 3, 6),
            dropout_ratio=0.1,
            num_classes=num_classes,
            align_corners=False,
        ),
        auxiliary_head=dict(
            type="FCNHead",
            in_channels=1024,
            in_index=2,
            channels=256,
            num_convs=1,
            concat_input=False,
            dropout_ratio=0.1,
            num_classes=num_classes,
            align_corners=False,
        ),
        test_cfg=dict(mode="whole"),
    )
