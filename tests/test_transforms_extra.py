"""Tests for Resize/Normalize/PhotoMetricDistortion and TTA (the reference's
test_transform.py / test_tta.py patterns)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from peanut_tpu.prediction.transforms_extra import (
    Resize, Normalize, PhotoMetricDistortion, MultiScaleFlipAug,
    aug_inference)


def _sample(h=32, w=48):
    rng = np.random.RandomState(0)
    return {"img": (rng.rand(h, w, 3) * 255).astype(np.float32),
            "gt": rng.randint(0, 4, (h, w)).astype(np.uint8)}


def test_resize_keep_ratio():
    s = Resize(img_scale=(16, 16), keep_ratio=True)(_sample())
    # keep_ratio: scale = min(16/32, 16/48) = 1/3 -> (11, 16)
    assert s["img"].shape == (11, 16, 3)
    assert s["gt"].shape == (11, 16)
    assert set(np.unique(s["gt"])) <= {0, 1, 2, 3}  # nearest keeps labels


def test_resize_ratio_range_deterministic():
    rng = np.random.RandomState(0)
    s = Resize(img_scale=(32, 48), ratio_range=(2.0, 2.0), rng=rng)(_sample())
    assert s["img"].shape == (64, 96, 3)


def test_normalize():
    s = _sample()
    raw = s["img"].copy()
    out = Normalize(mean=(1.0, 2.0, 3.0), std=(2.0, 2.0, 2.0),
                    to_rgb=False)(s)
    np.testing.assert_allclose(
        out["img"], (raw - np.array([1, 2, 3])) / 2.0, rtol=1e-6)


def test_photometric_distortion_bounds():
    s = PhotoMetricDistortion(rng=np.random.RandomState(3))(_sample())
    assert s["img"].shape == (32, 48, 3)
    assert s["img"].min() >= 0 and s["img"].max() <= 255
    assert s["gt"].shape == (32, 48)  # untouched


def test_multi_scale_flip_aug():
    variants = MultiScaleFlipAug(img_ratios=(0.5, 1.0), flip=True)(_sample())
    assert len(variants) == 4
    assert variants[0]["img"].shape == (16, 24, 3)
    assert variants[1]["flip"] and np.allclose(
        variants[1]["img"], variants[0]["img"][:, ::-1])


def test_aug_inference_matches_single_on_symmetric_model():
    """With scale (1.0,) and no flip, TTA must equal plain inference; with
    flip, averaging two logit maps of a conv model stays finite/shaped."""
    from peanut_tpu.models import build_segmentor, init_segmentor_params

    cfg = dict(
        type="EncoderDecoder",
        backbone=dict(type="UNet", base_channels=8, num_stages=3),
        decode_head=dict(type="FCNHead", in_channels=8, in_index=0,
                         channels=8, num_convs=1, concat_input=False,
                         num_classes=3, dropout_ratio=0.0,
                         align_corners=False),
        test_cfg=dict(mode="whole"),
    )
    model = build_segmentor(cfg)
    variables = init_segmentor_params(model, (1, 32, 32, 3))
    x = jnp.asarray(np.random.RandomState(1)
                    .rand(1, 32, 32, 3).astype(np.float32))

    plain = model.apply(variables, x, method=model.inference)
    tta1 = aug_inference(model, variables, x, scales=(1.0,), flip=False)
    np.testing.assert_allclose(np.asarray(tta1), np.asarray(plain),
                               rtol=1e-5, atol=1e-6)

    tta = aug_inference(model, variables, x, scales=(0.5, 1.0), flip=True)
    assert tta.shape == plain.shape
    assert np.isfinite(np.asarray(tta)).all()
