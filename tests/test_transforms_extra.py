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


# ---------------------------------------------------------------------------
# Round-3 transform-zoo additions
# ---------------------------------------------------------------------------

def _zsample(h=30, w=50, c=3, seed=0):
    rng = np.random.RandomState(seed)
    return {"img": (rng.rand(h, w, c) * 255).astype(np.float32),
            "gt": rng.randint(0, 4, (h, w)).astype(np.uint8)}


def test_resize_to_multiple():
    from peanut_tpu.prediction.transforms_extra import ResizeToMultiple
    s = ResizeToMultiple(32)(_zsample())
    assert s["img"].shape == (32, 64, 3) and s["gt"].shape == (32, 64)


def test_rerange():
    from peanut_tpu.prediction.transforms_extra import Rerange
    s = Rerange(10, 20)(_zsample())
    assert abs(s["img"].min() - 10) < 1e-5 and abs(s["img"].max() - 20) < 1e-5


def test_clahe_and_gamma():
    pytest.importorskip("cv2")
    from peanut_tpu.prediction.transforms_extra import CLAHE, AdjustGamma
    s = CLAHE()(_zsample())
    assert s["img"].shape == (30, 50, 3)
    assert s["img"].min() >= 0 and s["img"].max() <= 255

    base = _zsample()
    ident = AdjustGamma(1.0)(dict(base))
    # gamma-1 LUT is the identity on uint8 values
    np.testing.assert_array_equal(ident["img"],
                                  base["img"].astype(np.uint8))
    bright = AdjustGamma(2.0)(dict(_zsample()))
    assert bright["img"].mean() >= ident["img"].mean()


def test_rgb2gray():
    from peanut_tpu.prediction.transforms_extra import RGB2Gray
    base = _zsample()
    s = RGB2Gray()(dict(base))
    assert s["img"].shape == (30, 50, 3)
    w = np.array([0.299, 0.587, 0.114], np.float32)
    expect = (base["img"] * w).sum(-1)
    np.testing.assert_allclose(s["img"][..., 0], expect, rtol=1e-5)
    np.testing.assert_array_equal(s["img"][..., 0], s["img"][..., 2])
    assert RGB2Gray(out_channels=1)(dict(base))["img"].shape == (30, 50, 1)


def test_seg_rescale():
    pytest.importorskip("cv2")
    from peanut_tpu.prediction.transforms_extra import SegRescale
    s = SegRescale(0.5)(_zsample(h=32, w=64))
    assert s["gt"].shape == (16, 32) and s["img"].shape == (32, 64, 3)


def test_random_cutout():
    from peanut_tpu.prediction.transforms_extra import RandomCutOut
    t = RandomCutOut(prob=1.0, n_holes=2, cutout_shape=(8, 8),
                     seg_fill_in=255, rng=np.random.RandomState(0))
    base = _zsample()
    base["img"] += 1.0  # ensure no natural zeros
    s = t(base)
    assert (s["img"] == 0).all(axis=-1).any(), "no hole cut"
    assert (s["gt"] == 255).any(), "seg fill not applied"
    # holes line up between img and gt
    hole = (s["img"] == 0).all(axis=-1)
    assert (s["gt"][hole] == 255).all()


class _TinyDS:
    CLASSES = ("a", "b")

    def __init__(self):
        self.samples = [_zsample(seed=i, h=20, w=20) for i in range(4)]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return {k: v.copy() for k, v in self.samples[i].items()}


def test_random_mosaic_via_multi_image_mix():
    pytest.importorskip("cv2")
    from peanut_tpu.prediction.transforms_extra import RandomMosaic
    from peanut_tpu.prediction.wrappers import MultiImageMixDataset

    t = RandomMosaic(prob=1.0, img_scale=(16, 16), pad_val=7,
                     seg_pad_val=255, rng=np.random.RandomState(3))
    ds = MultiImageMixDataset(_TinyDS(), [t])
    s = ds[0]
    assert s["img"].shape == (32, 32, 3) and s["gt"].shape == (32, 32)
    assert "mix_results" not in s
    # all four quadrant sources appear: canvas isn't all padding
    assert (s["img"] != 7).any()
    assert s["gt"].max() == 255  # padding ring present
    assert (s["gt"] != 255).any()

    # skip list disables the stage
    ds2 = MultiImageMixDataset(_TinyDS(), [t], skip_types=["RandomMosaic"])
    s2 = ds2[1]
    assert s2["img"].shape == (20, 20, 3)
