"""Native (C++/OpenMP) data-pipeline kernels vs the python chain."""

import numpy as np
import pytest

from peanut_tpu.prediction import native
from peanut_tpu.prediction.dataset import (
    Pad, RandomCrop, RandomFlip, RandomRotate, Compose, FusedAugment,
    load_map_sample)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def make_sample(rng, h=96, w=96):
    img = rng.rand(h, w, 14).astype(np.float32)
    gt = (rng.rand(h, w, 6) > 0.8).astype(np.float32) * 255.0
    return {"img": img, "gt": gt}


def test_extract_timestep_matches_python(tmp_path):
    rng = np.random.RandomState(0)
    maps = (rng.rand(20, 14, 32, 32) * 255).astype(np.uint8)
    img, gt = native.extract_timestep(maps, 3)
    want_img = maps[3].transpose(1, 2, 0).astype(np.float32) / 255.0
    explored = want_img[:, :, 1] > 0
    want_gt = (maps[-1, 4:10] * (1 - explored)).transpose(1, 2, 0)
    np.testing.assert_allclose(img, want_img, rtol=1e-6)
    np.testing.assert_array_equal(gt, want_gt.astype(np.float32))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fused_augment_matches_python_chain(seed):
    crop = 64
    rng_data = np.random.RandomState(100 + seed)
    s_py = make_sample(rng_data)
    s_nat = {k: v.copy() for k, v in s_py.items()}

    py = Compose([Pad((80, 80)), RandomCrop((crop, crop),
                                            rng=np.random.RandomState(seed)),
                  RandomFlip(0.5, rng=np.random.RandomState(seed + 50)),
                  RandomRotate(1.0, 180.0,
                               rng=np.random.RandomState(seed + 99))])
    # replicate the same draws for the fused path
    rng_crop = np.random.RandomState(seed)
    rng_flip = np.random.RandomState(seed + 50)
    rng_rot = np.random.RandomState(seed + 99)
    h, w = s_nat["img"].shape[:2]
    ph = pw = max(80, h)
    cy = rng_crop.randint(0, ph - crop + 1)
    cx = rng_crop.randint(0, pw - crop + 1)
    flip = rng_flip.rand() < 0.5
    assert rng_rot.rand() < 1.0
    angle = rng_rot.uniform(-180, 180)

    out_py = py(s_py)
    img_nat, gt_nat = native.augment_sample(
        s_nat["img"], s_nat["gt"], crop, cy, cx, flip, angle)

    # interior agreement (cv2 and the kernel may disagree on exact border
    # tap handling at the crop boundary)
    interior = slice(2, crop - 2)
    diff = np.abs(img_nat[interior, interior] -
                  out_py["img"][interior, interior])
    assert np.quantile(diff, 0.999) < 6e-2, float(diff.max())  # cv2 uses 5-bit fixed-point interp weights
    gt_mismatch = (gt_nat[interior, interior] !=
                   out_py["gt"][interior, interior]).mean()
    assert gt_mismatch < 0.02  # nearest-tap rounding ties only


def test_fused_augment_in_pipeline():
    rng = np.random.RandomState(0)
    aug = FusedAugment(64, rng=np.random.RandomState(1))
    s = aug(make_sample(rng))
    assert s["img"].shape == (64, 64, 14)
    assert s["gt"].shape == (64, 64, 6)
    assert np.isfinite(s["img"]).all()
