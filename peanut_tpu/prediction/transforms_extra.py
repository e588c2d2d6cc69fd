"""Remaining data-pipeline transforms + test-time augmentation.

Covers the reference pipeline ops on PEANUT's "YES" list not already in
dataset.py (SURVEY.md §2.2: transforms.py Resize:70, Normalize:451,
PhotoMetricDistortion:861; test_time_aug.py MultiScaleFlipAug:11).  All run
host-side on {"img", "gt"} numpy samples, feeding the jitted train step —
the TPU analog of torch DataLoader workers.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


class Resize:
    """mmcv Resize: img_scale (h, w) or ratio_range, keep_ratio rescale.
    Bilinear for img, nearest for gt."""

    def __init__(self, img_scale: Optional[Tuple[int, int]] = None,
                 ratio_range: Optional[Tuple[float, float]] = None,
                 keep_ratio: bool = True, rng=None):
        self.img_scale = img_scale
        self.ratio_range = ratio_range
        self.keep_ratio = keep_ratio
        self.rng = rng or np.random

    def _target(self, h, w):
        if self.ratio_range is not None:
            r = self.rng.uniform(*self.ratio_range)
            base = self.img_scale or (h, w)
            th, tw = base[0] * r, base[1] * r
        else:
            th, tw = self.img_scale
        if self.keep_ratio:
            scale = min(th / h, tw / w)
            return max(int(h * scale + 0.5), 1), max(int(w * scale + 0.5), 1)
        return int(th), int(tw)

    def __call__(self, s):
        import cv2
        h, w = s["img"].shape[:2]
        th, tw = self._target(h, w)
        if (th, tw) != (h, w):
            s["img"] = cv2.resize(s["img"], (tw, th),
                                  interpolation=cv2.INTER_LINEAR
                                  ).reshape(th, tw, -1)
            if s.get("gt") is not None:
                gt = s["gt"]
                squeeze = gt.ndim == 2
                s["gt"] = cv2.resize(gt, (tw, th),
                                     interpolation=cv2.INTER_NEAREST)
                if not squeeze:
                    s["gt"] = s["gt"].reshape(th, tw, -1)
        return s


class Normalize:
    """mmcv Normalize: (img - mean) / std, optional BGR->RGB first."""

    def __init__(self, mean: Sequence[float], std: Sequence[float],
                 to_rgb: bool = True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = to_rgb

    def __call__(self, s):
        img = s["img"].astype(np.float32)
        if self.to_rgb and img.shape[-1] == 3:
            img = img[..., ::-1]
        s["img"] = (img - self.mean) / self.std
        return s


class PhotoMetricDistortion:
    """mmcv PhotoMetricDistortion: random brightness/contrast/saturation/hue
    jitter in the same order + coin-flips as transforms.py:861."""

    def __init__(self, brightness_delta: float = 32,
                 contrast_range: Tuple[float, float] = (0.5, 1.5),
                 saturation_range: Tuple[float, float] = (0.5, 1.5),
                 hue_delta: float = 18, rng=None):
        self.brightness_delta = brightness_delta
        self.contrast_range = contrast_range
        self.saturation_range = saturation_range
        self.hue_delta = hue_delta
        self.rng = rng or np.random

    def _contrast(self, img):
        if self.rng.randint(2):
            return np.clip(img * self.rng.uniform(*self.contrast_range),
                           0, 255)
        return img

    def __call__(self, s):
        import cv2
        img = s["img"].astype(np.float32)
        if self.rng.randint(2):
            img = np.clip(img + self.rng.uniform(-self.brightness_delta,
                                                 self.brightness_delta),
                          0, 255)
        contrast_last = self.rng.randint(2)
        if not contrast_last:
            img = self._contrast(img)
        if img.shape[-1] == 3:
            hsv = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2HSV
                               ).astype(np.float32)
            if self.rng.randint(2):
                hsv[..., 1] = np.clip(
                    hsv[..., 1] * self.rng.uniform(*self.saturation_range),
                    0, 255)
            if self.rng.randint(2):
                hsv[..., 0] = (hsv[..., 0] + self.rng.uniform(
                    -self.hue_delta, self.hue_delta)) % 180
            img = cv2.cvtColor(hsv.astype(np.uint8),
                               cv2.COLOR_HSV2RGB).astype(np.float32)
        if contrast_last:
            img = self._contrast(img)
        s["img"] = img
        return s


def aug_inference(model, variables, img, scales: Sequence[float] = (1.0,),
                  flip: bool = True):
    """Test-time augmentation: run inference at each scale (+h-flip), resize
    logits back, and AVERAGE LOGITS — the reference's modified aug_test
    (encoder_decoder.py:273-290) which PEANUT changed from prob-averaging to
    logit-averaging for the external sigmoid.

    img: (B, H, W, C) jnp array.  Returns averaged logits (B, H, W, K).
    """
    import jax.numpy as jnp
    from ..models.ops import resize_bilinear

    b, h, w, _ = img.shape
    acc = None
    n = 0
    for s in scales:
        th, tw = max(int(h * s + 0.5), 1), max(int(w * s + 0.5), 1)
        x = resize_bilinear(img, (th, tw)) if (th, tw) != (h, w) else img
        variants = [x] + ([x[:, :, ::-1]] if flip else [])
        for i, v in enumerate(variants):
            logits = model.apply(variables, v, method=model.inference)
            if i == 1:
                logits = logits[:, :, ::-1]
            logits = resize_bilinear(logits, (h, w)) \
                if logits.shape[1:3] != (h, w) else logits
            acc = logits if acc is None else acc + logits
            n += 1
    return acc / n


class MultiScaleFlipAug:
    """Test pipeline wrapper (test_time_aug.py): expands one sample into the
    scale x flip variants the reference's aug_test consumes."""

    def __init__(self, img_ratios: Sequence[float] = (1.0,),
                 flip: bool = False):
        self.img_ratios = tuple(img_ratios)
        self.flip = flip

    def __call__(self, s):
        import cv2
        img = s["img"]
        h, w = img.shape[:2]
        out = []
        for r in self.img_ratios:
            th, tw = max(int(h * r + 0.5), 1), max(int(w * r + 0.5), 1)
            x = (cv2.resize(img, (tw, th), interpolation=cv2.INTER_LINEAR)
                 .reshape(th, tw, -1) if (th, tw) != (h, w) else img)
            out.append({"img": x, "flip": False, "scale": r})
            if self.flip:
                out.append({"img": x[:, ::-1].copy(), "flip": True,
                            "scale": r})
        return out
