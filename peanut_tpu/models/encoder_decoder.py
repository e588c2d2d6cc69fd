"""EncoderDecoder segmentor (flax.linen) with whole/slide inference.

Mirrors the reference's mmseg EncoderDecoder
(/root/reference/prediction/mmseg/models/segmentors/encoder_decoder.py:14-290)
including PEANUT's in-tree modification: ``inference`` returns **raw logits**
resized to the input resolution instead of softmax+argmax
(encoder_decoder.py:248,262-271) — the nav agent applies sigmoid externally
for multi-label probability maps.  ``predict_labels`` restores the stock
argmax behaviour for zoo use.

Activations are NHWC; returned logit tensors are (B, H, W, num_classes).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import BACKBONES, HEADS, NECKS, SEGMENTORS
from .ops import resize_bilinear


@SEGMENTORS.register()
class EncoderDecoder(nn.Module):
    backbone: Dict[str, Any]
    decode_head: Dict[str, Any]
    auxiliary_head: Optional[Dict[str, Any]] = None
    neck: Optional[Dict[str, Any]] = None
    train_cfg: Optional[Dict[str, Any]] = None
    test_cfg: Optional[Dict[str, Any]] = None
    pretrained: Optional[str] = None

    def setup(self):
        bcfg = dict(self.backbone)
        bcfg.pop("pretrained", None)
        bcfg.pop("norm_cfg", None)
        self._backbone = BACKBONES.get(bcfg.pop("type"))(**bcfg, name="backbone")

        def _head(cfg, name):
            cfg = dict(cfg)
            cfg.pop("norm_cfg", None)
            cfg.pop("loss_decode", None)  # losses live in the train step
            return HEADS.get(cfg.pop("type"))(**cfg, name=name)

        self._decode_head = _head(self.decode_head, "decode_head")
        self._aux_head = (_head(self.auxiliary_head, "auxiliary_head")
                          if self.auxiliary_head else None)
        if self.neck:
            ncfg = dict(self.neck)
            self._neck = NECKS.get(ncfg.pop("type"))(**ncfg, name="neck")
        else:
            self._neck = None

    @property
    def align_corners(self) -> bool:
        return bool(self.decode_head.get("align_corners", False))

    @property
    def num_classes(self) -> int:
        return int(self.decode_head["num_classes"])

    def extract_feat(self, img, train: bool = False):
        feats = self._backbone(img, train=train)
        if self._neck is not None:
            feats = self._neck(feats, train=train)
        return feats

    def encode_decode(self, img, train: bool = False):
        """Backbone + decode head, logits resized to the input size."""
        feats = self.extract_feat(img, train=train)
        logits = self._decode_head(feats, train=train)
        return resize_bilinear(logits, (img.shape[-3], img.shape[-2]),
                               align_corners=self.align_corners)

    def __call__(self, img, train: bool = False, with_aux: bool = False):
        """Train/eval forward.

        Returns decode logits at head resolution resized to input, plus aux
        logits when ``with_aux`` (training path; aux weight applied by the
        loss, reference pred_model_cfg.py:29-40).
        """
        feats = self.extract_feat(img, train=train)
        logits = self._decode_head(feats, train=train)
        logits = resize_bilinear(logits, (img.shape[-3], img.shape[-2]),
                                 align_corners=self.align_corners)
        if with_aux and self._aux_head is not None:
            aux = self._aux_head(feats, train=train)
            aux = resize_bilinear(aux, (img.shape[-3], img.shape[-2]),
                                  align_corners=self.align_corners)
            return logits, aux
        return logits

    # ------------------------------------------------------------------
    # Inference modes (test_cfg parity: encoder_decoder.py:155-230)
    # ------------------------------------------------------------------

    def slide_inference(self, img):
        """Sliding-window inference with overlap-count normalization."""
        cfg = self.test_cfg or {}
        h_stride, w_stride = cfg.get("stride", (512, 512))
        h_crop, w_crop = cfg.get("crop_size", (768, 768))
        b, h, w, c = img.shape
        out_c = self.num_classes
        h_grids = max(h - h_crop + h_stride - 1, 0) // h_stride + 1
        w_grids = max(w - w_crop + w_stride - 1, 0) // w_stride + 1
        preds = jnp.zeros((b, h, w, out_c), img.dtype)
        count = jnp.zeros((b, h, w, 1), img.dtype)
        for hi in range(h_grids):
            for wi in range(w_grids):
                y1 = min(hi * h_stride, max(h - h_crop, 0))
                x1 = min(wi * w_stride, max(w - w_crop, 0))
                y2 = min(y1 + h_crop, h)
                x2 = min(x1 + w_crop, w)
                crop = img[:, y1:y2, x1:x2, :]
                logit = self.encode_decode(crop)
                preds = preds.at[:, y1:y2, x1:x2, :].add(logit)
                count = count.at[:, y1:y2, x1:x2, :].add(1.0)
        return preds / count

    def whole_inference(self, img):
        return self.encode_decode(img)

    def inference(self, img):
        """Raw logits at input resolution (PEANUT passthrough semantics)."""
        mode = (self.test_cfg or {}).get("mode", "whole")
        if mode == "slide":
            return self.slide_inference(img)
        return self.whole_inference(img)

    def predict_labels(self, img):
        """Stock mmseg behaviour: per-pixel argmax class map."""
        return jnp.argmax(self.inference(img), axis=-1)
