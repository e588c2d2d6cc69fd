"""CascadeEncoderDecoder segmentor (flax.linen, NHWC).

Structural parity with the reference's
prediction/mmseg/models/segmentors/cascade_encoder_decoder.py:14-98: a list
of ``num_stages`` decode heads where stage i>0 receives the previous stage's
logits (OCRNet, PointRend).  Heads whose __call__ accepts ``prev_logits``
(OCRHead) get them directly; PointHead stages run the static-shape
PointRend refinement protocol at inference.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import BACKBONES, HEADS, NECKS, SEGMENTORS
from .heads_zoo import PointHead, point_sample
from .ops import resize_bilinear


@SEGMENTORS.register()
class CascadeEncoderDecoder(nn.Module):
    num_stages: int
    backbone: Dict[str, Any]
    decode_head: Sequence[Dict[str, Any]]
    auxiliary_head: Optional[Dict[str, Any]] = None
    neck: Optional[Dict[str, Any]] = None
    train_cfg: Optional[Dict[str, Any]] = None
    test_cfg: Optional[Dict[str, Any]] = None
    pretrained: Optional[str] = None

    def setup(self):
        bcfg = dict(self.backbone)
        bcfg.pop("pretrained", None)
        bcfg.pop("norm_cfg", None)
        self._backbone = BACKBONES.get(bcfg.pop("type"))(**bcfg,
                                                         name="backbone")

        def _head(cfg, name):
            cfg = dict(cfg)
            cfg.pop("norm_cfg", None)
            cfg.pop("loss_decode", None)
            return HEADS.get(cfg.pop("type"))(**cfg, name=name)

        assert len(self.decode_head) == self.num_stages
        self._heads = [_head(cfg, f"decode_head{i}")
                       for i, cfg in enumerate(self.decode_head)]
        self._aux_head = (_head(self.auxiliary_head, "auxiliary_head")
                          if self.auxiliary_head else None)
        if self.neck:
            ncfg = dict(self.neck)
            self._neck = NECKS.get(ncfg.pop("type"))(**ncfg, name="neck")
        else:
            self._neck = None

    @property
    def align_corners(self) -> bool:
        return bool(self.decode_head[-1].get("align_corners", False))

    @property
    def num_classes(self) -> int:
        return int(self.decode_head[-1]["num_classes"])

    def extract_feat(self, img, train: bool = False):
        feats = self._backbone(img, train=train)
        if self._neck is not None:
            feats = self._neck(feats, train=train)
        return feats

    def _run_stages(self, feats, train: bool = False):
        """All non-point stages; returns per-stage logits (head resolution)."""
        outs = []
        prev = None
        for head in self._heads:
            if isinstance(head, PointHead):
                break
            if prev is None:
                prev = head(feats, train=train)
            else:
                prev = head(feats, prev_logits=prev, train=train)
            outs.append(prev)
        return outs

    def __call__(self, img, train: bool = False, with_aux: bool = False):
        """Training forward: every stage's logits resized to the input size
        (losses are applied per-stage by the train step, mirroring
        cascade_encoder_decoder.py forward_train's per-stage loss dict)."""
        feats = self.extract_feat(img, train=train)
        stage_outs = self._run_stages(feats, train=train)
        size = (img.shape[-3], img.shape[-2])
        outs = [resize_bilinear(o, size, align_corners=self.align_corners)
                for o in stage_outs]
        if isinstance(self._heads[-1], PointHead):
            # PointRend training pass: classify the top-k most uncertain
            # points of the coarse logits (point_head.py forward_train,
            # with deterministic top-k in place of importance sampling)
            head = self._heads[-1]
            coarse = stage_outs[-1]
            b, ch, cw, _ = coarse.shape
            num_points = int((self.train_cfg or {}).get("num_points", 256))
            k = min(num_points, ch * cw)
            unc = PointHead.uncertainty(coarse).reshape(b, ch * cw)
            _, idx = jax.lax.top_k(unc, k)
            ys = (idx // cw).astype(jnp.float32)
            xs = (idx % cw).astype(jnp.float32)
            pts = jnp.stack([(xs + 0.5) / cw, (ys + 0.5) / ch], axis=-1)
            self.sow("intermediates", "point_logits",
                     head(feats, coarse, pts, train=train))
            self.sow("intermediates", "points", pts)
        if with_aux and self._aux_head is not None:
            aux = resize_bilinear(self._aux_head(feats, train=train), size,
                                  align_corners=self.align_corners)
            return tuple(outs) + (aux,)
        return tuple(outs) if len(outs) > 1 else outs[0]

    def encode_decode(self, img, train: bool = False):
        feats = self.extract_feat(img, train=train)
        logits = self._run_stages(feats, train=train)[-1]
        # PointRend refinement stage, static shapes (subdivision protocol of
        # point_head.py simple_test, with fixed num_points per round)
        if isinstance(self._heads[-1], PointHead):
            cfg = self.test_cfg or {}
            num_points = int(cfg.get("subdivision_num_points", 1024))
            steps = int(cfg.get("subdivision_steps", 2))
            scale = int(cfg.get("scale_factor", 2))
            head = self._heads[-1]
            refined = logits
            for _ in range(steps):
                h2 = refined.shape[-3] * scale
                w2 = refined.shape[-2] * scale
                refined = resize_bilinear(refined, (h2, w2),
                                          align_corners=self.align_corners)
                b = refined.shape[0]
                unc = PointHead.uncertainty(refined).reshape(b, h2 * w2)
                k = min(num_points, h2 * w2)
                _, idx = jax.lax.top_k(unc, k)
                ys = (idx // w2).astype(jnp.float32)
                xs = (idx % w2).astype(jnp.float32)
                pts = jnp.stack([(xs + 0.5) / w2, (ys + 0.5) / h2], axis=-1)
                point_logits = head(feats, refined, pts)
                flat = refined.reshape(b, h2 * w2, -1)
                flat = jax.vmap(lambda f, i, p: f.at[i].set(p))(
                    flat, idx, point_logits)
                refined = flat.reshape(b, h2, w2, -1)
            logits = refined
        return resize_bilinear(logits, (img.shape[-3], img.shape[-2]),
                               align_corners=self.align_corners)

    def whole_inference(self, img):
        return self.encode_decode(img)

    def inference(self, img):
        return self.whole_inference(img)

    def predict_labels(self, img):
        return jnp.argmax(self.inference(img), axis=-1)
