"""Mask R-CNN (GeneralizedRCNN) in JAX — static shapes end to end.

Architecture parity with the reference's detectron2 model
(/root/reference/nav/agent/utils/COCO-InstSeg/mask_rcnn_R_101_cat9.yaml):
ResNet-101 caffe-style (stride_in_1x1, FrozenBN) + FPN(256) + standard RPN +
StandardROIHeads (2-fc box head, 4-conv mask head), 9 classes.

TPU-first differences from the CUDA implementation:
  * every stage is fixed-size — candidate sets are score-padded with -inf
    instead of dynamically filtered, NMS returns suppression masks;
  * ROIAlign is one batched bilinear gather over a stacked pyramid buffer
    (see roi_align.py) instead of per-level CUDA kernels;
  * the whole detect() pipeline is one jit program per input geometry.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .boxes import (anchors_for_level, apply_deltas, batched_nms,
                    clip_boxes, generate_cell_anchors, nms_fixed)
from .layers import Conv2d
from .fpn import FPN
from .resnet import ResNet
from .roi_align import build_roi_stack, multilevel_roi_align

PIXEL_MEAN_BGR = np.array([103.53, 116.28, 123.675], np.float32)
FPN_STRIDES = (4, 8, 16, 32, 64)
ANCHOR_SIZES = ((32,), (64,), (128,), (256,), (512,))
ASPECT_RATIOS = (0.5, 1.0, 2.0)
RPN_NMS_THRESH = 0.7
RPN_PRE_NMS_TOPK = 1000
RPN_POST_NMS_TOPK = 1000
ROI_NMS_THRESH = 0.5
DETECTIONS_PER_IMAGE = 100
BOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


class RPNHead(nn.Module):
    num_anchors: int = 3

    @nn.compact
    def __call__(self, feats):
        # d2 StandardRPNHead init: normal(std=0.01), zero bias — without it
        # random-init proposals are degenerate sliver boxes (exp of O(1)
        # deltas), which is both unfaithful and pathological for ROIAlign
        init = nn.initializers.normal(0.01)
        conv = Conv2d(256, 3, padding=1, use_bias=True, kernel_init=init,
                      name="conv")
        obj = Conv2d(self.num_anchors, 1, use_bias=True, kernel_init=init,
                     name="objectness")
        deltas = Conv2d(self.num_anchors * 4, 1, use_bias=True,
                        kernel_init=init, name="deltas")
        outs = []
        for f in feats:
            t = nn.relu(conv(f))
            outs.append((obj(t), deltas(t)))
        return outs


class BoxHead(nn.Module):
    """FastRCNNConvFCHead: 0 convs, 2 fc of 1024."""

    @nn.compact
    def __call__(self, x):  # (N, 7, 7, C)
        n = x.shape[0]
        # match torch flatten order (C, H, W)
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1)
        x = nn.relu(nn.Dense(1024, name="fc1")(x))
        x = nn.relu(nn.Dense(1024, name="fc2")(x))
        return x


class BoxPredictor(nn.Module):
    num_classes: int = 9

    @nn.compact
    def __call__(self, x):
        # d2 FastRCNNOutputLayers init: cls normal(0.01), box normal(0.001)
        scores = nn.Dense(self.num_classes + 1,
                          kernel_init=nn.initializers.normal(0.01),
                          name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4,
                          kernel_init=nn.initializers.normal(0.001),
                          name="bbox_pred")(x)
        return scores, deltas


class MaskHead(nn.Module):
    """MaskRCNNConvUpsampleHead: 4 convs 256 + 2x deconv + 1x1 predictor."""
    num_classes: int = 9

    @nn.compact
    def __call__(self, x):  # (N, 14, 14, C)
        for i in range(1, 5):
            x = nn.relu(Conv2d(256, 3, padding=1, use_bias=True,
                               name=f"mask_fcn{i}")(x))
        x = nn.relu(nn.ConvTranspose(256, (2, 2), strides=(2, 2),
                                     name="deconv")(x))
        return Conv2d(self.num_classes, 1, use_bias=True, name="predictor")(x)


class MaskRCNN(nn.Module):
    num_classes: int = 9
    depth: int = 101
    score_thresh: float = 0.05

    def setup(self):
        self.backbone = ResNet(depth=self.depth, in_channels=3,
                               strides=(1, 2, 2, 2), dilations=(1, 1, 1, 1),
                               out_indices=(0, 1, 2, 3), style="caffe",
                               norm_eval=True, name="backbone")
        self.fpn = FPN(out_channels=256, name="fpn")
        self.rpn_head = RPNHead(name="rpn_head")
        self.box_head = BoxHead(name="box_head")
        self.box_predictor = BoxPredictor(self.num_classes,
                                          name="box_predictor")
        self.mask_head = MaskHead(self.num_classes, name="mask_head")

    # ------------------------------------------------------------------
    # The whole pipeline is natively batched over images: the backbone and
    # heads see a real batch dim (straight to batched convs/matmuls on the
    # MXU), ROIAlign pools all B*N ROIs from ONE stacked buffer, and only
    # the per-image NMS selections run under vmap.  Wrapping detect() in an
    # outer vmap instead would break ROIAlign's global overflow sort (the
    # static head/tail chunk partition must see ALL ROIs, see roi_align.py)
    # and vmap the batched-NMS layout poorly — don't.
    # ------------------------------------------------------------------
    def features(self, images):
        """images: (B, H, W, 3) float32, BGR minus pixel mean, padded /32."""
        feats = self.backbone(images, train=False)
        return self.fpn(feats)  # p2..p6, each (B, H_l, W_l, C)

    def proposals(self, pyramid, img_h: int, img_w: int):
        """RPN: per-level topk -> deltas -> clip -> NMS -> global topk."""
        rpn_outs = self.rpn_head(pyramid)
        bsz = pyramid[0].shape[0]
        all_boxes, all_scores = [], []
        for lvl, (obj, delt) in enumerate(rpn_outs):
            stride = FPN_STRIDES[lvl]
            cell = generate_cell_anchors(ANCHOR_SIZES[lvl], ASPECT_RATIOS)
            h, w = obj.shape[1], obj.shape[2]
            anchors = jnp.asarray(anchors_for_level(h, w, stride, cell))
            scores = obj.reshape(bsz, -1)                   # (B, H*W*A)
            deltas = delt.reshape(bsz, -1, 4)               # (h, w, A) order
            k = min(RPN_PRE_NMS_TOPK, scores.shape[1])
            top_scores, idx = jax.lax.top_k(scores, k)      # (B, k)
            boxes = apply_deltas(
                jnp.take_along_axis(deltas, idx[..., None], axis=1),
                anchors[idx])
            boxes = clip_boxes(boxes, img_h, img_w)
            if k < RPN_PRE_NMS_TOPK:
                # pad BEFORE NMS: -inf scores are invalid there (cannot
                # keep or suppress), so the kept set is unchanged
                pad = RPN_PRE_NMS_TOPK - k
                boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
                top_scores = jnp.pad(top_scores, ((0, 0), (0, pad)),
                                     constant_values=-jnp.inf)
            all_boxes.append(boxes)
            all_scores.append(top_scores)
        # ONE batched NMS over (level, image): per-level NMS programs are
        # independent, and nms_fixed's fixed-point loop is latency- not
        # FLOP-bound, so folding the level axis into the vmap batch runs
        # the 5 level solves concurrently instead of back-to-back
        stk_boxes = jnp.stack(all_boxes)              # (L, B, K, 4)
        stk_scores = jnp.stack(all_scores)            # (L, B, K)
        lb = stk_boxes.shape[0] * stk_boxes.shape[1]
        kept = jax.vmap(lambda b, s: nms_fixed(b, s, RPN_NMS_THRESH))(
            stk_boxes.reshape(lb, -1, 4), stk_scores.reshape(lb, -1))
        kept = kept.reshape(stk_scores.shape)
        # level-major concat order matches the former per-level append
        boxes = jnp.concatenate(list(stk_boxes), axis=1)
        scores = jnp.concatenate(list(kept), axis=1)
        top_scores, idx = jax.lax.top_k(scores, RPN_POST_NMS_TOPK)
        return jnp.take_along_axis(boxes, idx[..., None], axis=1), top_scores

    def box_inference(self, pyramid, proposals, prop_scores,
                      img_h: int, img_w: int, roi_ctx=None):
        """ROI box head + per-class NMS -> fixed 100 detections/image."""
        bsz, n = proposals.shape[:2]
        feats = pyramid[:4]                               # p2..p5, batched
        pooled = multilevel_roi_align(feats, proposals, FPN_STRIDES[:4], 7,
                                      ctx=roi_ctx)
        x = self.box_head(pooled.reshape((bsz * n,) + pooled.shape[2:]))
        scores, deltas = self.box_predictor(x)
        probs = jax.nn.softmax(scores, axis=-1)[:, :self.num_classes]
        probs = probs.reshape(bsz, n, self.num_classes)
        # invalidate padded proposals
        valid = jnp.isfinite(prop_scores)
        probs = jnp.where(valid[..., None], probs, 0.0)

        deltas = deltas.reshape(bsz, n, self.num_classes, 4)
        boxes_per_class = apply_deltas(
            deltas, proposals[:, :, None, :], weights=BOX_REG_WEIGHTS)
        boxes_per_class = clip_boxes(boxes_per_class, img_h, img_w)

        flat_scores = probs.reshape(bsz, -1)              # (B, N*C)
        flat_scores = jnp.where(flat_scores > self.score_thresh,
                                flat_scores, -jnp.inf)
        flat_boxes = boxes_per_class.reshape(bsz, -1, 4)
        flat_cls = jnp.tile(jnp.arange(self.num_classes), n)

        k = min(RPN_POST_NMS_TOPK, flat_scores.shape[1])
        cand_scores, idx = jax.lax.top_k(flat_scores, k)
        cand_boxes = jnp.take_along_axis(flat_boxes, idx[..., None], axis=1)
        cand_cls = flat_cls[idx]
        kept = jax.vmap(
            lambda b, s, c_: batched_nms(b, s, c_, ROI_NMS_THRESH))(
            cand_boxes, cand_scores, cand_cls)
        det_scores, didx = jax.lax.top_k(kept, DETECTIONS_PER_IMAGE)
        return (jnp.take_along_axis(cand_boxes, didx[..., None], axis=1),
                det_scores,
                jnp.take_along_axis(cand_cls, didx, axis=1))

    def mask_inference(self, pyramid, det_boxes, det_classes, roi_ctx=None):
        bsz, n = det_boxes.shape[:2]
        feats = pyramid[:4]
        pooled = multilevel_roi_align(feats, det_boxes, FPN_STRIDES[:4], 14,
                                      ctx=roi_ctx)
        logits = self.mask_head(pooled.reshape((bsz * n,) + pooled.shape[2:]))
        logits = logits.reshape((bsz, n) + logits.shape[1:])
        sel = jnp.take_along_axis(
            logits, det_classes[:, :, None, None, None], axis=-1)[..., 0]
        return jax.nn.sigmoid(sel)                        # (B, N, 28, 28)

    def detect_batch(self, images) -> Dict[str, jnp.ndarray]:
        """Full static pipeline on preprocessed (B, H, W, 3) images."""
        img_h, img_w = images.shape[1], images.shape[2]
        pyramid = self.features(images)
        proposals, prop_scores = self.proposals(pyramid, img_h, img_w)
        # one stacked-buffer context serves both ROI stages (round 5:
        # rebuilding the ~0.5 GB stack per stage was measurable)
        roi_ctx = build_roi_stack(pyramid[:4], FPN_STRIDES[:4])
        boxes, scores, classes = self.box_inference(
            pyramid, proposals, prop_scores, img_h, img_w, roi_ctx=roi_ctx)
        masks = self.mask_inference(pyramid, boxes, classes,
                                    roi_ctx=roi_ctx)
        return {"boxes": boxes, "scores": scores,
                "classes": classes, "masks": masks}

    def detect(self, image) -> Dict[str, jnp.ndarray]:
        """Single preprocessed (H, W, 3) image convenience wrapper."""
        out = self.detect_batch(image[None])
        return {k: v[0] for k, v in out.items()}

    def __call__(self, image):
        return self.detect(image)
