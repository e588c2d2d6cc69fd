"""Mask R-CNN segmentation backend (the production path).

Twin of the reference SemanticPredMaskRCNN
(/root/reference/nav/agent/utils/segmentation.py:28-62): detectron2-style
preprocessing (RGB->BGR, mean subtraction, shortest-edge 800 resize capped at
1333, pad to /32), one jit-compiled detect() per frame geometry, then
host-side mask pasting and the reference's confidence-gated accumulation
into a (H, W, n_cats+1) channel stack.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..config import NavConfig
from ..models.mask_rcnn import MaskRCNN, PIXEL_MEAN_BGR
from ..models.d2_import import convert_d2_maskrcnn_state
from ..core.checkpoint import load_torch_state_dict
from .segmentation import accumulate_instances


def resize_shortest_edge(h: int, w: int, short: int = 800,
                         max_size: int = 1333) -> Tuple[int, int]:
    """detectron2 ResizeShortestEdge output size for (h, w)."""
    scale = short / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    nh, nw = h * scale, w * scale
    return int(nh + 0.5), int(nw + 0.5)


def pad_to_multiple(h: int, w: int, div: int = 32) -> Tuple[int, int]:
    return -(-h // div) * div, -(-w // div) * div


class MaskRCNNSegmenter:
    def __init__(self, cfg: NavConfig, variables=None):
        import jax
        import jax.numpy as jnp

        self.cfg = cfg
        self.n_cats = cfg.num_sem_categories - 1
        self.model = MaskRCNN(num_classes=self.n_cats,
                              score_thresh=0.05)
        h, w = cfg.env_frame_height, cfg.env_frame_width
        self.rh, self.rw = resize_shortest_edge(h, w)
        self.ph, self.pw = pad_to_multiple(self.rh, self.rw)
        if variables is not None:
            self.variables = variables
        else:
            sd = load_torch_state_dict(cfg.seg_model_wts)  # may raise
            self.variables = convert_d2_maskrcnn_state(sd)

        if cfg.serve_bf16:
            self.variables = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                self.variables)
        serve_dtype = jnp.bfloat16 if cfg.serve_bf16 else jnp.float32

        def _to_f32(det):
            return {k: v.astype(jnp.float32) if v.dtype == jnp.bfloat16
                    else v for k, v in det.items()}

        @jax.jit
        def _detect(variables, img):
            det = self.model.apply(variables, img.astype(serve_dtype),
                                   method=self.model.detect)
            return _to_f32(det)

        @jax.jit
        def _detect_batch(variables, imgs):
            det = jax.vmap(
                lambda im: self.model.apply(variables,
                                            im.astype(serve_dtype),
                                            method=self.model.detect))(imgs)
            return _to_f32(det)

        self._detect = _detect
        self._detect_batch = _detect_batch
        self._jnp = jnp

    def _preprocess(self, rgb: np.ndarray) -> np.ndarray:
        import cv2

        bgr = rgb[:, :, ::-1].astype(np.float32)
        resized = cv2.resize(bgr, (self.rw, self.rh),
                             interpolation=cv2.INTER_LINEAR)
        img = resized - PIXEL_MEAN_BGR
        return np.pad(img, ((0, self.ph - self.rh),
                            (0, self.pw - self.rw), (0, 0)))

    def __call__(self, rgb: np.ndarray, depth=None,
                 goal_cat: Optional[int] = None) -> np.ndarray:
        det = self._detect(self.variables,
                           self._jnp.asarray(self._preprocess(rgb)))
        return self._postprocess(rgb.shape[:2], det, goal_cat)

    def batch(self, rgbs, goal_cats) -> list:
        """Segment a batch of frames with ONE device program (the
        parallel-episode runtime path)."""
        imgs = np.stack([self._preprocess(r) for r in rgbs])
        dets = self._detect_batch(self.variables, self._jnp.asarray(imgs))
        out = []
        for i, rgb in enumerate(rgbs):
            det = {k: v[i] for k, v in dets.items()}
            out.append(self._postprocess(rgb.shape[:2], det, goal_cats[i]))
        return out

    def _postprocess(self, hw, det, goal_cat: Optional[int]) -> np.ndarray:
        import cv2

        cfg = self.cfg
        h, w = hw
        boxes = np.asarray(det["boxes"])
        scores = np.asarray(det["scores"])
        classes = np.asarray(det["classes"])
        masks28 = np.asarray(det["masks"])

        scale_y = h / self.rh
        scale_x = w / self.rw
        n_det = boxes.shape[0]
        full_masks = np.zeros((n_det, h, w), np.float32)
        for i in range(n_det):
            if not np.isfinite(scores[i]) or scores[i] < cfg.sem_pred_prob_thr:
                continue
            x1, y1, x2, y2 = boxes[i]
            x1 = int(np.floor(x1 * scale_x))
            y1 = int(np.floor(y1 * scale_y))
            x2 = int(np.ceil(x2 * scale_x))
            y2 = int(np.ceil(y2 * scale_y))
            x1, y1 = max(x1, 0), max(y1, 0)
            x2, y2 = min(x2, w), min(y2, h)
            if x2 <= x1 or y2 <= y1:
                continue
            m = cv2.resize(masks28[i], (x2 - x1, y2 - y1),
                           interpolation=cv2.INTER_LINEAR)
            full_masks[i, y1:y2, x1:x2] = (m > 0.5).astype(np.float32)

        return accumulate_instances(
            classes, np.where(np.isfinite(scores), scores, 0.0), full_masks,
            self.n_cats, cfg.sem_pred_prob_thr, cfg.goal_thr, goal_cat,
            (h, w))
