"""Additional zoo losses: focal and Lovász (pure jnp, no CUDA ops).

The reference's focal loss wraps an mmcv CUDA kernel
(mmseg/models/losses/focal_loss.py:6); here it is the standard closed-form
sigmoid focal loss, which XLA fuses into elementwise VPU code.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..registry import LOSSES
from .losses import _reduce, bce_with_logits


@LOSSES.register()
class FocalLoss:
    loss_name = "loss_focal"

    def __init__(self, gamma: float = 2.0, alpha: float = 0.25,
                 reduction: str = "mean", loss_weight: float = 1.0):
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, ignore_index=None):
        """pred: (..., C) logits; target: (...,) int labels."""
        reduction = reduction_override or self.reduction
        onehot = jax.nn.one_hot(target, pred.shape[-1], dtype=pred.dtype)
        p = jax.nn.sigmoid(pred)
        ce = bce_with_logits(pred, onehot)
        p_t = p * onehot + (1 - p) * (1 - onehot)
        alpha_t = self.alpha * onehot + (1 - self.alpha) * (1 - onehot)
        loss = (alpha_t * (1 - p_t) ** self.gamma * ce).sum(-1)
        return self.loss_weight * _reduce(loss, weight, reduction, avg_factor)


def _lovasz_grad(gt_sorted):
    """Gradient of the Lovász extension w.r.t. sorted errors."""
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / union
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


@LOSSES.register()
class LovaszLoss:
    """Multi-class Lovász-softmax (lovasz_loss.py), per-image."""

    loss_name = "loss_lovasz"

    def __init__(self, classes: str = "present", per_image: bool = False,
                 reduction: str = "mean", loss_weight: float = 1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, ignore_index: int = 255):
        """pred: (B, H, W, C) logits; target: (B, H, W) labels."""
        probs = jax.nn.softmax(pred, axis=-1)
        b, h, w, c = probs.shape
        probs = probs.reshape(-1, c)
        labels = target.reshape(-1)
        valid = labels != ignore_index
        labels_safe = jnp.where(valid, labels, 0)

        losses = []
        for ci in range(c):
            fg = ((labels_safe == ci) & valid).astype(probs.dtype)
            errors = jnp.abs(fg - probs[:, ci]) * valid
            order = jnp.argsort(-errors)
            errors_sorted = errors[order]
            fg_sorted = fg[order]
            grad = _lovasz_grad(fg_sorted)
            present = fg.sum() > 0
            losses.append(jnp.where(present,
                                    jnp.dot(errors_sorted, grad), 0.0))
        loss = jnp.stack(losses)
        n_present = jnp.maximum((loss > 0).sum(), 1)
        return self.loss_weight * jnp.sum(loss) / n_present
