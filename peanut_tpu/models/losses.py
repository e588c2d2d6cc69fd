"""Segmentation losses (pure jnp, registry-built).

MultiLabelBCELoss is the reference's ``MyLoss``
(/root/reference/prediction/train_prediction_model.py:173-211): per-pixel
sigmoid BCE against uint8 targets / 255, multi-label (NOT softmax CE); the
inverse-frequency pos_weights the reference computes but leaves disabled are
kept available behind a flag.  CrossEntropyLoss covers the stock zoo
(cross_entropy_loss.py:197).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..registry import LOSSES


def _reduce(loss, weight, reduction: str, avg_factor=None):
    """mmseg weight_reduce_loss semantics (losses/utils.py)."""
    if weight is not None:
        loss = loss * weight
    if reduction == "mean":
        if avg_factor is None:
            return jnp.mean(loss)
        return jnp.sum(loss) / avg_factor
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def bce_with_logits(pred, target, pos_weight=None):
    """Numerically-stable sigmoid BCE, matching F.binary_cross_entropy_with_logits."""
    neg_abs = -jnp.abs(pred)
    # log(1 + exp(-|x|)) formulation
    softplus = jnp.log1p(jnp.exp(neg_abs))
    loss_pos = softplus + jnp.maximum(-pred, 0.0)   # -log(sigmoid(x))
    loss_neg = softplus + jnp.maximum(pred, 0.0)    # -log(1 - sigmoid(x))
    if pos_weight is not None:
        return pos_weight * target * loss_pos + (1 - target) * loss_neg
    return target * loss_pos + (1 - target) * loss_neg


@LOSSES.register()
class MultiLabelBCELoss:
    """Reference MyLoss: BCE(pred_logits, uint8_target / 255)."""

    loss_name = "loss_bce"

    def __init__(self, reduction: str = "mean", loss_weight: float = 1.0,
                 use_pos_weight: bool = False,
                 pos_weights: Optional[Sequence[float]] = None):
        self.reduction = reduction
        self.loss_weight = loss_weight
        # inverse-frequency weights computed by the reference but disabled
        # (train_prediction_model.py:177-183)
        self.pos_weights = pos_weights if use_pos_weight else None

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, ignore_index=None):
        """pred: (B, H, W, C) logits; target: (B, H, W, C) in [0, 255]."""
        reduction = reduction_override or self.reduction
        pw = (jnp.asarray(self.pos_weights, pred.dtype)
              if self.pos_weights is not None else None)
        loss = bce_with_logits(pred, target.astype(pred.dtype) / 255.0,
                               pos_weight=pw)
        return self.loss_weight * _reduce(loss, weight, reduction, avg_factor)


# Alias matching the reference registry name so reference configs build as-is.
LOSSES.register(MultiLabelBCELoss, name="MyLoss")


@LOSSES.register()
class CrossEntropyLoss:
    """Standard per-pixel softmax CE with ignore_index (stock zoo loss)."""

    loss_name = "loss_ce"

    def __init__(self, reduction: str = "mean", loss_weight: float = 1.0,
                 class_weight: Optional[Sequence[float]] = None,
                 use_sigmoid: bool = False):
        self.reduction = reduction
        self.loss_weight = loss_weight
        self.class_weight = class_weight
        self.use_sigmoid = use_sigmoid

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, ignore_index: int = 255):
        """pred: (B, H, W, C) logits; target: (B, H, W) int labels."""
        reduction = reduction_override or self.reduction
        if self.use_sigmoid:
            onehot = jax.nn.one_hot(target, pred.shape[-1], dtype=pred.dtype)
            loss = bce_with_logits(pred, onehot).sum(-1)
        else:
            logp = jax.nn.log_softmax(pred, axis=-1)
            valid = target != ignore_index
            tgt = jnp.where(valid, target, 0)
            loss = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
            if self.class_weight is not None:
                cw = jnp.asarray(self.class_weight, pred.dtype)
                loss = loss * cw[tgt]
            loss = jnp.where(valid, loss, 0.0)
            if reduction == "mean" and avg_factor is None:
                return self.loss_weight * jnp.sum(loss) / jnp.maximum(
                    jnp.sum(valid), 1)
        return self.loss_weight * _reduce(loss, weight, reduction, avg_factor)


@LOSSES.register()
class DiceLoss:
    """Soft dice loss (zoo; dice_loss.py)."""

    loss_name = "loss_dice"

    def __init__(self, smooth: float = 1.0, exponent: float = 2.0,
                 reduction: str = "mean", loss_weight: float = 1.0):
        self.smooth = smooth
        self.exponent = exponent
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None,
                 reduction_override=None, ignore_index: int = 255):
        reduction = reduction_override or self.reduction
        prob = jax.nn.softmax(pred, axis=-1)
        onehot = jax.nn.one_hot(target, pred.shape[-1], dtype=pred.dtype)
        dims = tuple(range(1, pred.ndim - 1))
        num = 2 * jnp.sum(prob * onehot, axis=dims) + self.smooth
        den = jnp.sum(prob ** self.exponent + onehot ** self.exponent,
                      axis=dims) + self.smooth
        loss = 1 - num / den
        return self.loss_weight * _reduce(loss, weight, reduction, avg_factor)


def accuracy(pred, target, topk=1, thresh=None, ignore_index=None):
    """Top-k pixel accuracy (reference mmseg/models/losses/accuracy.py):
    pred (..., C) logits, target (...) int labels.  Returns scalar(s) in
    [0, 100]; a prediction only counts if its score exceeds ``thresh``
    when given.  ``topk`` may be an int or tuple of ints."""
    topks = (topk,) if isinstance(topk, int) else tuple(topk)
    maxk = max(topks)
    scores, idx = jax.lax.top_k(pred, maxk)              # (..., maxk)
    correct = idx == target[..., None]
    if thresh is not None:
        correct = correct & (scores > thresh)
    if ignore_index is not None:
        valid = target != ignore_index
        correct = correct & valid[..., None]
        denom = jnp.maximum(valid.sum(), 1)
    else:
        denom = target.size
    accs = [100.0 * jnp.sum(correct[..., :k]) / denom for k in topks]
    return accs[0] if isinstance(topk, int) else tuple(accs)
