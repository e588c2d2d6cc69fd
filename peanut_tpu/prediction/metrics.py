"""Segmentation evaluation metrics (mmseg parity).

Equivalents of the reference's mmseg/core/evaluation/metrics.py:26-296:
intersect_and_union, mean IoU / Dice / Fscore, and the streaming
``pre_eval`` protocol (per-sample tuples reduced by pre_eval_to_metrics).
Pure numpy — evaluation is host-side bookkeeping.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def intersect_and_union(pred: np.ndarray, label: np.ndarray, num_classes: int,
                        ignore_index: int = 255,
                        label_map: Optional[Dict[int, int]] = None,
                        reduce_zero_label: bool = False):
    """Per-class intersection/union/area histograms for one sample."""
    pred = np.asarray(pred)
    label = np.asarray(label).copy()
    if label_map:
        for old, new in label_map.items():
            label[label == old] = new
    if reduce_zero_label:
        label[label == 0] = 255
        label = label - 1
        label[label == 254] = 255

    mask = label != ignore_index
    pred = pred[mask]
    label = label[mask]

    intersect = pred[pred == label]
    area_intersect = np.bincount(intersect, minlength=num_classes)[:num_classes]
    area_pred = np.bincount(pred, minlength=num_classes)[:num_classes]
    area_label = np.bincount(label, minlength=num_classes)[:num_classes]
    area_union = area_pred + area_label - area_intersect
    return (area_intersect.astype(np.float64), area_union.astype(np.float64),
            area_pred.astype(np.float64), area_label.astype(np.float64))


def total_intersect_and_union(preds, labels, num_classes, ignore_index=255,
                              label_map=None, reduce_zero_label=False):
    totals = [np.zeros(num_classes, np.float64) for _ in range(4)]
    for p, l in zip(preds, labels):
        parts = intersect_and_union(p, l, num_classes, ignore_index,
                                    label_map, reduce_zero_label)
        for t, x in zip(totals, parts):
            t += x
    return tuple(totals)


def _f_score(precision, recall, beta=1):
    denom = beta ** 2 * precision + recall
    return np.where(denom > 0, (1 + beta ** 2) * precision * recall / denom,
                    np.nan)


def eval_metrics(results, gt_seg_maps, num_classes: int,
                 ignore_index: int = 255,
                 metrics: Sequence[str] = ("mIoU",), nan_to_num=None,
                 label_map=None, reduce_zero_label=False, beta=1
                 ) -> "OrderedDict[str, np.ndarray]":
    """Full-dataset metrics (mmseg eval_metrics semantics)."""
    totals = total_intersect_and_union(results, gt_seg_maps, num_classes,
                                       ignore_index, label_map,
                                       reduce_zero_label)
    return total_area_to_metrics(*totals, metrics=metrics,
                                 nan_to_num=nan_to_num, beta=beta)


def pre_eval_to_metrics(pre_eval_results,
                        metrics: Sequence[str] = ("mIoU",),
                        nan_to_num=None, beta=1):
    """Reduce streamed (intersect, union, pred, label) tuples to metrics."""
    stacked = tuple(zip(*pre_eval_results))
    totals = [np.sum(np.stack(x), axis=0) for x in stacked]
    return total_area_to_metrics(*totals, metrics=metrics,
                                 nan_to_num=nan_to_num, beta=beta)


def total_area_to_metrics(area_intersect, area_union, area_pred, area_label,
                          metrics=("mIoU",), nan_to_num=None, beta=1):
    allowed = {"mIoU", "mDice", "mFscore"}
    if isinstance(metrics, str):
        metrics = [metrics]
    if not set(metrics) <= allowed:
        raise KeyError(f"metrics {metrics} not in {allowed}")

    with np.errstate(divide="ignore", invalid="ignore"):
        all_acc = area_intersect.sum() / area_label.sum()
        ret: "OrderedDict[str, np.ndarray]" = OrderedDict(
            {"aAcc": np.array(all_acc)})
        for metric in metrics:
            if metric == "mIoU":
                ret["IoU"] = area_intersect / area_union
                ret["Acc"] = area_intersect / area_label
            elif metric == "mDice":
                ret["Dice"] = 2 * area_intersect / (area_pred + area_label)
                ret["Acc"] = area_intersect / area_label
            elif metric == "mFscore":
                precision = area_intersect / area_pred
                recall = area_intersect / area_label
                ret["Fscore"] = _f_score(precision, recall, beta)
                ret["Precision"] = precision
                ret["Recall"] = recall
    if nan_to_num is not None:
        ret = OrderedDict({k: np.nan_to_num(v, nan=nan_to_num)
                           for k, v in ret.items()})
    return ret


class EvalHook:
    """Periodic-evaluation hook for the IterRunner (mmseg EvalHook shape).

    ``evaluate_fn(state) -> dict`` runs the validation pass; results are
    appended to the runner log.  PEANUT's own training disables evaluation
    (interval > max_iters; train_prediction_model.py:291) but the hook is a
    first-class capability of the framework.
    """

    def __init__(self, evaluate_fn, interval: int):
        self.evaluate_fn = evaluate_fn
        self.interval = interval
        self.history: List[Dict] = []

    def maybe_run(self, it: int, state) -> Optional[Dict]:
        if self.interval <= 0 or it % self.interval != 0:
            return None
        res = self.evaluate_fn(state)
        self.history.append({"iter": it, **res})
        return res


# ----------------------------------------------------------------------
# Multi-host evaluation: cross-process result gathering
# ----------------------------------------------------------------------

def gather_strided_results(local: np.ndarray, n_total: int,
                           world: Optional[int] = None,
                           allgather=None) -> np.ndarray:
    """Gather per-sample result arrays computed on rank-strided dataset
    shards, returned in ORIGINAL dataset order.

    The TPU equivalent of the reference's ``collect_results_cpu``
    (mmseg/apis/test.py:176-233): rank r evaluates samples
    ``range(r, n_total, world)`` and passes its (k_r, ...) per-sample
    array; every rank receives the (n_total, ...) array ordered by sample
    index, so downstream reductions are bit-identical to a single-process
    pass over the same data.

    ``world``/``allgather`` are injectable for distributed-without-a-
    cluster tests (the reference's own pattern,
    prediction/tests/test_utils/test_util_distribution.py); defaults come
    from the live jax process group.
    """
    local = np.asarray(local)
    if world is None:
        import jax

        world = jax.process_count()
    if world == 1:
        if len(local) != n_total:
            raise ValueError(f"expected {n_total} samples, got {len(local)}")
        return local
    if allgather is None:
        from jax.experimental import multihost_utils

        allgather = multihost_utils.process_allgather
    k_max = -(-n_total // world)
    padded = np.zeros((k_max,) + local.shape[1:], local.dtype)
    padded[:len(local)] = local
    gathered = np.asarray(allgather(padded))      # (world, k_max, ...)
    out = np.zeros((n_total,) + local.shape[1:], local.dtype)
    for r in range(world):
        cnt = len(range(r, n_total, world))
        out[r::world] = gathered[r][:cnt]
    return out
