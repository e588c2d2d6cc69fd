"""Prediction-model evaluation CLI (reference prediction/tools/test.py shape).

Runs the model over a val map directory and reports:
  * multi-label metrics for the PEANUT 6-goal task (BCE, per-class IoU@0.5,
    AP-style precision/recall at the operating threshold);
  * stock argmax mIoU/mDice/mFscore when --argmax is passed (zoo parity).

``--distributed`` shards the val set rank-strided across jax processes
(each evaluates ``range(rank, n, world)``), gathers the per-sample
statistics with ``multihost_utils.process_allgather`` back into dataset
order, and reduces them identically to the single-process pass — the TPU
equivalent of the reference's ``multi_gpu_test`` + ``collect_results_cpu``
(/root/reference/prediction/mmseg/apis/test.py:140-233).  Because the
reduction runs over sample-ordered arrays in both modes, the gathered
metrics are bit-equal to a single-process run over the same data.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def evaluate_shard(pm, ds, idxs, threshold: float, argmax: bool):
    """Per-sample statistics for the given dataset indices.

    Returns dict of (k, ...) arrays: bce, inter (k, 6), union (k, 6) and,
    when ``argmax``, pre_eval (k, 4, num_classes) intersect_and_union
    stacks.
    """
    import jax.numpy as jnp

    from ..models.losses import bce_with_logits
    from ..prediction.metrics import intersect_and_union

    k = len(idxs)
    bce = np.zeros(k)
    inter = np.zeros((k, 6))
    union = np.zeros((k, 6))
    pre_eval = np.zeros((k, 4, 6)) if argmax else None
    for j, i in enumerate(idxs):
        s = ds[int(i)]
        chw = s["img"].transpose(2, 0, 1)
        probs = pm.get_prediction(chw)                      # (6, H, W)
        target = s["gt"].transpose(2, 0, 1) / 255.0
        eps = 1e-6
        logits = np.log(np.clip(probs, eps, 1 - eps) /
                        np.clip(1 - probs, eps, 1 - eps))
        bce[j] = float(np.mean(np.asarray(bce_with_logits(
            jnp.asarray(logits), jnp.asarray(target)))))
        pred_bin = probs > threshold
        gt_bin = target > 0.5
        inter[j] = np.logical_and(pred_bin, gt_bin).sum(axis=(1, 2))
        union[j] = np.logical_or(pred_bin, gt_bin).sum(axis=(1, 2))
        if argmax:
            pre_eval[j] = np.stack(intersect_and_union(
                probs.argmax(0), target.argmax(0), 6))
    out = {"bce": bce, "inter": inter, "union": union}
    if argmax:
        out["pre_eval"] = pre_eval
    return out


def reduce_metrics(stats, threshold_note: float, argmax: bool):
    """Dataset-order reduction shared by the single-process and gathered
    paths (bit-identical inputs -> bit-identical report)."""
    from ..prediction.metrics import pre_eval_to_metrics

    inter = stats["inter"].sum(axis=0)
    union = stats["union"].sum(axis=0)
    out = {
        "samples": int(len(stats["bce"])),
        "bce": round(float(np.mean(stats["bce"])), 5),
        "iou_at_thr": [round(v, 4) for v in
                       (inter / np.maximum(union, 1)).tolist()],
        "miou_at_thr": round(float(
            (inter / np.maximum(union, 1)).mean()), 4),
    }
    if argmax and "pre_eval" in stats:
        pe = [tuple(row) for row in stats["pre_eval"]]
        m = pre_eval_to_metrics(pe, metrics=("mIoU",))
        out["argmax_mIoU"] = round(float(np.nanmean(m["IoU"])), 4)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", type=str, default="../data/saved_maps")
    ap.add_argument("--img_dir", type=str, default="val_80")
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="orbax dir or torch .pth")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--max_samples", type=int, default=0)
    ap.add_argument("--argmax", action="store_true")
    ap.add_argument("--distributed", type=int, default=0,
                    help="shard the val set over jax processes and gather "
                         "per-sample results (multi_gpu_test analog)")
    ns = ap.parse_args(argv)

    import jax

    if ns.distributed and jax.process_count() == 1 \
            and os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", 1)),
            process_id=int(os.environ.get("JAX_PROCESS_ID", 0)))

    from ..config import NavConfig
    from ..prediction import PredictionModel
    from ..prediction.dataset import SemMapDataset
    from ..prediction.metrics import gather_strided_results

    cfg = NavConfig(pred_model_wts=ns.checkpoint or "")
    pm = PredictionModel(cfg, input_size=960)
    ds = SemMapDataset(ns.data_root, ns.img_dir)

    n = len(ds) if ns.max_samples == 0 else min(len(ds), ns.max_samples)
    rank = jax.process_index() if ns.distributed else 0
    world = jax.process_count() if ns.distributed else 1
    idxs = list(range(rank, n, world))

    stats = evaluate_shard(pm, ds, idxs, ns.threshold, ns.argmax)
    if ns.distributed:
        stats = {k: gather_strided_results(v, n, world=world)
                 for k, v in stats.items()}
    out = reduce_metrics(stats, ns.threshold, ns.argmax)
    if rank == 0:
        print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
