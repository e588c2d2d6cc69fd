"""Per-stage Mask R-CNN serving profile on the attached device.

Times backbone+FPN / RPN / box head (incl. ROIAlign) / mask head as
separate jit programs at the serving geometry, plus the fused detect_batch,
and reports the overflow-ROI population that hits ROIAlign's elongated-box
pass.  Timings fetch a device-computed scalar (axon tunnel:
block_until_ready alone is unreliable).

Usage: python scripts/profile_maskrcnn.py [--batch 8] [--iters 6]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1088)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
    import jax
    import jax.numpy as jnp

    from peanut_tpu.models.mask_rcnn import MaskRCNN, FPN_STRIDES

    model = MaskRCNN(num_classes=9)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(args.batch, args.height, args.width, 3)
                      .astype(np.float32) * 50.0)

    variables = jax.jit(
        lambda r, x: model.init(r, x, method=model.detect))(
        jax.random.PRNGKey(0), img[0])
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, variables)
    img = img.astype(jnp.bfloat16)

    h, w = args.height, args.width

    feat_fn = jax.jit(lambda v, x: model.apply(v, x, method=model.features))
    prop_fn = jax.jit(lambda v, py: model.apply(v, py, h, w,
                                                method=model.proposals))
    box_fn = jax.jit(lambda v, py, p, s: model.apply(
        v, py, p, s, h, w, method=model.box_inference))
    mask_fn = jax.jit(lambda v, py, b, c: model.apply(
        v, py, b, c, method=model.mask_inference))
    det_fn = jax.jit(lambda v, x: model.apply(v, x,
                                              method=model.detect_batch))

    def sync(tree):
        leaves = jax.tree.leaves(tree)
        return float(jnp.sum(leaves[0].astype(jnp.float32)))

    def bench(name, fn, *a):
        out = fn(*a)          # compile + warm
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
            sync(out)
        dt = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{name:24s} {dt:8.1f} ms")
        return out, dt

    pyramid, t_feat = bench("backbone+fpn", feat_fn, variables, img)
    (props, pscores), t_prop = bench("rpn+proposals", prop_fn, variables,
                                     pyramid)
    (boxes, scores, classes), t_box = bench("box head (roialign+nms)",
                                            box_fn, variables, pyramid,
                                            props, pscores)
    masks, t_mask = bench("mask head (roialign)", mask_fn, variables,
                          pyramid, boxes, classes)
    det, t_all = bench("detect_batch fused", det_fn, variables, img)

    print(f"{'stage sum':24s} {t_feat + t_prop + t_box + t_mask:8.1f} ms")
    fps = args.batch / (t_all / 1000)
    print(f"fused: {fps:.1f} frames/s @ batch {args.batch}")

    # ---- box-stage internals: where do the box-head ms live? ----------
    from peanut_tpu.models.boxes import (apply_deltas, batched_nms,
                                         clip_boxes)
    from peanut_tpu.models.mask_rcnn import (BOX_REG_WEIGHTS,
                                             DETECTIONS_PER_IMAGE,
                                             ROI_NMS_THRESH,
                                             RPN_POST_NMS_TOPK)
    from peanut_tpu.models.roi_align import multilevel_roi_align

    bsz, n = props.shape[:2]
    ncls = model.num_classes

    roi_fn = jax.jit(lambda py, p: multilevel_roi_align(
        list(py[:4]), p, FPN_STRIDES[:4], 7))

    def _fc(m, x):
        return m.box_predictor(m.box_head(x))

    fc_fn = jax.jit(lambda v, x: model.apply(v, x, method=_fc))

    @jax.jit
    def nms_fn(probs, boxes_per_class):
        flat_scores = probs.reshape(bsz, -1)
        flat_scores = jnp.where(flat_scores > model.score_thresh,
                                flat_scores, -jnp.inf)
        flat_boxes = boxes_per_class.reshape(bsz, -1, 4)
        flat_cls = jnp.tile(jnp.arange(ncls), n)
        k = min(RPN_POST_NMS_TOPK, flat_scores.shape[1])
        cand_scores, idx = jax.lax.top_k(flat_scores, k)
        cand_boxes = jnp.take_along_axis(flat_boxes, idx[..., None], axis=1)
        cand_cls = flat_cls[idx]
        kept = jax.vmap(
            lambda b, s, c_: batched_nms(b, s, c_, ROI_NMS_THRESH))(
            cand_boxes, cand_scores, cand_cls)
        det_scores, didx = jax.lax.top_k(kept, DETECTIONS_PER_IMAGE)
        return (jnp.take_along_axis(cand_boxes, didx[..., None], axis=1),
                det_scores, jnp.take_along_axis(cand_cls, didx, axis=1))

    pooled, t_roi = bench("  box roialign only", roi_fn, pyramid, props)
    flatp = pooled.reshape((bsz * n,) + pooled.shape[2:])
    (fc_scores, fc_deltas), t_fc = bench("  box fc heads only", fc_fn,
                                         variables, flatp)
    probs = jax.nn.softmax(fc_scores, axis=-1)[:, :ncls].reshape(bsz, n, ncls)
    probs = probs * jnp.isfinite(pscores)[..., None]
    bpc = clip_boxes(apply_deltas(
        fc_deltas.reshape(bsz, n, ncls, 4), props[:, :, None, :],
        weights=BOX_REG_WEIGHTS), h, w)
    _, t_nms = bench("  box nms+topk only", nms_fn, probs, bpc)
    print(f"{'  box sub-stage sum':24s} {t_roi + t_fc + t_nms:8.1f} ms "
          f"(fused box stage {t_box:.1f})")

    # overflow population among proposals (box stage ROIAlign)
    from peanut_tpu.models.roi_align import (assign_fpn_levels,
                                             _cell_area_bound, _ceil8)
    pr = np.asarray(props.reshape(-1, 4), np.float64)
    lv = np.asarray(assign_fpn_levels(jnp.asarray(pr)))
    strides = np.array(FPN_STRIDES[:4], np.float64)[lv]
    spans = np.stack([(pr[:, 2] - pr[:, 0]) / strides,
                      (pr[:, 3] - pr[:, 1]) / strides], 1)
    coarse = max(-(-h // 32), -(-w // 32))
    ab = _cell_area_bound(FPN_STRIDES[:4])
    win = _ceil8(max(coarse + 4, np.sqrt(ab) + 4))
    over = (spans > win - 3).any(axis=1)
    print(f"proposal overflow: {over.sum()}/{len(pr)} "
          f"(win={win}, spans p99={np.percentile(spans.max(1), 99):.1f})")
    mb = np.asarray(boxes.reshape(-1, 4), np.float64)
    lv = np.asarray(assign_fpn_levels(jnp.asarray(mb)))
    strides = np.array(FPN_STRIDES[:4], np.float64)[lv]
    spans = np.stack([(mb[:, 2] - mb[:, 0]) / strides,
                      (mb[:, 3] - mb[:, 1]) / strides], 1)
    over = (spans > win - 3).any(axis=1)
    print(f"detection overflow: {over.sum()}/{len(mb)}")


if __name__ == "__main__":
    main()
