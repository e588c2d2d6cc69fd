"""Device mask-paste path vs the host postprocess (MaskRCNNSegmenter).

The batched runtime pastes Mask R-CNN detections into the (n_sem, fh, fw)
stack fully on device (batch_device); the single-env path does it on host
with cv2 (segmentation.py accumulate_instances semantics).  Both must agree
at the mapper's strided sample grid.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from peanut_tpu.config import NavConfig
from peanut_tpu.perception.mask_rcnn_segmenter import MaskRCNNSegmenter
from peanut_tpu.models.mask_rcnn import MaskRCNN


@pytest.fixture(scope="module")
def segmenter():
    import jax

    cfg = NavConfig(use_gt_seg=0, num_sem_categories=10)
    model = MaskRCNN(num_classes=9, depth=50)
    # tiny random variables: we bypass detect and test the paste path only,
    # so init at a small geometry to keep CPU cost down
    img = jnp.zeros((64, 96, 3), jnp.float32)
    variables = jax.jit(
        lambda r, x: model.init(r, x, method=model.detect))(
        jax.random.PRNGKey(0), img)
    seg = MaskRCNNSegmenter(cfg, variables=variables)
    seg._seg_program = seg._build_seg_program()  # builds _paste_jit
    return cfg, seg


def _synth_dets(rng, n_det, rh, rw):
    boxes = np.zeros((n_det, 4), np.float32)
    boxes[:, 0] = rng.rand(n_det) * (rw - 80)
    boxes[:, 1] = rng.rand(n_det) * (rh - 80)
    boxes[:, 2] = boxes[:, 0] + 20 + rng.rand(n_det) * 220
    boxes[:, 3] = boxes[:, 1] + 20 + rng.rand(n_det) * 220
    boxes[:, 2] = np.minimum(boxes[:, 2], rw - 1)
    boxes[:, 3] = np.minimum(boxes[:, 3], rh - 1)
    scores = 0.9 + rng.rand(n_det) * 0.1
    scores[rng.rand(n_det) < 0.2] = -np.inf        # padded slots
    classes = rng.randint(0, 9, n_det)
    masks = rng.rand(n_det, 28, 28).astype(np.float32)
    # structured blob so the 0.5 threshold has clean crossings
    yy, xx = np.mgrid[0:28, 0:28]
    blob = np.exp(-(((yy - 14) / 8.0) ** 2 + ((xx - 14) / 8.0) ** 2))
    masks = 0.5 * masks + blob[None] * 0.7
    return boxes, scores, classes, masks


def test_device_paste_matches_host_postprocess(segmenter, rng):
    cfg, seg = segmenter
    n_env, n_det = 3, 24
    goal_cats = np.array([2, 5, 2], np.int32)

    dets_np = [_synth_dets(rng, n_det, seg.rh, seg.rw) for _ in range(n_env)]
    boxes = np.stack([d[0] for d in dets_np])
    scores = np.stack([d[1] for d in dets_np])
    classes = np.stack([d[2] for d in dets_np])
    masks = np.stack([d[3] for d in dets_np])

    got = np.asarray(seg._paste_jit(
        jnp.asarray(boxes), jnp.asarray(scores),
        jnp.asarray(classes.astype(np.int32)), jnp.asarray(masks),
        jnp.asarray(goal_cats)))                     # (B, n_cats, fh, fw)

    ds = cfg.env_frame_width // cfg.frame_width
    mismatch = 0
    total = 0
    for i in range(n_env):
        det = {"boxes": boxes[i], "scores": scores[i],
               "classes": classes[i], "masks": masks[i]}
        host = seg._postprocess((cfg.env_frame_height, cfg.env_frame_width),
                                det, int(goal_cats[i]))
        host_sub = host[ds // 2::ds, ds // 2::ds, :9].transpose(2, 0, 1)
        # cv2 fixed-point interpolation can flip pixels whose bilinear
        # value sits exactly at the 0.5 threshold; allow a tiny fraction
        mismatch += int((np.abs(got[i] - host_sub) > 0.5).sum())
        total += host_sub.size
    assert mismatch / total < 2e-3, f"{mismatch}/{total} pixels differ"


def test_device_paste_gates(segmenter):
    """Score gates: 0.95 general, 0.985 for the goal category."""
    cfg, seg = segmenter
    boxes = np.array([[[10, 10, 200, 200]] * 3], np.float32)
    scores = np.array([[0.96, 0.96, 0.99]], np.float32)
    classes = np.array([[1, 2, 2]], np.int32)
    masks = np.ones((1, 3, 28, 28), np.float32)
    got = np.asarray(seg._paste_jit(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        jnp.asarray(masks), jnp.asarray(np.array([2], np.int32))))[0]
    assert got[1].max() == 1.0          # non-goal cat at 0.96 passes
    assert got[2].max() == 1.0          # goal cat at 0.99 passes
    # the goal-cat det at 0.96 must have been gated out (only ONE goal det
    # survives -> max accumulation is exactly 1, not 2)
    assert got[2].max() < 2.0
