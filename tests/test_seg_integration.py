"""Navigation-quality bar through the REAL device segmenter program
(VERDICT r3 item 7).

Both nav-quality tiers run `use_gt_seg=1` and the detect-pipeline test
uses a contract twin, so a regression in `MaskRCNNSegmenter`'s fused
device program (preprocess -> chunked detect -> mask paste -> gated
accumulation, mask_rcnn_segmenter.py seg_program) previously shipped
without failing a test.  This suite drives that program end-to-end with
only the detect SUB-stage swapped for a deterministic synthetic head: the
head decodes FakeNavEnv's category-coded RGB rectangles (fake.py:175-176,
color = (40+20c, 200-15c, 40)) from the ALREADY-preprocessed image — so
the real shortest-edge-800 resize, BGR + mean-subtract preprocessing,
chunking via lax.map, 28x28 bilinear mask pasting, score/goal gates and
per-class accumulation all stay live in the measured episodes.

If any of those stages corrupts geometry (resize coordinate convention,
paste alignment, gate logic, chunk reshape), the decoded masks land in the
wrong place and the navigation bar fails.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from peanut_tpu.envs.batch_runner import BatchRunner
from peanut_tpu.models.mask_rcnn import PIXEL_MEAN_BGR
from peanut_tpu.perception.mask_rcnn_segmenter import MaskRCNNSegmenter

from test_agent_e2e import small_cfg, tiny_prediction_model
from test_nav_quality import MAX_STEPS, SEEDS, make_env


class SyntheticHeadSegmenter(MaskRCNNSegmenter):
    """Real seg program; detect stage = color-decode of FakeNavEnv's
    category rectangles.  One detection per category per image, box from
    the decoded pixel bounding box in resized-frame coordinates (the
    contract detect_batch's boxes follow), full-box 28x28 masks."""

    N_CATS = 9

    def __init__(self, cfg):
        super().__init__(cfg, variables={"params": {
            "unused": np.zeros(1, np.float32)}})

    def _detect_stage(self, variables, imgs):
        # imgs: (chunk, ph, pw, 3) BGR, mean-subtracted, serve dtype
        mean = jnp.asarray(PIXEL_MEAN_BGR, imgs.dtype)
        bgr = imgs + mean                                # undo preprocess
        cats = np.arange(self.N_CATS)
        # FakeNavEnv paints RGB (40+20c, 200-15c, 40) -> BGR order
        targets = jnp.asarray(
            np.stack([[40.0, 200.0 - 15 * c, 40.0 + 20 * c] for c in cats]),
            imgs.dtype)                                  # (9, 3)
        # (chunk, 9, ph, pw): within-tolerance match of every channel
        close = (jnp.abs(bgr[:, None] - targets[None, :, None, None])
                 < 8.0).all(-1)
        ph, pw = imgs.shape[1], imgs.shape[2]
        ys = jnp.arange(ph, dtype=jnp.float32)
        xs = jnp.arange(pw, dtype=jnp.float32)
        big = jnp.float32(ph + pw)
        any_ = close.any(axis=(2, 3))                    # (chunk, 9)
        y1 = jnp.min(jnp.where(close.any(3), ys, big), axis=2)
        y2 = jnp.max(jnp.where(close.any(3), ys, -1.0), axis=2) + 1.0
        x1 = jnp.min(jnp.where(close.any(2), xs, big), axis=2)
        x2 = jnp.max(jnp.where(close.any(2), xs, -1.0), axis=2) + 1.0
        boxes = jnp.stack([x1, y1, x2, y2], axis=-1)     # (chunk, 9, 4)
        scores = jnp.where(any_, 0.99, 0.0)
        classes = jnp.broadcast_to(jnp.asarray(cats, jnp.int32),
                                   scores.shape)
        masks = jnp.ones(scores.shape + (28, 28), jnp.float32)
        return {"boxes": boxes.astype(jnp.float32),
                "scores": scores.astype(jnp.float32),
                "classes": classes, "masks": masks}


def seg_cfg(**kw):
    base = dict(use_gt_seg=0, vision_range=60, goal_erode=0,
                cat_pred_threshold=1.0, max_episode_length=MAX_STEPS + 10,
                timestep_limit=MAX_STEPS + 10, seg_batch_chunk=4)
    base.update(kw)
    return small_cfg(**base)


def test_synthetic_head_matches_gtsem_single_frame():
    """Unit-level: the device seg program's output over one FakeNavEnv
    frame must match the env's own gtsem at the strided sample grid —
    the whole preprocess -> decode -> paste chain is geometry-true."""
    cfg = seg_cfg()
    env = make_env(cfg, SEEDS[0])
    obs = env.reset()
    # spin until an object is visible (some seeds start facing a wall)
    for a in [3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3]:
        if obs["gtsem"].sum() > 0:
            break
        obs = env.step(a)
    assert obs["gtsem"].sum() > 0, "no object visible after a full spin"

    seg = SyntheticHeadSegmenter(cfg)
    sem = np.asarray(seg.batch_device(
        np.asarray(obs["rgb"], np.uint8)[None],
        [int(np.asarray(obs["objectgoal"])[0])]))[0]     # (n_sem, fh, fw)
    ds = cfg.env_frame_width // cfg.frame_width
    gt = obs["gtsem"][ds // 2::ds, ds // 2::ds].transpose(2, 0, 1)

    inter = np.logical_and(sem[:9] > 0.5, gt[:9] > 0.5).sum()
    union = np.logical_or(sem[:9] > 0.5, gt[:9] > 0.5).sum()
    assert union > 0
    iou = inter / union
    assert iou > 0.8, f"device seg program IoU vs gtsem = {iou:.3f}"


# committed bar: same seeds/geometry as the gt-seg LOS tier
# (test_nav_quality.SUCCESS_BAR); the decoded masks are gtsem modulo ~1
# resized pixel, so the same navigation outcome is expected
SUCCESS_BAR = 0.75
SPL_BAR = 0.3


@pytest.mark.slow
def test_navigation_bar_through_device_seg_program():
    cfg = seg_cfg()
    pm = tiny_prediction_model(cfg)
    runner = BatchRunner(
        cfg, [lambda s=s: make_env(cfg, s) for s in SEEDS],
        prediction_model=pm, segmenter=SyntheticHeadSegmenter(cfg))
    runner.run(max_ticks=MAX_STEPS + 4, max_episodes=len(SEEDS))
    metrics = runner.metrics[:len(SEEDS)]
    assert len(metrics) >= len(SEEDS)
    succ = float(np.mean([m.get("success", 0.0) for m in metrics]))
    spl = float(np.mean([m.get("spl", 0.0) for m in metrics]))
    print(f"\n[nav-quality device-seg tier] success={succ:.3f} "
          f"spl={spl:.3f} "
          f"per-ep={[(m.get('success'), round(m.get('spl', 0), 2)) for m in metrics]}")
    assert succ >= SUCCESS_BAR, (
        f"success {succ:.2f} < bar {SUCCESS_BAR}: "
        f"{[m.get('success') for m in metrics]}")
    assert spl >= SPL_BAR, f"spl {spl:.3f} < bar {SPL_BAR}"
