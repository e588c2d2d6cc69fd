"""Mask R-CNN component parity (vs torchvision oracles) + pipeline smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from peanut_tpu.models.boxes import (
    apply_deltas, nms_fixed, batched_nms, pairwise_iou,
    generate_cell_anchors, anchors_for_level)
from peanut_tpu.models.roi_align import multilevel_roi_align, assign_fpn_levels
from peanut_tpu.models.mask_rcnn import MaskRCNN
from peanut_tpu.models.d2_import import convert_d2_maskrcnn_state
from peanut_tpu.perception.mask_rcnn_segmenter import (
    resize_shortest_edge, pad_to_multiple)

torch = pytest.importorskip("torch")


def np_box_iou(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area = lambda x: (x[:, 2] - x[:, 0]) * (x[:, 3] - x[:, 1])
    union = area(a)[:, None] + area(b)[None, :] - inter
    return np.where(union > 0, inter / union, 0.0)


def np_nms(boxes, scores, iou_t):
    """Greedy NMS oracle (torchvision semantics)."""
    order = np.argsort(-scores)
    keep = []
    while len(order):
        i = order[0]
        keep.append(i)
        if len(order) == 1:
            break
        ious = np_box_iou(boxes[i:i + 1], boxes[order[1:]])[0]
        order = order[1:][ious <= iou_t]
    return np.array(keep)


def np_roi_align(feat_chw, boxes, spatial_scale, out_size, sampling_ratio):
    """Aligned ROIAlign oracle (torchvision aligned=True semantics)."""
    c, fh, fw = feat_chw.shape
    n = len(boxes)
    out = np.zeros((n, c, out_size, out_size), np.float32)

    def bilinear(y, x):
        y = np.clip(y, 0, fh - 1)
        x = np.clip(x, 0, fw - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, fh - 1), min(x0 + 1, fw - 1)
        wy, wx = y - y0, x - x0
        return (feat_chw[:, y0, x0] * (1 - wy) * (1 - wx)
                + feat_chw[:, y0, x1] * (1 - wy) * wx
                + feat_chw[:, y1, x0] * wy * (1 - wx)
                + feat_chw[:, y1, x1] * wy * wx)

    for bi, (bx1, by1, bx2, by2) in enumerate(boxes):
        x1 = bx1 * spatial_scale - 0.5
        y1 = by1 * spatial_scale - 0.5
        x2 = bx2 * spatial_scale - 0.5
        y2 = by2 * spatial_scale - 0.5
        roi_w = x2 - x1
        roi_h = y2 - y1
        bw = roi_w / out_size
        bh = roi_h / out_size
        # d2/torchvision adaptive grid when sampling_ratio <= 0
        gx = sampling_ratio if sampling_ratio > 0 else max(
            1, int(np.ceil(roi_w / out_size)))
        gy = sampling_ratio if sampling_ratio > 0 else max(
            1, int(np.ceil(roi_h / out_size)))
        for i in range(out_size):
            for j in range(out_size):
                acc = np.zeros(c, np.float32)
                for sy in range(gy):
                    for sx in range(gx):
                        yy = y1 + (i + (sy + 0.5) / gy) * bh
                        xx = x1 + (j + (sx + 0.5) / gx) * bw
                        acc += bilinear(yy, xx)
                out[bi, :, i, j] = acc / max(gx * gy, 1)
    return out


def random_boxes(rng, n, size=100.0):
    xy = rng.rand(n, 2) * size
    wh = rng.rand(n, 2) * size * 0.4 + 2
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_pairwise_iou_matches_torchvision(rng):
    a = random_boxes(rng, 12)
    b = random_boxes(rng, 7)
    want = np_box_iou(a, b)
    got = np.asarray(pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("iou_t", [0.5, 0.7])
def test_nms_matches_torchvision(rng, iou_t):
    boxes = random_boxes(rng, 60)
    scores = rng.rand(60).astype(np.float32)
    want_keep = np_nms(boxes, scores, iou_t)
    kept_scores = np.asarray(nms_fixed(jnp.asarray(boxes),
                                       jnp.asarray(scores), iou_t))
    got_keep = np.where(np.isfinite(kept_scores))[0]
    assert set(got_keep) == set(want_keep)


def test_batched_nms_matches_torchvision(rng):
    boxes = random_boxes(rng, 50)
    scores = rng.rand(50).astype(np.float32)
    idxs = rng.randint(0, 4, 50)
    want = np.concatenate([
        np.where(idxs == c)[0][np_nms(boxes[idxs == c], scores[idxs == c], 0.5)]
        for c in np.unique(idxs)])
    kept = np.asarray(batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                  jnp.asarray(idxs), 0.5))
    assert set(np.where(np.isfinite(kept))[0]) == set(want)


def test_apply_deltas_matches_reference_formula(rng):
    boxes = random_boxes(rng, 20)
    deltas = (rng.randn(20, 4) * 0.2).astype(np.float32)
    w = (10.0, 10.0, 5.0, 5.0)
    got = np.asarray(apply_deltas(jnp.asarray(deltas), jnp.asarray(boxes),
                                  weights=w))
    # independent numpy oracle of the d2 Box2BoxTransform
    widths = boxes[:, 2] - boxes[:, 0]
    heights = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + 0.5 * widths
    cy = boxes[:, 1] + 0.5 * heights
    dx, dy, dw, dh = (deltas[:, i] / w[i] for i in range(4))
    pcx = dx * widths + cx
    pcy = dy * heights + cy
    pw = np.exp(dw) * widths
    ph = np.exp(dh) * heights
    want = np.stack([pcx - pw / 2, pcy - ph / 2,
                     pcx + pw / 2, pcy + ph / 2], 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_anchors_match_expected_layout():
    cell = generate_cell_anchors((32,), (0.5, 1.0, 2.0))
    assert cell.shape == (3, 4)
    # ratio 1.0 -> square 32x32 centred at 0
    np.testing.assert_allclose(cell[1], [-16, -16, 16, 16])
    a = anchors_for_level(2, 3, 4, cell)
    assert a.shape == (2 * 3 * 3, 4)
    # second cell (x shift 4): anchor 1 centre at (4, 0)
    np.testing.assert_allclose(a[4], [-12, -16, 20, 16])


def test_roi_align_single_level_matches_torchvision(rng):
    feat = rng.rand(1, 16, 24, 20).astype(np.float32)  # NCHW for torch
    boxes = np.array([[4.0, 4.0, 40.0, 28.0],
                      [0.0, 0.0, 90.0, 60.0],
                      [10.0, 6.0, 25.0, 30.0]], np.float32)
    # single-level pyramid: force level assignment to 0 by replicating
    feats = [jnp.asarray(feat[0].transpose(1, 2, 0))] * 4
    for ratio in (2, 0):  # fixed grid and d2 adaptive (the serving default)
        want = np_roi_align(feat[0], boxes, 1.0 / 4, 7, ratio)
        got = np.asarray(multilevel_roi_align(feats, jnp.asarray(boxes),
                                              (4, 4, 4, 4), 7,
                                              sampling_ratio=ratio))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                                   rtol=1e-4, atol=1e-4)


def test_roi_align_adaptive_matches_torchvision_exactly(rng):
    """Direct oracle: torchvision.ops.roi_align(sampling_ratio=-1,
    aligned=True) == detectron2 ROIAlignV2 ratio-0 (PARITY.md delta #2)."""
    torchvision = pytest.importorskip("torchvision")

    feat = rng.rand(1, 4, 24, 32).astype(np.float32)
    boxes = np.array([[4.0, 4.0, 40.0, 28.0],
                      [0.0, 0.0, 90.0, 60.0],
                      [3.0, 2.0, 120.0, 90.0],
                      [10.0, 6.0, 25.0, 30.0]], np.float32)
    rois = torch.cat([torch.zeros(len(boxes), 1),
                      torch.from_numpy(boxes)], dim=1)
    want = torchvision.ops.roi_align(
        torch.from_numpy(feat), rois, output_size=7, spatial_scale=1.0 / 4,
        sampling_ratio=-1, aligned=True).numpy()

    feats = [jnp.asarray(feat[0].transpose(1, 2, 0))] * 4
    got = np.asarray(multilevel_roi_align(feats, jnp.asarray(boxes),
                                          (4, 4, 4, 4), 7,
                                          sampling_ratio=0))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)


def np_multilevel_roi_align(feats_chw, boxes, strides, out_size):
    """Per-ROI oracle: d2 level assignment + single-level adaptive align."""
    area = (np.maximum(boxes[:, 2] - boxes[:, 0], 0)
            * np.maximum(boxes[:, 3] - boxes[:, 1], 0))
    lvl = np.clip(np.floor(4 + np.log2(np.sqrt(area) / 224.0 + 1e-8)),
                  2, 5).astype(int) - 2
    c = feats_chw[0].shape[0]
    out = np.zeros((len(boxes), c, out_size, out_size), np.float32)
    for i, b in enumerate(boxes):
        li = lvl[i]
        out[i] = np_roi_align(feats_chw[li], b[None], 1.0 / strides[li],
                              out_size, 0)[0]
    return out


def test_roi_align_multilevel_fpn_elongated(rng):
    """Real FPN geometry (strides 4/8/16/32 of ONE image) including
    high-aspect boxes that d2 assigns to fine levels where they span far
    more cells than the coarsest level's extent (round-2 advisor finding:
    such boxes silently pooled to ~0 with a coarse-extent window)."""
    img_h, img_w = 160, 224
    strides = (4, 8, 16, 32)
    feats_chw = [rng.rand(8, img_h // s_, img_w // s_).astype(np.float32)
                 for s_ in strides]
    boxes = np.array([
        [10, 20, 60, 70],     # small square -> level 0, fits square window
        [0, 40, 220, 60],     # 220x20 px -> level 0, 55 cells wide
        [30, 0, 50, 158],     # 20x158 px -> level 0, ~40 cells tall
        [5, 5, 215, 155],     # large box -> coarser level, fits
        [0, 0, 223, 10],      # full-width sliver -> level 0
        [100, 3, 140, 40],    # modest portrait box
    ], np.float32)
    want = np_multilevel_roi_align(feats_chw, boxes, strides, 7)
    feats = [jnp.asarray(f.transpose(1, 2, 0)) for f in feats_chw]
    got = np.asarray(multilevel_roi_align(feats, jnp.asarray(boxes),
                                          strides, 7, sampling_ratio=0))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_roi_align_serving_geometry_elongated(rng):
    """The 800x1088 serving geometry with the advisor's exact failure case
    (a 200x60 px level-0 box spanning 50 cells vs the old win=40) plus the
    mask-head pooled size."""
    strides = (4, 8, 16, 32)
    feats_chw = [rng.rand(4, 800 // s_, 1088 // s_).astype(np.float32)
                 for s_ in strides]
    boxes = np.array([
        [100, 100, 300, 160],   # 200x60 -> level 0, 50 cells wide
        [40, 80, 1060, 140],    # 1020x60 -> level 1, ~127 cells wide
        [500, 30, 560, 780],    # 60x750 -> level 1, ~94 cells tall
        [200, 200, 600, 500],   # large box -> coarse level
        [20, 20, 120, 120],     # 100x100 square -> level 0
    ], np.float32)
    feats = [jnp.asarray(f.transpose(1, 2, 0)) for f in feats_chw]
    for out_size in (7, 14):
        want = np_multilevel_roi_align(feats_chw, boxes, strides, out_size)
        got = np.asarray(multilevel_roi_align(feats, jnp.asarray(boxes),
                                              strides, out_size,
                                              sampling_ratio=0))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                                   rtol=1e-4, atol=1e-4)


def test_roi_align_batched_matches_single(rng):
    """(B, N, 4) batched form == per-image single calls."""
    strides = (4, 8, 16, 32)
    bsz = 3
    feats_b = [jnp.asarray(rng.rand(bsz, 160 // s_, 224 // s_, 6)
                           .astype(np.float32)) for s_ in strides]
    boxes = np.stack([random_boxes(rng, 5, 150.0) for _ in range(bsz)])
    boxes[1, 2] = [0, 40, 220, 60]     # elongated overflow box in image 1
    got = np.asarray(multilevel_roi_align(feats_b, jnp.asarray(boxes),
                                          strides, 7, sampling_ratio=0))
    for b in range(bsz):
        want = np.asarray(multilevel_roi_align(
            [f[b] for f in feats_b], jnp.asarray(boxes[b]), strides, 7,
            sampling_ratio=0))
        np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-5)


def test_fpn_level_assignment():
    boxes = jnp.asarray(np.array([
        [0, 0, 64, 64],      # sqrt(area)=64 -> lvl 2
        [0, 0, 224, 224],    # -> lvl 4
        [0, 0, 512, 512],    # -> lvl 5 (clamped)
        [0, 0, 160, 160],    # floor(4 + log2(160/224)) = 3
    ], np.float32))
    np.testing.assert_array_equal(np.asarray(assign_fpn_levels(boxes)),
                                  [0, 2, 3, 1])


def test_deconv_conversion_matches_torch(rng):
    """flax ConvTranspose with (kh,kw,in,out) kernel == torch ConvTranspose2d
    under the d2_import transpose."""
    from flax import linen as nn

    tdeconv = torch.nn.ConvTranspose2d(6, 4, 2, stride=2)
    x = rng.rand(1, 6, 5, 7).astype(np.float32)
    with torch.no_grad():
        want = tdeconv(torch.from_numpy(x)).numpy()

    w = tdeconv.weight.detach().numpy()
    kernel = np.ascontiguousarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))
    bias = tdeconv.bias.detach().numpy()
    mod = nn.ConvTranspose(4, (2, 2), strides=(2, 2))
    got = mod.apply({"params": {"kernel": jnp.asarray(kernel),
                                "bias": jnp.asarray(bias)}},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)


def test_resize_shortest_edge():
    # the challenge frame: 480x640 -> 800x1067, padded 800x1088
    assert resize_shortest_edge(480, 640) == (800, 1067)
    assert pad_to_multiple(800, 1067) == (800, 1088)


@pytest.fixture(scope="module")
def small_mask_rcnn():
    model = MaskRCNN(num_classes=9, depth=50, score_thresh=0.05)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((128, 160, 3), jnp.float32)
    variables = jax.jit(
        lambda r, x: model.init(r, x, method=model.detect))(rng, img)
    return model, variables


@pytest.mark.slow
def test_mask_rcnn_detect_shapes(small_mask_rcnn, rng):
    model, variables = small_mask_rcnn
    img = jnp.asarray(rng.rand(128, 160, 3).astype(np.float32) * 50)
    out = jax.jit(lambda v, x: model.apply(v, x, method=model.detect))(
        variables, img)
    assert out["boxes"].shape == (100, 4)
    assert out["scores"].shape == (100,)
    assert out["classes"].shape == (100,)
    assert out["masks"].shape == (100, 28, 28)
    finite = np.isfinite(np.asarray(out["scores"]))
    masks = np.asarray(out["masks"])
    assert np.isfinite(masks).all()
    boxes = np.asarray(out["boxes"])[finite]
    if len(boxes):
        assert (boxes[:, 2] >= boxes[:, 0]).all()
        assert (boxes[:, 0] >= 0).all() and (boxes[:, 2] <= 160).all()


@pytest.mark.slow
def test_d2_converter_structure(small_mask_rcnn):
    """Synthetic d2-format state dict converts into the exact init tree."""
    model, init_vars = small_mask_rcnn

    # build a d2-style state dict with shapes derived from the init tree
    sd = {}

    def conv_entry(tkey, fpath, bias=False, bn=None):
        node = init_vars["params"]
        for p in fpath:
            node = node[p]
        sd[tkey + ".weight"] = np.asarray(node["conv"]["kernel"]).transpose(
            3, 2, 0, 1)
        if bias:
            sd[tkey + ".bias"] = np.asarray(node["conv"]["bias"])
        if bn:
            bnode = init_vars["params"]
            for p in bn:
                bnode = bnode[p]
            c = bnode["bn"]["scale"].shape[0]
            sd[tkey + ".norm.weight"] = np.ones(c, np.float32)
            sd[tkey + ".norm.bias"] = np.zeros(c, np.float32)
            sd[tkey + ".norm.running_mean"] = np.zeros(c, np.float32)
            sd[tkey + ".norm.running_var"] = np.ones(c, np.float32)

    conv_entry("backbone.bottom_up.stem.conv1", ("backbone", "conv1"),
               bn=("backbone", "bn1"))
    stage_blocks = {2: 3, 3: 4, 4: 6, 5: 3}
    for s, nb in stage_blocks.items():
        for j in range(nb):
            blk = ("backbone", f"layer{s - 1}_{j}")
            base = f"backbone.bottom_up.res{s}.{j}"
            for ci in (1, 2, 3):
                conv_entry(f"{base}.conv{ci}", blk + (f"conv{ci}",),
                           bn=blk + (f"bn{ci}",))
            node = init_vars["params"]["backbone"][f"layer{s - 1}_{j}"]
            if "downsample_conv" in node:
                conv_entry(f"{base}.shortcut", blk + ("downsample_conv",),
                           bn=blk + ("downsample_bn",))
    for lvl in range(2, 6):
        conv_entry(f"backbone.fpn_lateral{lvl}", ("fpn", f"lateral{lvl}"),
                   bias=True)
        conv_entry(f"backbone.fpn_output{lvl}", ("fpn", f"output{lvl}"),
                   bias=True)
    conv_entry("proposal_generator.rpn_head.conv", ("rpn_head", "conv"),
               bias=True)
    conv_entry("proposal_generator.rpn_head.objectness_logits",
               ("rpn_head", "objectness"), bias=True)
    conv_entry("proposal_generator.rpn_head.anchor_deltas",
               ("rpn_head", "deltas"), bias=True)
    for name in ("fc1", "fc2"):
        k = np.asarray(init_vars["params"]["box_head"][name]["kernel"])
        sd[f"roi_heads.box_head.{name}.weight"] = k.T
        sd[f"roi_heads.box_head.{name}.bias"] = np.asarray(
            init_vars["params"]["box_head"][name]["bias"])
    for name in ("cls_score", "bbox_pred"):
        k = np.asarray(init_vars["params"]["box_predictor"][name]["kernel"])
        sd[f"roi_heads.box_predictor.{name}.weight"] = k.T
        sd[f"roi_heads.box_predictor.{name}.bias"] = np.asarray(
            init_vars["params"]["box_predictor"][name]["bias"])
    for i in range(1, 5):
        conv_entry(f"roi_heads.mask_head.mask_fcn{i}",
                   ("mask_head", f"mask_fcn{i}"), bias=True)
    dk = np.asarray(init_vars["params"]["mask_head"]["deconv"]["kernel"])
    # inverse of the converter's flip+transpose
    sd["roi_heads.mask_head.deconv.weight"] = np.ascontiguousarray(
        dk.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1])
    sd["roi_heads.mask_head.deconv.bias"] = np.asarray(
        init_vars["params"]["mask_head"]["deconv"]["bias"])
    conv_entry("roi_heads.mask_head.predictor", ("mask_head", "predictor"),
               bias=True)

    converted = convert_d2_maskrcnn_state(sd)

    flat_init = jax.tree_util.tree_flatten_with_path(init_vars["params"])[0]
    flat_conv = dict(
        jax.tree_util.tree_flatten_with_path(converted["params"])[0])
    for path, leaf in flat_init:
        assert path in flat_conv, f"missing {path}"
        assert flat_conv[path].shape == leaf.shape, path
        np.testing.assert_allclose(flat_conv[path], np.asarray(leaf),
                                   rtol=1e-6)


def _synthetic_scene(h=128, w=160):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([xx / w * 60, yy / h * 60, (xx + yy) / (h + w) * 60], -1)
    img[30:70, 20:60] += np.array([80.0, -20.0, 30.0])
    img[60:110, 90:140] += np.array([-30.0, 70.0, 40.0])
    return img


@pytest.mark.slow
def test_detect_golden_regression():
    """End-to-end detect() on a fixed synthetic scene with PRNGKey(0)
    weights must match the committed fixture (regression anchor for the
    full pipeline numerics: backbone, FPN, RPN, NMS, ROIAlign, heads).
    Regenerate with scripts/gen_mask_rcnn_golden.py after an INTENDED
    numerics change (and say so in the commit)."""
    import os

    path = os.path.join(os.path.dirname(__file__), "data",
                        "mask_rcnn_golden.npz")
    golden = np.load(path)

    model = MaskRCNN(num_classes=9, depth=50, score_thresh=0.05)
    img = jnp.asarray(_synthetic_scene())
    variables = jax.jit(
        lambda r, x: model.init(r, x, method=model.detect))(
        jax.random.PRNGKey(0), img)
    out = jax.jit(lambda v, x: model.apply(v, x, method=model.detect))(
        variables, img)
    out = {k: np.asarray(v) for k, v in out.items()}

    want_finite = np.isfinite(golden["scores"])
    got_finite = np.isfinite(out["scores"])
    np.testing.assert_array_equal(got_finite, want_finite)
    k = int(want_finite.sum())
    assert k > 0, "fixture has no detections"
    np.testing.assert_allclose(out["scores"][:k], golden["scores"][:k],
                               atol=1e-3)
    np.testing.assert_array_equal(out["classes"][:k], golden["classes"][:k])
    np.testing.assert_allclose(out["boxes"][:k], golden["boxes"][:k],
                               atol=1.0)
    # mask IoU per detection (binarized at 0.5)
    gm = golden["masks"][:k] > 0.5
    om = out["masks"][:k] > 0.5
    inter = (gm & om).sum(axis=(1, 2))
    union = np.maximum((gm | om).sum(axis=(1, 2)), 1)
    assert (inter / union >= 0.97).all()
