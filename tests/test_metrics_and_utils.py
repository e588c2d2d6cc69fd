"""Metrics (mIoU/mDice/mFscore), visualization render, and profiler tests."""

import numpy as np
import pytest

from peanut_tpu.prediction.metrics import (
    intersect_and_union, eval_metrics, pre_eval_to_metrics, EvalHook)
from peanut_tpu.utils.profiler import StageTimer, flops_estimate


def test_intersect_and_union_basic():
    pred = np.array([[0, 1], [1, 2]])
    label = np.array([[0, 1], [2, 2]])
    inter, union, parea, larea = intersect_and_union(pred, label, 3)
    np.testing.assert_array_equal(inter, [1, 1, 1])
    np.testing.assert_array_equal(parea, [1, 2, 1])
    np.testing.assert_array_equal(larea, [1, 1, 2])
    np.testing.assert_array_equal(union, [1, 2, 2])


def test_eval_metrics_perfect_prediction():
    label = np.random.RandomState(0).randint(0, 4, (10, 10))
    m = eval_metrics([label], [label], 4, metrics=("mIoU", "mDice", "mFscore"))
    np.testing.assert_allclose(m["IoU"], 1.0)
    np.testing.assert_allclose(m["Dice"], 1.0)
    np.testing.assert_allclose(m["Fscore"], 1.0)
    assert float(m["aAcc"]) == 1.0


def test_eval_metrics_known_values():
    pred = np.array([[0, 0, 1, 1]])
    label = np.array([[0, 1, 1, 1]])
    m = eval_metrics([pred], [label], 2, metrics=("mIoU",))
    # class 0: I=1 U=2; class 1: I=2 U=3
    np.testing.assert_allclose(m["IoU"], [0.5, 2 / 3])
    assert float(m["aAcc"]) == 0.75


def test_ignore_index_excluded():
    pred = np.array([[0, 1]])
    label = np.array([[0, 255]])
    inter, union, _, larea = intersect_and_union(pred, label, 2)
    assert larea.sum() == 1


def test_pre_eval_protocol_matches_batch():
    rng = np.random.RandomState(1)
    preds = [rng.randint(0, 3, (8, 8)) for _ in range(5)]
    labels = [rng.randint(0, 3, (8, 8)) for _ in range(5)]
    batch = eval_metrics(preds, labels, 3)
    streamed = pre_eval_to_metrics(
        [intersect_and_union(p, l, 3) for p, l in zip(preds, labels)])
    np.testing.assert_allclose(batch["IoU"], streamed["IoU"], equal_nan=True)


def test_eval_hook_interval():
    calls = []
    hook = EvalHook(lambda state: {"mIoU": 0.5 + 0.01 * len(calls)},
                    interval=5)
    for it in range(1, 16):
        r = hook.maybe_run(it, None)
        if r:
            calls.append(it)
    assert calls == [5, 10, 15]
    assert len(hook.history) == 3


def test_stage_timer():
    t = StageTimer()
    for _ in range(3):
        with t.stage("a"):
            pass
    s = t.summary()
    assert s["a"]["count"] == 3
    assert "a" in t.report()


def test_flops_estimate():
    import jax.numpy as jnp

    f = flops_estimate(lambda x: x @ x, jnp.zeros((64, 64)))
    if f is not None:  # cost analysis availability is backend-dependent
        assert f >= 2 * 64 ** 3 * 0.9


def test_visualizer_renders(tmp_path):
    from peanut_tpu.config import NavConfig
    from peanut_tpu.utils.visualization import EpisodeVisualizer

    cfg = NavConfig(visualize=2, dump_location=str(tmp_path),
                    map_size_cm=1200, global_downscaling=2)
    vis = EpisodeVisualizer(cfg)
    vis.reset()
    lw = cfg.local_w
    rng = np.random.RandomState(0)
    p_input = {
        "obstacle": (rng.rand(lw, lw) > 0.9).astype(float),
        "exp_pred": (rng.rand(lw, lw) > 0.5).astype(float),
        "pose_pred": np.array([6.0, 6.0, 30.0, 0, lw, 0, lw]),
        "goal": np.zeros((lw, lw)),
        "sem_map_pred": rng.randint(0, 10, (lw, lw)),
    }
    p_input["goal"][50, 50] = 1
    frame = vis.render(p_input, np.zeros((480, 640, 3), np.uint8),
                       np.zeros((cfg.map_size, cfg.map_size)),
                       np.zeros((cfg.map_size, cfg.map_size)), (40, 40),
                       target_pred=rng.rand(lw, lw),
                       value=rng.rand(lw, lw), dd_wt=rng.rand(lw, lw),
                       goal_name="chair")
    assert frame.shape == (600, 1415, 3)
    vis.show_or_dump(frame)
    import glob
    assert glob.glob(str(tmp_path) + "/dump/**/*.jpg", recursive=True)


# ---- layer-decay optimizer constructor (mmseg LearningRateDecay twin) ----

def test_layer_decay_optimizer():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from peanut_tpu.prediction.optimizers import (
        layer_decay_scales, make_layer_decay_optimizer, vit_layer_id)

    params = {
        "backbone": {
            "pos_embed": jnp.zeros((1, 10, 8)),
            "patch_embed": {"conv": {"kernel": jnp.zeros((4, 4, 3, 8)),
                                     "bias": jnp.zeros(8)}},
            "block0": {"attn": {"qkv": {"kernel": jnp.zeros((8, 24)),
                                        "bias": jnp.zeros(24)}}},
            "block2": {"mlp": {"fc1": {"kernel": jnp.zeros((8, 16))}}},
        },
        "decode_head": {"conv_seg": {"kernel": jnp.zeros((1, 1, 8, 6)),
                                     "bias": jnp.zeros(6)}},
    }
    num_layers, rate = 3, 0.5
    total = num_layers + 2
    scales = layer_decay_scales(params, rate, num_layers)
    # embeddings -> layer 0 -> rate^(total-1); block i -> i+1; head -> total-1
    assert np.isclose(scales["backbone"]["pos_embed"], rate ** (total - 1))
    assert np.isclose(
        scales["backbone"]["block0"]["attn"]["qkv"]["kernel"],
        rate ** (total - 2))
    assert np.isclose(
        scales["backbone"]["block2"]["mlp"]["fc1"]["kernel"],
        rate ** (total - 4))
    assert np.isclose(scales["decode_head"]["conv_seg"]["kernel"], 1.0)

    tx = make_layer_decay_optimizer(params, 1.0, decay_rate=rate,
                                    num_layers=num_layers, weight_decay=0.0)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # identical unit grads -> update magnitude ratio == lr-scale ratio
    u_blk0 = float(np.abs(updates["backbone"]["block0"]["attn"]["qkv"]
                          ["kernel"][0, 0]))
    u_head = float(np.abs(updates["decode_head"]["conv_seg"]
                          ["kernel"][0, 0, 0, 0]))
    assert np.isclose(u_blk0 / u_head, rate ** (total - 2), atol=1e-5)

    # id rules match the reference's get_layer_id_for_vit
    assert vit_layer_id(["backbone", "cls_token"], total) == 0
    assert vit_layer_id(["backbone", "block1", "w"], total) == 2
    assert vit_layer_id(["decode_head", "w"], total) == total - 1
