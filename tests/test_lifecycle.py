"""End-to-end framework lifecycle: collect maps -> train -> publish -> serve.

The complete PEANUT workflow a reference user runs across three entry
points — collect semantic-map training data (ref nav/collect_maps.py),
train the prediction model on them (ref prediction/
train_prediction_model.py), publish the weights as a torch .pth
(ref ships nav/pred_model_wts.pth), and navigate with them (ref
nav/collect.py) — driven end-to-end at test geometry through THIS
framework's entry points.  Every hand-off uses the real artifact format:
uint8 (20,14,H,W) .npz maps through the reference save gate, an orbax
training checkpoint, the .pth interchange file, and PredictionModel's
torch importer (the same code path that loads the reference weights).
"""

import glob
import os

import numpy as np
import pytest

from peanut_tpu.envs import FakeNavEnv
from peanut_tpu.envs.batch_runner import BatchRunner
from peanut_tpu.prediction import PredictionModel

from test_agent_e2e import small_cfg

BASE = 8  # narrow PSPNet-R50: full architecture, test-box-sized tensors


def tiny_model_cfg():
    return dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNetV1c", depth=50, num_stages=4,
                      out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                      strides=(1, 2, 1, 1), contract_dilation=True,
                      base_channels=BASE, stem_channels=BASE,
                      in_channels=14),
        decode_head=dict(type="PSPHead", in_channels=BASE * 32, in_index=3,
                         channels=BASE * 8, pool_scales=(1, 2, 3, 6),
                         dropout_ratio=0.1, num_classes=6,
                         align_corners=False),
        auxiliary_head=dict(type="FCNHead", in_channels=BASE * 16,
                            in_index=2, channels=BASE * 4, num_convs=1,
                            concat_input=False, dropout_ratio=0.1,
                            num_classes=6, align_corners=False),
        test_cfg=dict(mode="whole"),
    )


# the golden-map geometry: known to pass the reference save gate
# (semantics seen + >4000 explored cells) on FakeNavEnv — see
# tests/test_golden_maps.py
COLLECT_ARGS = [
    "--env_frame_width", "64", "--env_frame_height", "48",
    "--frame_width", "64", "--frame_height", "48",
    "--map_size_cm", "3840", "--map_resolution", "5",
    "--global_downscaling", "2", "--vision_range", "90",
    "--prediction_window", "240", "--use_gt_seg", "2",
    "--max_episode_length", "100", "--timestep_limit", "100",
    "--num_local_steps", "6", "--update_goal_freq", "4",
    "--only_explore", "1", "--fake_env", "1",
    "--cat_pred_threshold", "1.0",
    "--num_episodes", "1", "--split", "train",
]


@pytest.mark.slow
def test_runtime_checkpoint_resume(tmp_path):
    """Elastic serving: kill a batched run mid-episode, restore the
    checkpoint into a FRESH runtime, and the action streams continue
    bit-identically to an uninterrupted twin.  Doubles as a completeness
    proof for the runtime's cross-tick state inventory — any state
    missing from save/load diverges the actions."""
    from test_agent_e2e import tiny_prediction_model

    cfg = small_cfg(switch_step=0)   # prediction-mode state in the ckpt
    pm = tiny_prediction_model(cfg)
    n, first, total = 2, 8, 16

    def fresh_envs():
        return [FakeNavEnv(cfg, size_m=10.0, seed=s, max_steps=total + 4)
                for s in (3, 7)]

    def drive(rt, envs, obs, ticks):
        actions = []
        for _ in range(ticks):
            acts = rt.act_batch(obs)
            actions.append([a["action"] for a in acts])
            obs = [envs[i].step(acts[i]) for i in range(n)]
        return actions, obs

    from peanut_tpu.agent.batched_runtime import BatchedNavRuntime

    # uninterrupted twin
    envs = fresh_envs()
    rt = BatchedNavRuntime(cfg, n, prediction_model=pm)
    obs = [e.reset() for e in envs]
    for i in range(n):
        rt.reset_env(i)
    want, _ = drive(rt, envs, obs, total)

    # checkpointed run: same seeds, save after `first` ticks, resume on a
    # brand-new runtime object
    envs = fresh_envs()
    rt1 = BatchedNavRuntime(cfg, n, prediction_model=pm)
    obs = [e.reset() for e in envs]
    for i in range(n):
        rt1.reset_env(i)
    got_a, obs = drive(rt1, envs, obs, first)
    ckpt = str(tmp_path / "episodes.npz")
    rt1.save_episode_state(ckpt)
    del rt1

    rt2 = BatchedNavRuntime(cfg, n, prediction_model=pm)
    rt2.load_episode_state(ckpt)
    got_b, _ = drive(rt2, envs, obs, total - first)

    assert got_a + got_b == want


@pytest.mark.slow
def test_collect_train_publish_serve(tmp_path):
    # ---- 1. collect training maps through the real save gate ----------
    from peanut_tpu.cli import collect_maps

    data_root = tmp_path / "saved_maps"
    collect_maps.main(COLLECT_ARGS + ["--out_dir", str(data_root)])
    files = sorted(glob.glob(str(data_root / "train_80" / "*.npz")))
    assert files, "save gate rejected the collection episode"
    maps = np.load(files[0])["maps"]
    assert maps.dtype == np.uint8 and maps.shape[:2] == (20, 14)

    # ---- 2. train the prediction model on them via the CLI ------------
    from peanut_tpu.cli import train_prediction_model
    from peanut_tpu.core.config_file import dump_config

    cfg_file = tmp_path / "tiny_pspnet.py"
    dump_config({"model": tiny_model_cfg()}, str(cfg_file))
    work_dir = tmp_path / "work"
    train_prediction_model.main([
        "--data_root", str(data_root), "--img_dir", "train_80",
        "--work_dir", str(work_dir), "--max_iters", "4",
        "--batch_size", "2", "--crop_size", "128", "--num_workers", "1",
        "--checkpoint_interval", "2", "--log_interval", "1",
        "--config", str(cfg_file)])

    # ---- 3. publish the trained weights as a torch .pth ---------------
    from peanut_tpu.core.checkpoint import (
        export_encoder_decoder_to_torch, find_latest_checkpoint,
        load_checkpoint)

    ckpt = find_latest_checkpoint(str(work_dir))
    assert ckpt, "training produced no checkpoint"
    tree, step = load_checkpoint(ckpt)
    assert step == 4
    variables = {"params": tree["params"],
                 "batch_stats": tree["batch_stats"]}
    pth = tmp_path / "trained_pred_model.pth"
    export_encoder_decoder_to_torch(variables, str(pth))

    # ---- 4. navigate with the published weights ------------------------
    # PredictionModel imports the .pth through the SAME converter that
    # loads the reference's pred_model_wts.pth (core/checkpoint.py)
    nav_cfg = small_cfg(switch_step=0, pred_model_wts=str(pth))
    pm = PredictionModel(nav_cfg, model_cfg=tiny_model_cfg(),
                         input_size=nav_cfg.prediction_window)

    runner = BatchRunner(
        nav_cfg,
        [lambda s=s: FakeNavEnv(nav_cfg, size_m=10.0, seed=s, max_steps=24)
         for s in (3, 7)],
        prediction_model=pm)
    runner.reset_all()
    pred_seen = 0.0
    episodes_done = 0
    for _ in range(28):
        episodes_done += runner.tick()
        # probe mid-run: episode resets zero the device state at the end
        pred_seen = max(pred_seen, float(
            np.asarray(runner.runtime.state.target_pred).max()))
        if episodes_done >= 2:
            break
    assert len(runner.metrics) >= 2
    assert all("success" in m and "spl" in m for m in runner.metrics)
    # the trained net actually drove goal selection: prediction-mode ticks
    # fill the device-resident target-probability field (sigmoid output,
    # so any executed prediction leaves strictly positive mass)
    assert pred_seen > 0.0
