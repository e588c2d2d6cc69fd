"""End-to-end agent loop on the synthetic environment.

Covers BASELINE config 4's shape (full episode: seg + map + prediction +
FMM planner loop) without habitat: small geometry, ground-truth segmentation,
and a narrow prediction net.
"""

import numpy as np
import pytest

from peanut_tpu.config import NavConfig
from peanut_tpu.agent import PeanutAgent
from peanut_tpu.envs import FakeNavEnv
from peanut_tpu.prediction import PredictionModel


def small_cfg(**kw):
    base = dict(
        env_frame_width=64, env_frame_height=48,
        frame_width=64, frame_height=48,
        map_size_cm=1200, map_resolution=5, global_downscaling=2,
        vision_range=48, num_sem_categories=10,
        prediction_window=240, use_gt_seg=1,
        max_episode_length=60, timestep_limit=60,
        num_local_steps=10, update_goal_freq=5,
        fmm_sweeps=2,
    )
    base.update(kw)
    return NavConfig(**base)


def tiny_prediction_model(cfg):
    base = 16
    model_cfg = dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNetV1c", depth=50, num_stages=4,
                      out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                      strides=(1, 2, 1, 1), contract_dilation=True,
                      base_channels=base, stem_channels=base, in_channels=14),
        decode_head=dict(type="PSPHead", in_channels=base * 32, in_index=3,
                         channels=base * 8, pool_scales=(1, 2, 3, 6),
                         dropout_ratio=0.1, num_classes=6,
                         align_corners=False),
        test_cfg=dict(mode="whole"),
    )
    return PredictionModel(cfg, model_cfg=model_cfg,
                           input_size=cfg.prediction_window)


@pytest.mark.slow
def test_full_episode_runs():
    cfg = small_cfg()
    env = FakeNavEnv(cfg, size_m=12.0, seed=3, max_steps=40)
    agent = PeanutAgent(cfg, prediction_model=tiny_prediction_model(cfg))

    obs = env.reset()
    agent.reset()
    actions = []
    while not env.episode_over:
        act = agent.act(obs)
        assert act["action"] in (0, 1, 2, 3)
        actions.append(act["action"])
        obs = env.step(act)

    assert len(actions) >= 10
    # the map should have registered exploration and some obstacles
    explored = agent.agent_state.local_map[1].sum()
    assert explored > 50, f"explored only {explored} cells"
    m = env.get_metrics()
    assert "success" in m and "spl" in m


@pytest.mark.slow
def test_explore_only_mode_collects_maps():
    """collect_maps.py path: only_explore=1, preset corner goals, no
    prediction model (reference collect_maps.py:27-29)."""
    cfg = small_cfg(only_explore=1, switch_step=999, global_downscaling=4,
                    use_gt_seg=0, map_size_cm=1600, vision_range=32)
    env = FakeNavEnv(cfg, size_m=12.0, seed=5, max_steps=30)
    agent = PeanutAgent(cfg)
    assert agent.agent_state.prediction_model is None

    obs = env.reset()
    agent.reset()
    steps = 0
    while not env.episode_over:
        obs = env.step(agent.act(obs))
        steps += 1
    full_map = agent.agent_state.full_map
    assert full_map.shape == (14, 320, 320)
    snapshot = (full_map * 255).astype(np.uint8)
    assert snapshot[1].sum() > 0  # explored area recorded
