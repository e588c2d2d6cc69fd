"""Navigation-quality regression bar (VERDICT r2 item 4).

A fixed-seed FakeNavEnv suite with reachable, *geometrically consistent*
targets (objects rendered into depth at their true range, so the mapper
places the goal where it actually is) must reach a committed success rate —
a planner/kernel regression that degrades navigation FAILS a test instead
of only shifting episode metrics nobody asserts on.  Also asserts
batched == single end-of-episode metrics on a shared subset.

Config notes: the goal must be mappable, i.e. inside vision_range when
seen — so the suite spawns goals at 2.2-3.2 m with vision_range 60 cells
(3.0 m).  The local map stays 120^2 (map_size_cm 1200 at downscaling 2,
vision_range <= local/2), which keeps the per-tick FMM cheap enough for
the 1-CPU test box — the 240^2 variant measured ~30 s/tick there.
"""

import numpy as np
import pytest

from peanut_tpu.agent import PeanutAgent
from peanut_tpu.envs import FakeNavEnv
from peanut_tpu.envs.batch_runner import BatchRunner

from test_agent_e2e import small_cfg, tiny_prediction_model

SEEDS = [3, 7, 11, 19, 23, 31, 42, 57]
MAX_STEPS = 100


def quality_cfg():
    # goal_erode=0 + cat_pred_threshold=1: FakeNavEnv objects are flat
    # billboards that splat 1-2 map cells deep, so the reference's 3-step
    # erosion denoiser (tuned for real Mask R-CNN masks) would wipe every
    # correctly-mapped goal; the suite measures navigation, not denoising
    return small_cfg(use_gt_seg=1, vision_range=60,
                     goal_erode=0, cat_pred_threshold=1.0,
                     max_episode_length=MAX_STEPS + 10,
                     timestep_limit=MAX_STEPS + 10)


def make_env(cfg, seed):
    # band 2.0-2.8 m keeps the goal inside the 3.0 m mapping range
    # (vision_range 60 cells) once seen; line-of-sight spawns make the
    # bar measure see->map->plan->stop, not wall-exploration luck
    return FakeNavEnv(cfg, size_m=8.0, seed=seed, max_steps=MAX_STEPS,
                      objects_in_depth=True, goal_min_dist=2.0,
                      goal_max_dist=2.8, goal_line_of_sight=True)


def run_single(cfg, pm, seed):
    env = make_env(cfg, seed)
    agent = PeanutAgent(cfg, prediction_model=pm)
    obs = env.reset()
    agent.reset()
    for _ in range(MAX_STEPS + 4):
        a = agent.act(obs)
        obs = env.step(a)
        if env.episode_over:
            return env.get_metrics()
    return env.get_metrics()


def test_fake_env_spl_softspl_semantics():
    """Habitat metric math: a straight walk to the goal scores SPL ~= 1
    (path ~= shortest), stopping immediately scores SPL 0 but leaves
    SoftSPL defined; a detour shrinks both by d0 / path_length."""
    cfg = quality_cfg()
    env = FakeNavEnv(cfg, size_m=8.0, seed=3, max_steps=100,
                     goal_min_dist=2.0, goal_max_dist=2.8)
    env.reset()
    d0 = env.start_goal_dist
    # turn toward the goal exactly, then walk straight at it
    ang = np.arctan2(env.goal_pos[1] - env.pose[1],
                     env.goal_pos[0] - env.pose[0])
    env.pose[2] = ang
    while np.hypot(*(env.goal_pos - env.pose[:2])) > 0.5 \
            and not env.episode_over:
        prev = env.pose[:2].copy()
        env.step(1)
        if np.allclose(prev, env.pose[:2]):   # blocked by a wall: give up
            pytest.skip("seed spawned a wall on the straight-line path")
    env.step(0)
    m = env.get_metrics()
    assert m["success"] == 1.0
    assert m["spl"] == pytest.approx(d0 / max(env.path_length, d0), abs=1e-6)
    assert m["spl"] > 0.85                     # straight path ~= shortest
    assert m["soft_spl"] == pytest.approx(
        max(0.0, 1.0 - m["distance_to_goal"] / d0)
        * d0 / max(env.path_length, d0), abs=1e-6)

    # immediate stop: failure, SPL 0, SoftSPL ~= 0 (no progress)
    env2 = FakeNavEnv(cfg, size_m=8.0, seed=3, max_steps=100,
                      goal_min_dist=2.0, goal_max_dist=2.8)
    env2.reset()
    env2.step(0)
    m2 = env2.get_metrics()
    assert m2["success"] == 0.0 and m2["spl"] == 0.0
    assert m2["soft_spl"] == pytest.approx(0.0, abs=1e-6)


# committed bar: measured 2026-08-17 on the seeds above (see the probe
# numbers recorded in the commit adding this file); update only with a
# written justification in the commit message
SUCCESS_BAR = 0.75
SPL_BAR = 0.3


@pytest.mark.slow
def test_navigation_success_bar():
    cfg = quality_cfg()
    pm = tiny_prediction_model(cfg)
    runner = BatchRunner(
        cfg, [lambda s=s: make_env(cfg, s) for s in SEEDS],
        prediction_model=pm)
    runner.run(max_ticks=MAX_STEPS + 4, max_episodes=len(SEEDS))
    metrics = runner.metrics[:len(SEEDS)]
    assert len(metrics) >= len(SEEDS)
    succ = float(np.mean([m.get("success", 0.0) for m in metrics]))
    spl = float(np.mean([m.get("spl", 0.0) for m in metrics]))
    print(f"\n[nav-quality LOS tier] success={succ:.3f} spl={spl:.3f} "
          f"per-ep={[(m.get('success'), round(m.get('spl', 0), 2)) for m in metrics]}")
    assert succ >= SUCCESS_BAR, (
        f"success {succ:.2f} < bar {SUCCESS_BAR}: "
        f"{[m.get('success') for m in metrics]}")
    assert spl >= SPL_BAR, f"spl {spl:.3f} < bar {SPL_BAR}"


@pytest.mark.slow
def test_navigation_success_bar_serving_profile():
    """The LOS tier again under the FULL serving profile (dd_downscale=2,
    dd_order=1, dd/plan sweep tiling 8/24, pred_async=1 — every
    approximation bench.py's headline env metric runs with).  Episode-level
    evidence that the serving knobs navigate, complementing the
    per-decision oracle pins (test_goal_argmax_oracle.py,
    test_plan_serving_tiling_decisions) and the async bit-equality pin
    (test_pred_async.py)."""
    cfg = small_cfg(use_gt_seg=1, vision_range=60,
                    goal_erode=0, cat_pred_threshold=1.0,
                    max_episode_length=MAX_STEPS + 10,
                    timestep_limit=MAX_STEPS + 10,
                    dd_downscale=2, dd_order=1, dd_block=8, dd_inner=24,
                    plan_block=8, plan_inner=24, pred_async=1)
    pm = tiny_prediction_model(cfg)
    runner = BatchRunner(
        cfg, [lambda s=s: make_env(cfg, s) for s in SEEDS],
        prediction_model=pm)
    runner.run(max_ticks=MAX_STEPS + 4, max_episodes=len(SEEDS))
    metrics = runner.metrics[:len(SEEDS)]
    assert len(metrics) >= len(SEEDS)
    succ = float(np.mean([m.get("success", 0.0) for m in metrics]))
    spl = float(np.mean([m.get("spl", 0.0) for m in metrics]))
    print(f"\n[nav-quality serving tier] success={succ:.3f} spl={spl:.3f} "
          f"per-ep={[(m.get('success'), round(m.get('spl', 0), 2)) for m in metrics]}")
    assert succ >= SUCCESS_BAR, (
        f"serving-profile success {succ:.2f} < bar {SUCCESS_BAR}: "
        f"{[m.get('success') for m in metrics]}")
    assert spl >= SPL_BAR, f"serving-profile spl {spl:.3f} < bar {SPL_BAR}"


EXPLORE_MAX_STEPS = 160
# committed bar: measured 2026-08-18 on the seeds above with goal_unique
# spawns (success [1,1,1,1,1,0,0,0] = 0.625, habitat-style spl 0.531; the
# three 160-step failures never encounter the goal — exploration in a
# random walled world with a random-weight prediction net).  0.5 tolerates
# one benign episode flip from future numerics changes; a two-episode
# regression fails.  LOS tier same day: success 0.875, spl 0.875.
EXPLORE_SUCCESS_BAR = 0.5
EXPLORE_SPL_BAR = 0.3


@pytest.mark.slow
def test_navigation_exploration_bar():
    """Exploration-required tier: goals spawn WITHOUT line of sight, so the
    episode exercises goal selection / frontier exploration / replanning —
    the prediction-driven half of the agent the line-of-sight tier skips.
    goal_unique excludes same-category distractors (stopping at one is a
    correct category-level find that this env's THE-goal-distance success
    would misread as failure)."""
    cfg = small_cfg(use_gt_seg=1, vision_range=60,
                    goal_erode=0, cat_pred_threshold=1.0,
                    max_episode_length=EXPLORE_MAX_STEPS + 10,
                    timestep_limit=EXPLORE_MAX_STEPS + 10)
    pm = tiny_prediction_model(cfg)

    def env(seed):
        return FakeNavEnv(cfg, size_m=8.0, seed=seed,
                          max_steps=EXPLORE_MAX_STEPS,
                          objects_in_depth=True, goal_min_dist=2.0,
                          goal_max_dist=3.2, goal_line_of_sight=False,
                          goal_unique=True)

    runner = BatchRunner(cfg, [lambda s=s: env(s) for s in SEEDS],
                         prediction_model=pm)
    runner.run(max_ticks=EXPLORE_MAX_STEPS + 4, max_episodes=len(SEEDS))
    metrics = runner.metrics[:len(SEEDS)]
    assert len(metrics) >= len(SEEDS)
    succ = float(np.mean([m.get("success", 0.0) for m in metrics]))
    spl = float(np.mean([m.get("spl", 0.0) for m in metrics]))
    print(f"\n[nav-quality exploration tier] success={succ:.3f} "
          f"spl={spl:.3f} "
          f"per-ep={[(m.get('success'), round(m.get('spl', 0), 2)) for m in metrics]}")
    assert succ >= EXPLORE_SUCCESS_BAR, (
        f"exploration success {succ:.2f} < bar {EXPLORE_SUCCESS_BAR}: "
        f"{[m.get('success') for m in metrics]}")
    assert spl >= EXPLORE_SPL_BAR, f"spl {spl:.3f} < bar {EXPLORE_SPL_BAR}"


@pytest.mark.slow
def test_batched_runner_matches_single_metrics():
    """BatchRunner episode metrics == single-agent metrics on the same
    seeds (the batched runtime is an implementation detail)."""
    cfg = quality_cfg()
    pm = tiny_prediction_model(cfg)
    seeds = SEEDS[:4]
    singles = {s: run_single(cfg, pm, s) for s in seeds}

    runner = BatchRunner(
        cfg, [lambda s=s: make_env(cfg, s) for s in seeds],
        prediction_model=pm)
    runner.run(max_ticks=MAX_STEPS + 4, max_episodes=len(seeds))
    assert len(runner.metrics) >= len(seeds)
    batched_succ = sorted(m.get("success", 0.0)
                          for m in runner.metrics[:len(seeds)])
    single_succ = sorted(m.get("success", 0.0) for m in singles.values())
    assert batched_succ == single_succ, (
        f"batched {batched_succ} vs single {single_succ}")
