"""Batched runtime vs single-env agent: action-level parity on identical
environments, plus the batch-runner lifecycle."""

import numpy as np
import pytest

from peanut_tpu.agent import PeanutAgent
from peanut_tpu.agent.batched_runtime import BatchedNavRuntime
from peanut_tpu.envs import FakeNavEnv
from peanut_tpu.envs.batch_runner import BatchRunner

from test_agent_e2e import small_cfg, tiny_prediction_model


@pytest.mark.slow
def test_batched_matches_single_env_actions():
    """Same envs, same seeds: the batched runtime must produce the same
    action sequence as N independent single-env agents."""
    cfg = small_cfg()
    n = 3
    seeds = [3, 11, 42]
    steps = 25

    pm = tiny_prediction_model(cfg)

    # single-env rollouts
    single_actions = []
    for seed in seeds:
        env = FakeNavEnv(cfg, size_m=12.0, seed=seed, max_steps=steps + 5)
        agent = PeanutAgent(cfg, prediction_model=pm)
        obs = env.reset()
        agent.reset()
        acts = []
        for _ in range(steps):
            a = agent.act(obs)
            acts.append(a["action"])
            obs = env.step(a)
            if env.episode_over:
                break
        single_actions.append(acts)

    # batched rollout over the same envs
    envs = [FakeNavEnv(cfg, size_m=12.0, seed=s, max_steps=steps + 5)
            for s in seeds]
    runtime = BatchedNavRuntime(cfg, n, prediction_model=pm)
    obs = [e.reset() for e in envs]
    for i in range(n):
        runtime.reset_env(i)
    batched_actions = [[] for _ in range(n)]
    done = [False] * n
    for t in range(steps):
        acts = runtime.act_batch(obs)
        for i in range(n):
            if not done[i]:
                batched_actions[i].append(acts[i]["action"])
                obs[i] = envs[i].step(acts[i])
                if envs[i].episode_over:
                    done[i] = True

    for i in range(n):
        k = min(len(single_actions[i]), len(batched_actions[i]))
        assert batched_actions[i][:k] == single_actions[i][:k], (
            f"env {i}: single={single_actions[i][:k]} "
            f"batched={batched_actions[i][:k]}")


@pytest.mark.slow
@pytest.mark.parametrize("dwt,dds", [(-1.0, 1), (0.0, 1), (0.0, 2)])
def test_batched_matches_single_dist_weight_modes(dwt, dds):
    """dist_weight_temperature -1 (no weighting) and 0 (frontier mode,
    agent_state.py:402-407) must flow through the fused tick, not only the
    single-env path (VERDICT r2 item 5).  The (0.0, 2) case pins the
    dd_downscale guard: T<=0 forces a full-resolution geodesic field in
    BOTH paths (the half-res approximation is unsound against frontier
    mode's 60-cell cliff — see tests/test_goal_argmax_oracle.py)."""
    cfg = small_cfg()
    cfg.dist_weight_temperature = dwt
    cfg.dd_downscale = dds
    n = 2
    seeds = [5, 23]
    steps = 15
    pm = tiny_prediction_model(cfg)

    single_actions = []
    for seed in seeds:
        env = FakeNavEnv(cfg, size_m=12.0, seed=seed, max_steps=steps + 5)
        agent = PeanutAgent(cfg, prediction_model=pm)
        obs = env.reset()
        agent.reset()
        acts = []
        for _ in range(steps):
            a = agent.act(obs)
            acts.append(a["action"])
            obs = env.step(a)
            if env.episode_over:
                break
        single_actions.append(acts)

    envs = [FakeNavEnv(cfg, size_m=12.0, seed=s, max_steps=steps + 5)
            for s in seeds]
    runtime = BatchedNavRuntime(cfg, n, prediction_model=pm)
    obs = [e.reset() for e in envs]
    for i in range(n):
        runtime.reset_env(i)
    batched_actions = [[] for _ in range(n)]
    done = [False] * n
    for _ in range(steps):
        acts = runtime.act_batch(obs)
        for i in range(n):
            if not done[i]:
                batched_actions[i].append(acts[i]["action"])
                obs[i] = envs[i].step(acts[i])
                if envs[i].episode_over:
                    done[i] = True

    for i in range(n):
        k = min(len(single_actions[i]), len(batched_actions[i]))
        assert batched_actions[i][:k] == single_actions[i][:k], (
            f"dwt={dwt} env {i}: single={single_actions[i][:k]} "
            f"batched={batched_actions[i][:k]}")


@pytest.mark.slow
def test_batch_runner_lifecycle():
    cfg = small_cfg(use_gt_seg=1)
    pm = tiny_prediction_model(cfg)
    runner = BatchRunner(
        cfg, [lambda s=s: FakeNavEnv(cfg, size_m=10.0, seed=s, max_steps=15)
              for s in range(4)],
        prediction_model=pm)
    summary = runner.run(max_ticks=20)
    assert summary["env_steps"] == 20 * 4
    assert summary["episodes"] >= 4          # 15-step episodes must recycle
    assert summary["env_steps_per_sec"] > 0


@pytest.mark.slow
def test_mesh_sharded_runtime_matches_unsharded():
    """Episodes sharded over the 8-device CPU mesh must produce the exact
    action sequences of the unsharded runtime (SPMD is an implementation
    detail; behaviour is device-layout-invariant).  This is the test-suite
    twin of __graft_entry__.dryrun_multichip's nav tick."""
    import jax
    from peanut_tpu.core.mesh import make_mesh

    # Tiny geometry on purpose: this test proves sharding TRANSPARENCY
    # (device layout must not change behavior), which a 128-cell map
    # shows as well as a 240-cell one at ~6x less compile+solve time
    # (the full geometry run lives in the driver's dryrun_multichip).
    cfg = small_cfg(map_size_cm=640, prediction_window=64, vision_range=24)
    n = 8
    steps = 10
    pm = tiny_prediction_model(cfg)

    def rollout(mesh):
        runtime = BatchedNavRuntime(cfg, n, prediction_model=pm, mesh=mesh)
        envs = [FakeNavEnv(cfg, size_m=6.0, seed=100 + i,
                           max_steps=steps + 5) for i in range(n)]
        obs = [e.reset() for e in envs]
        for i in range(n):
            runtime.reset_env(i)
        actions = []
        for _ in range(steps):
            acts = runtime.act_batch(obs)
            actions.append([a["action"] for a in acts])
            obs = [envs[i].step(acts[i]) for i in range(n)]
        return actions

    plain = rollout(None)
    mesh = make_mesh({"data": len(jax.devices())})
    sharded = rollout(mesh)
    assert plain == sharded


@pytest.mark.slow
def test_batched_matches_single_dd_downscale():
    """The serving profile (dd_downscale=2 half-res + dd_order=1 low-order
    goal-weighting geodesic field) must produce identical actions in the
    single-env agent and the fused tick — both paths pool/solve/upsample
    the same way."""
    cfg = small_cfg()
    cfg.dd_downscale = 2
    cfg.dd_order = 1
    cfg.dd_block = 8
    cfg.dd_inner = 24
    n = 2
    seeds = [7, 31]
    steps = 15
    pm = tiny_prediction_model(cfg)

    single_actions = []
    for seed in seeds:
        env = FakeNavEnv(cfg, size_m=12.0, seed=seed, max_steps=steps + 5)
        agent = PeanutAgent(cfg, prediction_model=pm)
        obs = env.reset()
        agent.reset()
        acts = []
        for _ in range(steps):
            a = agent.act(obs)
            acts.append(a["action"])
            obs = env.step(a)
            if env.episode_over:
                break
        single_actions.append(acts)

    envs = [FakeNavEnv(cfg, size_m=12.0, seed=s, max_steps=steps + 5)
            for s in seeds]
    runtime = BatchedNavRuntime(cfg, n, prediction_model=pm)
    obs = [e.reset() for e in envs]
    for i in range(n):
        runtime.reset_env(i)
    batched_actions = [[] for _ in range(n)]
    done = [False] * n
    for _ in range(steps):
        acts = runtime.act_batch(obs)
        for i in range(n):
            if not done[i]:
                batched_actions[i].append(acts[i]["action"])
                obs[i] = envs[i].step(acts[i])
                if envs[i].episode_over:
                    done[i] = True

    for i in range(n):
        k = min(len(single_actions[i]), len(batched_actions[i]))
        assert batched_actions[i][:k] == single_actions[i][:k], (
            f"env {i}: single={single_actions[i][:k]} "
            f"batched={batched_actions[i][:k]}")


@pytest.mark.slow
def test_pipelined_runner_matches_serial():
    """pipeline=2 (two software-pipelined half-batch runtimes, VERDICT r3
    item 1c) must produce bit-identical per-episode metrics to the serial
    runner on the same envs — pipelining is pure scheduling."""
    cfg = small_cfg(use_gt_seg=1)
    pm = tiny_prediction_model(cfg)

    def envs():
        return [lambda s=s: FakeNavEnv(cfg, size_m=10.0, seed=s,
                                       max_steps=15) for s in range(4)]

    serial = BatchRunner(cfg, envs(), prediction_model=pm)
    s1 = serial.run(max_ticks=18)
    piped = BatchRunner(cfg, envs(), prediction_model=pm, pipeline=2)
    s2 = piped.run(max_ticks=18)

    assert s1["env_steps"] == s2["env_steps"]
    assert s1["episodes"] == s2["episodes"]
    key = lambda m: sorted(np.round(
        [m.get("success", 0), m.get("spl", 0), m.get("soft_spl", 0)], 6))
    m1 = sorted(map(key, serial.metrics))
    m2 = sorted(map(key, piped.metrics))
    assert m1 == m2, f"serial {m1} vs pipelined {m2}"


@pytest.mark.slow
def test_warmup_mid_episode_state_safe():
    """warmup_tick_variants mid-episode must not perturb episode state:
    the continuation after a warmup is bit-identical to never warming up
    (VERDICT r4 item 7 — the zero-input warmup runs used to splat into
    live maps)."""
    import jax
    import numpy as np

    cfg = small_cfg(use_gt_seg=1)
    pm = tiny_prediction_model(cfg)
    seeds = [7, 19]
    steps_before, steps_after = 6, 8

    def rollout(warm_mid: bool):
        envs = [FakeNavEnv(cfg, size_m=10.0, seed=s, max_steps=40)
                for s in seeds]
        rt = BatchedNavRuntime(cfg, len(seeds), prediction_model=pm)
        obs = [e.reset() for e in envs]
        for i in range(len(seeds)):
            rt.reset_env(i)
        acts_log = []
        for t in range(steps_before + steps_after):
            if warm_mid and t == steps_before:
                before = jax.tree.map(np.asarray, rt.state)
                rt.warmup_tick_variants()
                after = jax.tree.map(np.asarray, rt.state)
                for a, b in zip(jax.tree.leaves(before),
                                jax.tree.leaves(after)):
                    np.testing.assert_array_equal(a, b)
            acts = rt.act_batch(obs)
            acts_log.append([a["action"] for a in acts])
            obs = [e.step(a) for e, a in zip(envs, acts)]
        return acts_log

    assert rollout(True) == rollout(False)
