"""Dev tool: locate single-vs-batched divergence tick by tick."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

from peanut_tpu.agent import PeanutAgent  # noqa: E402
from peanut_tpu.agent.batched_runtime import BatchedNavRuntime  # noqa: E402
from peanut_tpu.envs import FakeNavEnv  # noqa: E402
from test_agent_e2e import small_cfg, tiny_prediction_model  # noqa: E402


def main():
    cfg = small_cfg()
    pm = tiny_prediction_model(cfg)
    seed = 3
    steps = 6

    env_a = FakeNavEnv(cfg, size_m=12.0, seed=seed, max_steps=steps + 5)
    agent = PeanutAgent(cfg, prediction_model=pm)
    obs_a = env_a.reset()
    agent.reset()

    env_b = FakeNavEnv(cfg, size_m=12.0, seed=seed, max_steps=steps + 5)
    rt = BatchedNavRuntime(cfg, 1, prediction_model=pm)
    obs_b = env_b.reset()
    rt.reset_env(0)

    for t in range(steps):
        a = agent.act(obs_a)
        b = rt.act_batch([obs_b])[0]

        lm_a = agent.agent_state.local_map
        lm_b = np.asarray(rt.state.local_maps[0])
        diff = np.abs(lm_a - lm_b)
        s = agent.agent_state
        print(f"tick {t}: act_a={a['action']} act_b={b['action']} "
              f"map_maxdiff={diff.max():.4f} (ch {diff.max(axis=(1,2)).round(3)})")
        print(f"  pose a={s.local_pose} b={rt.local_poses[0]}")
        print(f"  goal a={s.global_goals[0]} b={rt.goal_shadow[0].tolist()} "
              f"found a={s.found_goal} b={rt.slots[0].found_goal} "
              f"d2g a={s.dist_to_goal:.1f} b={rt.slots[0].dist_to_goal:.1f}")
        print(f"  lmb a={s.lmb} b={rt.slots[0].lmb.tolist()} "
              f"tp a={np.sum(s.target_pred) if s.target_pred is not None else -1:.3f} "
              f"tp b={np.asarray(rt.state.target_pred[0]).sum():.3f}")
        stg_a = agent.planner.stg
        print(f"  stg a={stg_a}")
        if a["action"] != b["action"]:
            print("DIVERGED")
            break
        obs_a = env_a.step(a)
        obs_b = env_b.step(b)


if __name__ == "__main__":
    main()


def deep_compare():
    cfg = small_cfg()
    pm = tiny_prediction_model(cfg)
    seed = 3
    env_a = FakeNavEnv(cfg, size_m=12.0, seed=seed, max_steps=20)
    agent = PeanutAgent(cfg, prediction_model=pm)
    obs_a = env_a.reset()
    agent.reset()
    env_b = FakeNavEnv(cfg, size_m=12.0, seed=seed, max_steps=20)
    rt = BatchedNavRuntime(cfg, 1, prediction_model=pm)
    obs_b = env_b.reset()
    rt.reset_env(0)

    for t in range(4):
        a = agent.act(obs_a)
        b = rt.act_batch([obs_b])[0]
        if t == 3:
            # single: window around start from planner fmm_dist
            se = agent.planner  # MotionPlanner
            fmm = se._dbg_fmm
            st = rt.slots[0]
            start_x, start_y, _ = st.pose_inputs[:3]
            gx1, gy1 = int(st.lmb[0]), int(st.lmb[2])
            r0 = int(start_y * 100 / cfg.map_resolution - gx1)
            c0 = int(start_x * 100 / cfg.map_resolution - gy1)
            sentinel = fmm.shape[0] ** 2
            pad = np.pad(fmm, 5, constant_values=sentinel)
            win_a = pad[r0 + 1:r0 + 12, c0 + 1:c0 + 12]
            win_b = rt.last_windows[0]
            print("tick3 single stg:", agent.planner.stg, " batched stg:",
                  rt.last_stg[0][:2])
            print("win diff max:", np.abs(win_a - win_b).max())
            print("win_a:\n", np.round(win_a, 2))
            print("win_b:\n", np.round(win_b, 2))
            # traversibility comparison
            trav_a = se._dbg_traversible
            print("goal_dil sum:", se._dbg_goal_dil.sum())
        obs_a = env_a.step(a)
        obs_b = env_b.step(b)


deep_compare()
