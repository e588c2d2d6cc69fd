"""BatchedFakeNavEnv vs per-env FakeNavEnv: byte-identical observations.

The batched env exists purely for host throughput (one numpy raycast pass
for all envs); behavior — episodes, RNG, metrics, every observation byte —
must match the per-env class exactly, or the golden-map and parity suites
would silently test a different environment than serving runs.
"""

import numpy as np
import pytest

from peanut_tpu.config import NavConfig
from peanut_tpu.envs.fake import BatchedFakeNavEnv, FakeNavEnv

from test_agent_e2e import small_cfg


def _assert_obs_equal(a, b):
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


def test_batched_obs_bit_identical_over_episode():
    cfg = small_cfg()
    seeds = [3, 11, 42, 7]
    mk = lambda: [FakeNavEnv(cfg, size_m=10.0, seed=s, max_steps=12,
                             objects_in_depth=True) for s in seeds]

    singles = mk()
    batched = BatchedFakeNavEnv(mk())

    obs_s = [e.reset() for e in singles]
    obs_b = batched.reset_all()
    for a, b in zip(obs_s, obs_b):
        _assert_obs_equal(a, b)

    rng = np.random.RandomState(0)
    for t in range(30):                      # crosses episode resets
        actions = [int(rng.randint(0, 4)) for _ in seeds]
        obs_s = []
        for e, act in zip(singles, actions):
            o = e.step(act)
            if e.episode_over:
                m = e.get_metrics()
                o = e.reset()
                obs_s.append((o, m))
            else:
                obs_s.append((o, None))

        dones = {}
        obs_b = batched.step_all(
            actions, on_done=lambda i: dones.update(
                {i: batched.envs[i].get_metrics()}) or
            batched.reset_one(i))
        for i, ((a, m), b) in enumerate(zip(obs_s, obs_b)):
            _assert_obs_equal(a, b)
            if m is not None:
                assert i in dones
                assert dones[i] == m


@pytest.mark.slow
def test_batched_runner_matches_threaded():
    """BatchRunner(batch_env=True) must produce identical episode metrics
    to the threaded runner on the same envs."""
    from peanut_tpu.envs.batch_runner import BatchRunner

    from test_agent_e2e import tiny_prediction_model

    cfg = small_cfg(use_gt_seg=1)
    pm = tiny_prediction_model(cfg)

    def envs():
        return [lambda s=s: FakeNavEnv(cfg, size_m=10.0, seed=s,
                                       max_steps=15) for s in range(4)]

    threaded = BatchRunner(cfg, envs(), prediction_model=pm)
    s1 = threaded.run(max_ticks=18)
    batched = BatchRunner(cfg, envs(), prediction_model=pm, batch_env=True)
    s2 = batched.run(max_ticks=18)

    assert s1["env_steps"] == s2["env_steps"]
    assert s1["episodes"] == s2["episodes"]
    key = lambda m: sorted(np.round(
        [m.get("success", 0), m.get("spl", 0), m.get("soft_spl", 0)], 6))
    assert sorted(map(key, threaded.metrics)) == \
        sorted(map(key, batched.metrics))
