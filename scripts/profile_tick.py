"""Per-tick latency profile of the batched runtime (dev tool)."""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

t00 = time.time()


def log(m):
    print("[%6.1fs] %s" % (time.time() - t00, m), flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from peanut_tpu.config import NavConfig
    from peanut_tpu.envs import FakeNavEnv
    from peanut_tpu.agent.batched_runtime import BatchedNavRuntime
    from peanut_tpu.prediction import PredictionModel

    cfg = NavConfig(use_gt_seg=1)
    log("init prediction model")
    pm = PredictionModel(cfg)
    log("init runtime")
    rt = BatchedNavRuntime(cfg, n, prediction_model=pm)
    envs = [FakeNavEnv(cfg, size_m=14.0, seed=s) for s in range(n)]
    obs = [e.reset() for e in envs]
    for i in range(n):
        rt.reset_env(i)
    log("first tick (compiles)")
    acts = rt.act_batch(obs)
    log("first tick done")
    obs = [envs[i].step(acts[i]) for i in range(n)]
    for t in range(ticks):
        t0 = time.time()
        acts = rt.act_batch(obs)
        t1 = time.time()
        obs = [envs[i].step(acts[i]) for i in range(n)]
        log("tick %d: act %.0fms env %.0fms" % (
            t, (t1 - t0) * 1e3, (time.time() - t1) * 1e3))


if __name__ == "__main__":
    main()
