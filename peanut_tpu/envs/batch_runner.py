"""Parallel-episode driver: N envs + the batched runtime.

Steps all environments in a host thread pool while the device executes the
batched per-tick programs; finished episodes reset in place (their device
slots are cleared) so the batch stays full.  Throughput metric: total env
steps per wall second across the batch (BASELINE config 5).
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, List, Optional

import numpy as np

from ..agent.batched_runtime import BatchedNavRuntime
from ..config import NavConfig


class BatchRunner:
    def __init__(self, cfg: NavConfig, env_fns: List[Callable],
                 runtime: Optional[BatchedNavRuntime] = None, **runtime_kw):
        self.cfg = cfg
        self.envs = [fn() for fn in env_fns]
        self.n = len(self.envs)
        self.runtime = runtime or BatchedNavRuntime(cfg, self.n, **runtime_kw)
        self._pool = ThreadPoolExecutor(max_workers=min(self.n, 16))
        self.metrics: List[Dict] = []
        self.total_steps = 0

    def reset_all(self):
        self.obs = list(self._pool.map(lambda e: e.reset(), self.envs))
        for i in range(self.n):
            self.runtime.reset_env(i)

    def tick(self) -> int:
        """One device tick + one env step per episode; returns the number
        of episodes that finished (and were reset in place)."""
        actions = self.runtime.act_batch(self.obs)
        upload = getattr(self.runtime, "stage_obs", None)

        def step_one(i):
            env = self.envs[i]
            obs = env.step(actions[i])
            if env.episode_over:
                m = env.get_metrics()
                obs = env.reset()
            else:
                m = None
            if upload is not None:
                # start this env's host->HBM observation copy NOW, while
                # the other envs are still stepping (double-buffered
                # uploads — BASELINE north star)
                upload(obs)
            return obs, m

        results = list(self._pool.map(step_one, range(self.n)))
        self.total_steps += self.n
        episodes_done = 0
        for i, (obs, m) in enumerate(results):
            self.obs[i] = obs
            if m is not None:
                self.metrics.append(m)
                episodes_done += 1
                self.runtime.reset_env(i)
        return episodes_done

    def run(self, max_ticks: int, max_episodes: Optional[int] = None):
        """Run until max_ticks device ticks (or max_episodes finish)."""
        self.reset_all()
        t0 = time.perf_counter()
        episodes_done = 0
        for tick in range(max_ticks):
            episodes_done += self.tick()
            if max_episodes and episodes_done >= max_episodes:
                break
        self.wall_time = time.perf_counter() - t0
        return self.summary()

    def summary(self) -> Dict:
        out = {
            "env_steps": self.total_steps,
            "wall_time_s": round(self.wall_time, 3),
            "env_steps_per_sec": round(self.total_steps / self.wall_time, 2),
            "episodes": len(self.metrics),
        }
        if self.metrics:
            out["success"] = float(np.mean(
                [m.get("success", 0.0) for m in self.metrics]))
            out["spl"] = float(np.mean(
                [m.get("spl", 0.0) for m in self.metrics]))
            # habitat emits SoftSPL alongside SPL; average it when the env
            # provides it (FakeNavEnv does; the habitat adapter passes the
            # simulator's own measure through)
            # (habitat's measure uuid is "softspl"; FakeNavEnv emits
            # "soft_spl" — accept either)
            softs = [m.get("soft_spl", m.get("softspl"))
                     for m in self.metrics
                     if "soft_spl" in m or "softspl" in m]
            if softs:
                out["soft_spl"] = float(np.mean(softs))
        return out
