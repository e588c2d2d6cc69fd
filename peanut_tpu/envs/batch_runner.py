"""Parallel-episode driver: N envs + the batched runtime.

Steps all environments in a host thread pool while the device executes the
batched per-tick programs; finished episodes reset in place (their device
slots are cleared) so the batch stays full.  Throughput metric: total env
steps per wall second across the batch (BASELINE config 5).

``pipeline=k`` (k > 1) splits the batch into k independent half-batches,
each with its own ``BatchedNavRuntime``, and software-pipelines them
(VERDICT r3 item 1c): while half A's fused tick program executes on the
device, half B's host work runs — observation preprocessing, detect-chunk
dispatch, planning tails, and env stepping.  The reference loop
(/root/reference/nav/collect.py:44-84) is strictly serial per step; the
unpipelined tick here already overlaps detect with env stepping, but the
fused tick program itself still serialized with the hosts' env stepping.
Per-episode behavior is unchanged — each half-batch runtime computes
exactly what it would compute at batch n/k (batch-size transparency is
asserted by tests/test_batched_runtime.py), so actions and episode
metrics are bit-identical to ``pipeline=1``.
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
                 runtime: Optional[BatchedNavRuntime] = None,
                 pipeline: int = 1, batch_env: bool = False, **runtime_kw):
        self.cfg = cfg
        self.envs = [fn() for fn in env_fns]
        self.n = len(self.envs)
        # vectorized env stepping (VERDICT r4 item 1a): all raycasts in
        # one numpy pass; observation streams are byte-identical to the
        # per-env threaded path (tests/test_batched_fake_env.py), and the
        # batched obs feed _pack_obs's stacked-upload fallbacks directly
        self.batched_env = None
        if batch_env:
            if pipeline != 1:
                raise ValueError("batch_env does not combine with "
                                 "software pipelining")
            from .fake import BatchedFakeNavEnv

            self.batched_env = BatchedFakeNavEnv(self.envs)
        if runtime is not None and pipeline != 1:
            raise ValueError("pipeline > 1 builds its own runtimes; "
                             "pass runtime_kw instead of a runtime")
        if self.n % pipeline:
            raise ValueError(f"{self.n} envs not divisible by "
                             f"pipeline={pipeline}")
        self.pipeline = pipeline
        self.per = self.n // pipeline
        if pipeline == 1:
            self.runtimes = [runtime or
                             BatchedNavRuntime(cfg, self.n, **runtime_kw)]
        else:
            self.runtimes = [BatchedNavRuntime(cfg, self.per, **runtime_kw)
                             for _ in range(pipeline)]
        self.runtime = self.runtimes[0]
        self._halves = [list(range(k * self.per, (k + 1) * self.per))
                        for k in range(pipeline)]
        # env stepping is host numpy: more threads than cores just thrash
        # the GIL (measured on the 1-core bench host: 16 workers = 82 ms
        # per 16-env step vs 54 ms at 2); a couple of extra threads still
        # help hide the obs-upload dispatch latency
        import os
        self._pool = ThreadPoolExecutor(
            max_workers=min(self.n, max(2, os.cpu_count() or 1)))
        # separate executor for the per-half orchestration tasks, so they
        # can't starve the env-step pool they submit into (no deadlock)
        self._half_pool = ThreadPoolExecutor(max_workers=max(pipeline, 1))
        self.metrics: List[Dict] = []
        self.total_steps = 0

    # -- pipeline-aware accessors -------------------------------------
    def warmup_rare_paths(self):
        for rt in self.runtimes:
            rt.warmup_rare_paths()

    def reset_timers(self):
        for rt in self.runtimes:
            rt.timer.reset()

    def stage_totals(self) -> Dict[str, float]:
        """Per-stage total seconds summed over all half-batch runtimes."""
        out: Dict[str, float] = {}
        for rt in self.runtimes:
            for name, s in rt.timer.summary().items():
                out[name] = out.get(name, 0.0) + s["total_s"]
        return out

    def _runtime_of(self, i: int):
        return self.runtimes[i // self.per], i % self.per

    def reset_all(self):
        if self.batched_env is not None:
            self.obs = self.batched_env.reset_all()
        else:
            self.obs = list(self._pool.map(lambda e: e.reset(), self.envs))
        for i in range(self.n):
            rt, j = self._runtime_of(i)
            rt.reset_env(j)

    # ------------------------------------------------------------------
    def _stage_batched(self, obs_list) -> None:
        """Stage every observation through the runtime's ``stage_obs``
        (device uploads + detect-chunk dispatches + depth preprocess),
        fanned over the pool so the tunnel transfers stagger exactly as
        in the threaded path.  Called from a background task so the whole
        phase overlaps the async pred program's goal-download wait."""
        rt = self.runtimes[0]
        upload = getattr(rt, "stage_obs", None)
        if upload is None:
            return
        list(self._pool.map(upload, obs_list))

    def _step_env(self, i: int, action: Dict, upload) -> int:
        """Step env i, reset it in place if the episode ended; returns 1
        when an episode finished."""
        env = self.envs[i]
        obs = env.step(action)
        done = 0
        if env.episode_over:
            self.metrics.append(env.get_metrics())
            obs = env.reset()
            rt, j = self._runtime_of(i)
            rt.reset_env(j)
            done = 1
        if upload is not None:
            # start this env's host->HBM observation copy NOW, while the
            # other envs are still stepping (double-buffered uploads —
            # BASELINE north star)
            upload(obs)
        self.obs[i] = obs
        return done

    def _step_half(self, k: int, actions: List[Dict]) -> int:
        rt = self.runtimes[k]
        upload = getattr(rt, "stage_obs", None)
        idxs = self._halves[k]
        with rt.timer.stage("env_phase"):
            # wall-clock of the whole env-step + obs-staging phase (the
            # per-tick time OUTSIDE the runtime's own stages)
            return sum(self._pool.map(
                lambda ia: self._step_env(ia[0], ia[1], upload),
                zip(idxs, actions)))

    def tick(self) -> int:
        """One device tick + one env step per episode; returns the number
        of episodes that finished (and were reset in place)."""
        if self.batched_env is not None:
            rt = self.runtimes[0]
            actions = rt.act_batch(self.obs)
            done = 0

            def on_done(i):
                nonlocal done
                self.metrics.append(self.envs[i].get_metrics())
                self.batched_env.reset_one(i)
                rt.reset_env(i)
                done += 1

            with rt.timer.stage("env_phase"):
                self.obs = self.batched_env.step_all(actions,
                                                     on_done=on_done)
            # overlap the observation staging (one stacked ~15 MB rgb
            # upload + detect-chunk dispatches + batched depth preprocess)
            # with the async pred program's in-flight goal download — the
            # host would otherwise idle through that wait and then pay
            # the upload serially (round 5: the upload is ~170 ms through
            # the tunnel, almost exactly the goal-wait window)
            fut = self._half_pool.submit(self._stage_batched, self.obs)
            rt.wait_pending_goal()
            fut.result()
            self.total_steps += self.n
            return done
        if self.pipeline == 1:
            rt = self.runtimes[0]
            actions = rt.act_batch(self.obs)
            done = self._step_half(0, actions)
            self.total_steps += self.n
            return done

        # software pipeline: enqueue every half's device program first
        # (half k+1's host preprocess overlaps half k's device execution),
        # then collect + env-step each half while the next one computes
        handles = [rt.act_batch_dispatch([self.obs[i] for i in half])
                   for rt, half in zip(self.runtimes, self._halves)]
        futs = []
        for k, rt in enumerate(self.runtimes):
            actions = rt.act_batch_collect(handles[k])
            futs.append(self._half_pool.submit(self._step_half, k, actions))
        done = sum(f.result() for f in futs)
        self.total_steps += self.n
        return done

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
