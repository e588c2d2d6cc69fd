"""Host-side habitat adapter (only importable inside a habitat image).

The simulator stays host C++ (SURVEY.md §2.4); this adapter reproduces the
reference entry-point environment setup (/root/reference/nav/collect.py:22-32)
and exposes the same reset/step/episode_over/get_metrics surface as
FakeNavEnv so every runtime component is env-agnostic.
"""

from __future__ import annotations

import os
from typing import Dict

import habitat  # noqa: F401  (raises ImportError outside the habitat image)
from habitat.core.env import Env


class HabitatEnvAdapter:
    def __init__(self, cfg, split: str = "val", seed: int = 100,
                 max_scene_repeat_episodes: int = 1):
        config_paths = os.environ["CHALLENGE_CONFIG_FILE"]
        config = habitat.get_config(config_paths)
        config.defrost()
        config.SEED = seed
        config.ENVIRONMENT.ITERATOR_OPTIONS.MAX_SCENE_REPEAT_STEPS = -1
        config.ENVIRONMENT.ITERATOR_OPTIONS.MAX_SCENE_REPEAT_EPISODES = \
            max_scene_repeat_episodes
        config.DATASET.SPLIT = split
        config.freeze()
        self.config = config
        self._env = Env(config=config)

    @property
    def episodes(self):
        return self._env.episodes

    @property
    def current_episode(self):
        return self._env._current_episode

    @property
    def episode_over(self) -> bool:
        return self._env.episode_over

    def reset(self) -> Dict:
        return self._env.reset()

    def step(self, action) -> Dict:
        if isinstance(action, dict):
            action = action["action"]
        return self._env.step(action)

    def get_metrics(self) -> Dict:
        return self._env.get_metrics()
