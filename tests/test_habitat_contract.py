"""Habitat-lab schema contract (VERDICT r4 item 9).

The real habitat stack only exists inside the challenge docker image, so
yacs-key drift in envs/habitat_adapter.py would otherwise surface only at
container runtime.  This pins the adapter against:

  * the challenge task yaml shipped in-repo
    (configs/habitat/challenge_objectnav2022.local.rgbd.yaml — the file
    CHALLENGE_CONFIG_FILE points at inside the image; byte-copied from the
    reference's configs/ tree), and
  * a recorded schema of habitat-lab v0.2.1 (the challenge-2022 docker's
    pinned version: fairembodied/habitat-challenge:testing_2022...) —
    the default-config keys the adapter is allowed to touch.

The adapter's touched keys are extracted from its SOURCE, so adding a new
``config.X.Y`` line without extending the recorded schema fails here, not
in the container.  The one-command docker smoke is documented in
docs/HABITAT.md.
"""

from __future__ import annotations

import os
import re

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ADAPTER = os.path.join(REPO, "peanut_tpu/envs/habitat_adapter.py")
TASK_YAML = os.path.join(
    REPO, "configs/habitat/challenge_objectnav2022.local.rgbd.yaml")

# habitat-lab v0.2.1 default-config keys (yacs get_config() tree) that are
# legal for the adapter to SET; recorded from habitat-lab 0.2.1
# habitat/config/default.py.  Task-yaml keys merge on top of this tree.
HABITAT_021_KEYS = {
    "SEED",
    "ENVIRONMENT.MAX_EPISODE_STEPS",
    "ENVIRONMENT.ITERATOR_OPTIONS.CYCLE",
    "ENVIRONMENT.ITERATOR_OPTIONS.SHUFFLE",
    "ENVIRONMENT.ITERATOR_OPTIONS.GROUP_BY_SCENE",
    "ENVIRONMENT.ITERATOR_OPTIONS.NUM_EPISODE_SAMPLE",
    "ENVIRONMENT.ITERATOR_OPTIONS.MAX_SCENE_REPEAT_EPISODES",
    "ENVIRONMENT.ITERATOR_OPTIONS.MAX_SCENE_REPEAT_STEPS",
    "ENVIRONMENT.ITERATOR_OPTIONS.STEP_REPETITION_RANGE",
    "DATASET.TYPE",
    "DATASET.SPLIT",
    "DATASET.SCENES_DIR",
    "DATASET.CONTENT_SCENES",
    "DATASET.DATA_PATH",
}


def _adapter_touched_keys():
    """Every dotted ``config.A.B...`` path the adapter reads or writes."""
    src = open(ADAPTER).read()
    keys = set()
    for m in re.finditer(r"config\.((?:[A-Z][A-Z_0-9]*\.?)+)", src):
        keys.add(m.group(1).rstrip("."))
    return keys


def test_adapter_config_keys_exist_in_pinned_schema():
    touched = _adapter_touched_keys()
    assert touched, "adapter no longer touches yacs keys? update the test"
    unknown = touched - HABITAT_021_KEYS
    assert not unknown, (
        f"envs/habitat_adapter.py touches yacs keys not in the recorded "
        f"habitat-lab 0.2.1 schema: {sorted(unknown)} — verify against the "
        f"pinned docker image and extend HABITAT_021_KEYS")


def test_challenge_yaml_is_the_2022_task():
    """The in-repo task yaml must stay byte-faithful to the challenge
    geometry the whole pipeline is calibrated to (SURVEY.md L0)."""
    with open(TASK_YAML) as f:
        cfg = yaml.safe_load(f)
    assert cfg["ENVIRONMENT"]["MAX_EPISODE_STEPS"] == 500
    sim = cfg["SIMULATOR"]
    assert sim["TURN_ANGLE"] == 30
    assert sim["AGENT_0"]["HEIGHT"] == 0.88
    d = sim["DEPTH_SENSOR"]
    assert (d["WIDTH"], d["HEIGHT"], d["HFOV"]) == (640, 480, 79)
    assert (d["MIN_DEPTH"], d["MAX_DEPTH"]) == (0.5, 5.0)
    task = cfg["TASK"]
    assert task["POSSIBLE_ACTIONS"][:4] == [
        "STOP", "MOVE_FORWARD", "TURN_LEFT", "TURN_RIGHT"]
    assert task["MEASUREMENTS"] == [
        "DISTANCE_TO_GOAL", "SUCCESS", "SPL", "SOFT_SPL"]
    assert task["SUCCESS"]["SUCCESS_DISTANCE"] == 0.1


def test_task_yaml_keys_within_schema_families():
    """Top-level families in the task yaml must be the ones habitat-lab
    0.2.1 get_config merges (catch a yaml written for the 0.3 hydra era,
    whose keys are lowercase and would silently no-op under yacs)."""
    with open(TASK_YAML) as f:
        cfg = yaml.safe_load(f)
    assert set(cfg) <= {"ENVIRONMENT", "SIMULATOR", "TASK", "DATASET"}
    # yacs-era configs are ALL-CAPS; hydra-era (habitat-lab >= 0.3) are
    # lowercase — a mix means somebody half-migrated
    for fam, sub in cfg.items():
        assert fam.isupper()
        for k in sub:
            assert k.isupper(), (fam, k)
