"""CLI entry-point smoke tests (in-process, fake env, tiny geometry)."""

import glob
import json
import os

import numpy as np
import pytest


SMALL_ARGS = [
    "--env_frame_width", "64", "--env_frame_height", "48",
    "--frame_width", "64", "--frame_height", "48",
    "--map_size_cm", "1200", "--map_resolution", "5",
    "--global_downscaling", "2", "--vision_range", "48",
    "--prediction_window", "240", "--use_gt_seg", "1",
    "--max_episode_length", "12", "--timestep_limit", "12",
    "--num_local_steps", "6", "--update_goal_freq", "4",
    "--only_explore", "1",  # no prediction net: fast CI
    "--fake_env", "1",
]


@pytest.mark.slow
def test_collect_cli_runs(capsys):
    from peanut_tpu.cli import collect

    collect.main(SMALL_ARGS + ["--num_episodes", "1", "--switch_step", "999"])
    out = capsys.readouterr().out
    assert "Average Success" in out


@pytest.mark.slow
def test_collect_maps_cli_writes_npz(tmp_path):
    from peanut_tpu.cli import collect_maps

    # collect_maps forces global_downscaling=4 (reference parity), so the
    # local map shrinks: use a bigger map + smaller vision range
    collect_maps.main(SMALL_ARGS + [
        "--num_episodes", "1", "--out_dir", str(tmp_path), "--split", "val",
        "--map_size_cm", "1920", "--vision_range", "24",
        "--max_episode_length", "30", "--timestep_limit", "30"])
    files = glob.glob(str(tmp_path / "val_80" / "*.npz"))
    # the save gate (semantics seen + >4000 explored) may reject tiny
    # episodes; the contract here is the directory layout + dtype
    for f in files:
        maps = np.load(f)["maps"]
        assert maps.dtype == np.uint8
        assert maps.shape[0] == 20


def test_benchmark_cli(capsys):
    from peanut_tpu.cli import benchmark

    benchmark.main(["--size", "64", "--batch", "1", "--warmup", "1",
                    "--iters", "2", "--dtype", "float32"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["maps_per_sec"] > 0
