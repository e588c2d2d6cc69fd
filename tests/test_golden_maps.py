"""Golden .npz regression: the exact-parity map-collection path must stay
bit-identical (BASELINE requirement: bit-comparable .npz semantic maps).

The committed fixture was produced by cli/collect_maps.py on the pinned
FakeNavEnv seed at small geometry with exact_parity=1; any kernel refactor
that changes a single uint8 anywhere in the splat -> height-slice -> warp ->
fuse -> snapshot path fails here instead of silently drifting."""

import glob
import hashlib
import os
import tempfile

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "golden_maps",
                      "f00000.npz")

ARGS = ["--env_frame_width", "64", "--env_frame_height", "48",
        "--frame_width", "64", "--frame_height", "48",
        "--map_size_cm", "3840", "--map_resolution", "5",
        "--global_downscaling", "2", "--vision_range", "90",
        "--prediction_window", "240", "--use_gt_seg", "2",
        "--max_episode_length", "100", "--timestep_limit", "100",
        "--num_local_steps", "6", "--update_goal_freq", "4",
        "--only_explore", "1", "--fake_env", "1",
        "--cat_pred_threshold", "1.0",
        "--num_episodes", "1", "--split", "val", "--exact_parity", "1"]


@pytest.mark.slow
def test_collect_maps_bit_identical():
    from peanut_tpu.cli import collect_maps

    want = np.load(GOLDEN)["maps"]
    assert want.dtype == np.uint8 and want.shape == (20, 14, 768, 768)

    with tempfile.TemporaryDirectory() as td:
        collect_maps.main(ARGS + ["--out_dir", td])
        files = sorted(glob.glob(os.path.join(td, "val_80", "*.npz")))
        assert files, "save gate rejected the pinned episode"
        got = np.load(files[0])["maps"]

    assert got.dtype == want.dtype and got.shape == want.shape
    if not np.array_equal(got, want):
        diff = (got != want)
        per_ch = diff.sum(axis=(0, 2, 3))
        raise AssertionError(
            f"map bits drifted: {int(diff.sum())} cells differ "
            f"(per channel {per_ch.tolist()}); "
            f"sha256 got {hashlib.sha256(got.tobytes()).hexdigest()[:12]} "
            f"want {hashlib.sha256(want.tobytes()).hexdigest()[:12]}")
