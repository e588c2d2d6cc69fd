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


@pytest.mark.slow
def test_benchmark_cli(capsys):
    from peanut_tpu.cli import benchmark

    benchmark.main(["--size", "64", "--batch", "1", "--warmup", "1",
                    "--iters", "2", "--dtype", "float32"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["maps_per_sec"] > 0


@pytest.mark.slow
def test_serve_http_roundtrip(tmp_path):
    """cli/serve.py (torchserve counterpart): ping + predictions + probs
    endpoints over a tiny segmentor, exercised through real HTTP."""
    import io
    import json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from peanut_tpu.apis import init_segmentor
    from peanut_tpu.cli.serve import make_handler

    cfg = dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNetV1c", depth=50, num_stages=4,
                      out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                      strides=(1, 2, 1, 1), contract_dilation=True,
                      base_channels=8, stem_channels=8, in_channels=3),
        decode_head=dict(type="PSPHead", in_channels=256, in_index=3,
                         channels=64, pool_scales=(1, 2, 3, 6),
                         dropout_ratio=0.1, num_classes=4,
                         align_corners=False),
        test_cfg=dict(mode="whole"),
    )
    bundle = init_segmentor(cfg)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(bundle))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/ping", timeout=30) as r:
            assert json.loads(r.read())["status"] == "Healthy"

        img = (np.random.RandomState(0).rand(32, 48, 3) * 255).astype(
            np.uint8)
        buf = io.BytesIO()
        np.save(buf, img)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predictions/seg", data=buf.getvalue())
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        assert out["shape"] == [32, 48]
        assert len(out["classes"]) == 32

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/probs", data=buf.getvalue())
        with urllib.request.urlopen(req, timeout=300) as r:
            probs = np.load(io.BytesIO(r.read()))
        assert probs.shape == (4, 32, 48)
    finally:
        server.shutdown()
