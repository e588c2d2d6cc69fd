"""Closed-loop demo: collect maps -> train the prediction net -> navigate.

Reproduces the reference's full data loop (collect_maps.py ->
train_prediction_model.py -> collect.py) at small geometry on the synthetic
environment, end to end on the attached device.

Usage: python scripts/data_loop_demo.py [workdir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

t00 = time.time()


def log(msg):
    print("[%6.1fs] %s" % (time.time() - t00, msg), flush=True)


SMALL = [
    "--env_frame_width", "64", "--env_frame_height", "48",
    "--frame_width", "64", "--frame_height", "48",
    "--map_resolution", "5", "--use_gt_seg", "2",
    "--num_local_steps", "6", "--update_goal_freq", "4",
    "--fake_env", "1",
]


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/peanut_loop"
    os.makedirs(work, exist_ok=True)

    # ---- 1. collect exploration maps (uint8 npz, reference format) ------
    log("collecting maps (explore mode)")
    from peanut_tpu.cli import collect_maps

    # vision_range * map_resolution must cover the depth range (0.5-5m):
    # 80 cells x 5cm = 4m egocentric grid
    collect_maps.main(SMALL + [
        "--num_episodes", "3", "--out_dir", f"{work}/saved_maps",
        "--split", "train", "--map_size_cm", "3840", "--vision_range", "80",
        "--max_episode_length", "300", "--timestep_limit", "299"])
    files = os.listdir(f"{work}/saved_maps/train_80")
    log(f"collected {files}")
    assert files, "no maps passed the save gate"

    # ---- 2. train the prediction net on the collected maps --------------
    log("training prediction net")
    from peanut_tpu.cli import train_prediction_model

    train_prediction_model.main([
        "--data_root", f"{work}/saved_maps", "--img_dir", "train_80",
        "--work_dir", f"{work}/train", "--max_iters", "10",
        "--batch_size", "2", "--crop_size", "128", "--num_workers", "2",
        "--log_interval", "5", "--checkpoint_interval", "10"])
    log("trained; checkpoint at iter_10")

    # ---- 3. navigate with the trained net --------------------------------
    log("navigating with the trained prediction net")
    from peanut_tpu.config import NavConfig
    from peanut_tpu.core.checkpoint import load_checkpoint
    from peanut_tpu.prediction import PredictionModel
    from peanut_tpu.prediction.train import TrainState
    from peanut_tpu.agent import PeanutAgent
    from peanut_tpu.envs import FakeNavEnv

    cfg = NavConfig(
        env_frame_width=64, env_frame_height=48, frame_width=64,
        frame_height=48, map_size_cm=3840, map_resolution=5,
        global_downscaling=2, vision_range=80, num_sem_categories=10,
        prediction_window=768, use_gt_seg=2, max_episode_length=100,
        timestep_limit=100, num_local_steps=6, update_goal_freq=4)

    tree, step = load_checkpoint(f"{work}/train/iter_10")
    variables = {"params": tree["params"],
                 "batch_stats": tree["batch_stats"]}
    pm = PredictionModel(cfg, variables=variables,
                         input_size=cfg.prediction_window)
    agent = PeanutAgent(cfg, prediction_model=pm)
    env = FakeNavEnv(cfg, size_m=14.0, seed=7)
    obs = env.reset()
    agent.reset()
    steps = 0
    while not env.episode_over:
        obs = env.step(agent.act(obs))
        steps += 1
    m = env.get_metrics()
    log(f"episode done: {steps} steps, metrics={m}")
    log("CLOSED LOOP OK")


if __name__ == "__main__":
    main()
