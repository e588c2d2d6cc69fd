"""Prediction-model training CLI.

Same recipe as the reference trainer
(/root/reference/prediction/train_prediction_model.py:214-319): PSPNet
-R50v1c over 14-channel maps, 6 classes, BCE, batch 8, crop 960, Adam 5e-4
poly decay, 60k iters, checkpoint every 2k, eval disabled during training.
Data parallelism: shard the batch over all local devices via the mesh (the
NCCL/MMDDP replacement).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")

    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, default="../data/saved_maps")
    parser.add_argument("--img_dir", type=str, default="train_80")
    parser.add_argument("--work_dir", type=str,
                        default="./work_dirs/final_model")
    parser.add_argument("--max_iters", type=int, default=60000)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--crop_size", type=int, default=960)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--log_interval", type=int, default=500)
    parser.add_argument("--checkpoint_interval", type=int, default=2000)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--no_resume", action="store_true")
    parser.add_argument("--config", type=str, default=None,
                        help="optional model config file (defaults to the "
                             "PEANUT prediction config)")
    parser.add_argument("--remat", type=int, default=1,
                        help="rematerialize backbone blocks in backward "
                             "(needed for the batch-8 crop-960 recipe on "
                             "a 16 GB chip; ~1.3x step FLOPs)")
    parser.add_argument("--distributed", type=int, default=0,
                        help="initialize jax.distributed (multi-host; "
                             "coordinator from JAX_COORDINATOR_ADDRESS / "
                             "SLURM / Cloud-TPU auto-detection)")
    ns, _ = parser.parse_known_args(argv)

    import jax
    import optax

    if ns.distributed:
        # scripts/dist_train.sh exports explicit coordinates; on SLURM or
        # Cloud TPU jax auto-detects when they are absent
        kw = {}
        if os.environ.get("JAX_COORDINATOR_ADDRESS"):
            kw = dict(
                coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
                num_processes=int(os.environ.get("JAX_NUM_PROCESSES", 1)),
                process_id=int(os.environ.get("JAX_PROCESS_ID", 0)))
        jax.distributed.initialize(**kw)
        logging.info("distributed: process %d/%d, %d devices",
                     jax.process_index(), jax.process_count(),
                     len(jax.devices()))

    from ..core.mesh import make_mesh
    from ..models import build_segmentor, init_segmentor_params
    from ..models.builder import peanut_prediction_config
    from ..prediction.dataset import (SemMapDataset, PrefetchLoader,
                                      GlobalShardedLoader, training_pipeline)
    from ..prediction.runner import IterRunner
    from ..prediction.train import (TrainConfig, create_train_state,
                                    make_train_step, poly_schedule)

    # Synced seed across hosts (reference apis/train.py:44-49 broadcasts
    # the seed over the process group): rank 0's --seed wins everywhere so
    # every process draws the SAME epoch permutation to rank-stride.
    n_proc = jax.process_count()
    seed = ns.seed
    if n_proc > 1:
        from jax.experimental import multihost_utils

        seed = int(multihost_utils.broadcast_one_to_all(
            np.int32(ns.seed)))

    # --batch_size is the GLOBAL batch (the reference recipe's batch 8);
    # each process loads batch/process_count samples of every global step
    if ns.batch_size % n_proc:
        raise SystemExit(f"--batch_size {ns.batch_size} must be divisible "
                         f"by the process count {n_proc}")
    local_bs = ns.batch_size // n_proc

    tcfg = TrainConfig(lr=ns.lr, max_iters=ns.max_iters,
                       batch_size=ns.batch_size, seed=seed,
                       log_interval=ns.log_interval,
                       checkpoint_interval=ns.checkpoint_interval)

    rng = np.random.RandomState(seed)
    dataset = SemMapDataset(ns.data_root, ns.img_dir,
                            pipeline=training_pipeline(ns.crop_size, rng=rng))
    loader = PrefetchLoader(dataset, local_bs, seed=seed,
                            num_workers=ns.num_workers,
                            num_shards=n_proc,
                            shard_id=jax.process_index())
    logging.info("Loaded %d samples (%d processes x local batch %d)",
                 len(dataset), n_proc, local_bs)

    if ns.config:
        from ..core.config_file import load_config

        model_cfg = load_config(ns.config)
        model_cfg = model_cfg.get("model", model_cfg)
        in_ch = model_cfg.get("backbone", {}).get("in_channels", 14)
    else:
        model_cfg = peanut_prediction_config(remat=bool(ns.remat))
        in_ch = 14
    model = build_segmentor(model_cfg)
    variables = init_segmentor_params(
        model, (1, ns.crop_size, ns.crop_size, in_ch), train=True)

    tx = optax.adam(learning_rate=poly_schedule(tcfg))
    state, tx = create_train_state(model, variables, tcfg, tx=tx)

    n_dev = jax.device_count()
    mesh = make_mesh({"data": n_dev}) if n_dev > 1 else None
    step_fn, data_sh = make_train_step(model, tcfg, tx, mesh=mesh)
    if mesh is not None:
        # per-process local batches -> one globally-sharded array per step
        # (jit would otherwise see only this host's rows on multi-host)
        loader = GlobalShardedLoader(loader, data_sh)

    runner = IterRunner(step_fn, state, loader, tcfg, ns.work_dir,
                        auto_resume=not ns.no_resume)
    if mesh is not None:
        with mesh:
            runner.run()
    else:
        runner.run()


if __name__ == "__main__":
    main()
