"""ObjectNav environment throughput: N parallel episodes, full models.

Measures env-steps/sec of the batched runtime (BASELINE config 5) with the
production models (PSPNet-R50 prediction net, Mask R-CNN R101-FPN
segmentation — random weights, identical compute) over synthetic raycast
environments at the challenge observation geometry (640x480 RGB-D).

Usage: python bench_env.py [--envs 16] [--ticks 50] [--gt_seg]
"""

import argparse
import json
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compile cache: the runtime's fused programs take
    minutes to build through the tunnel; cache them across runs."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass


def main():
    _enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=16)
    ap.add_argument("--ticks", type=int, default=50)
    ap.add_argument("--gt_seg", action="store_true",
                    help="skip Mask R-CNN (ground-truth segmentation)")
    ap.add_argument("--pipeline", type=int, default=1,
                    help="split the batch into k software-pipelined "
                         "half-batches (device tick overlaps env stepping)")
    ap.add_argument("--dd_downscale", type=int, default=2,
                    help="goal-weighting field resolution divisor "
                         "(1 = exact reference-faithful mode)")
    ap.add_argument("--dd_order", type=int, default=1,
                    help="goal-weighting field Godunov order "
                         "(2 = exact reference-faithful mode)")
    ap.add_argument("--dd_block", type=int, default=8)
    ap.add_argument("--dd_inner", type=int, default=24)
    ap.add_argument("--plan_block", type=int, default=8,
                    help="STG planning-field sweep tiling (16/40 = exact)")
    ap.add_argument("--plan_inner", type=int, default=24)
    ap.add_argument("--batch_env", type=int, default=0,
                    help="vectorized batched env stepping (default 0: the "
                         "threaded per-env path measures faster through "
                         "the single-lane axon tunnel, whose staggered "
                         "uploads it overlaps organically)")
    ap.add_argument("--pred_async", type=int, default=1,
                    help="1 = post-tick prediction program overlapping env "
                         "stepping (0 = exact in-tick phasing)")
    ns = ap.parse_args()

    from peanut_tpu.config import NavConfig
    from peanut_tpu.envs import FakeNavEnv
    from peanut_tpu.envs.batch_runner import BatchRunner
    from peanut_tpu.prediction import PredictionModel

    # fast compute paths (dense splat, windowed warp); exact_parity stays
    # available for bit-comparable map collection
    cfg = NavConfig(use_gt_seg=1 if ns.gt_seg else 0, exact_parity=False,
                    serve_bf16=True, dd_downscale=ns.dd_downscale,
                    dd_order=ns.dd_order, dd_block=ns.dd_block,
                    dd_inner=ns.dd_inner, plan_block=ns.plan_block,
                    plan_inner=ns.plan_inner, pred_async=ns.pred_async)
    pm = PredictionModel(cfg)  # full PSPNet-R50 at 720^2 (random weights)

    segmenter = None
    if not ns.gt_seg:
        from peanut_tpu.perception.mask_rcnn_segmenter import MaskRCNNSegmenter
        from peanut_tpu.models.mask_rcnn import MaskRCNN
        from peanut_tpu.models import init_segmentor_params  # noqa
        import jax

        model = MaskRCNN(num_classes=cfg.num_sem_categories - 1)
        import jax.numpy as jnp
        img = jnp.zeros((800, 1088, 3), jnp.float32)
        variables = jax.jit(
            lambda r, x: model.init(r, x, method=model.detect))(
            jax.random.PRNGKey(0), img)
        segmenter = MaskRCNNSegmenter(cfg, variables=variables)

    runner = BatchRunner(
        cfg,
        [lambda s=s: FakeNavEnv(cfg, size_m=14.0, seed=s,
                                emit_gt_seg=bool(ns.gt_seg)) for s in
         range(ns.envs)],
        prediction_model=pm, segmenter=segmenter, pipeline=ns.pipeline,
        batch_env=bool(ns.batch_env))

    # warmup (compile all tick programs, incl. the data-dependent replan /
    # magnify programs, which otherwise compile inside a measured tick)
    runner.reset_all()
    for _ in range(3):
        runner.tick()
    runner.warmup_rare_paths()
    runner.reset_timers()                  # report steady state only

    t0 = time.perf_counter()
    for _ in range(ns.ticks):
        runner.tick()
    dt = time.perf_counter() - t0

    import os as _os
    if _os.environ.get("PEANUT_TICK_PROFILE"):
        for rt in runner.runtimes:
            print(rt.timer.report())
    steps_per_sec = ns.envs * ns.ticks / dt
    print(json.dumps({
        "metric": "objectnav_env_steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "envs": ns.envs,
        "seg": "gt" if ns.gt_seg else "mask_rcnn_r101",
        "ms_per_tick": round(1000 * dt / ns.ticks, 1),
        "pipeline": ns.pipeline,
        "dd_downscale": ns.dd_downscale,
        "dd_order": ns.dd_order,
        "pred_async": ns.pred_async,
        "stage_ms": {k: round(v / ns.ticks * 1000, 1)
                     for k, v in runner.stage_totals().items()},
    }))


if __name__ == "__main__":
    main()

# appended: print tick-stage profile when PEANUT_TICK_PROFILE is set
