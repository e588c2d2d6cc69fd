"""Sharding-overhead measurement on the virtual CPU mesh (VERDICT r4
item 6: measure scaling, not just correctness).

On one physical host the 8 "devices" timeshare the same cores, so wall
time cannot show a speedup; what IS measurable — and what this script and
tests/test_scaling_overhead.py record — is the GSPMD partitioning
overhead: the same total work run (a) unsharded on 1 device vs (b)
sharded over the 8-device mesh.  ratio = t_sharded / t_unsharded; on real
chips the per-chip time then scales as t_unsharded * ratio / C for the
embarrassingly-data-parallel paths (episodes, training batch).

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python scripts/measure_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def _time(fn, *a, iters=3):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def train_step_overhead(n_dev: int = 8, batch: int = 8, crop: int = 128):
    """Same global batch: unsharded 1-device vs data-sharded mesh."""
    import jax.numpy as jnp
    import optax

    from peanut_tpu.core.mesh import make_mesh
    from peanut_tpu.models import build_segmentor, init_segmentor_params
    from peanut_tpu.prediction.train import TrainConfig, make_train_step

    base = 16
    model_cfg = dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNetV1c", depth=50, num_stages=4,
                      out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                      strides=(1, 2, 1, 1), contract_dilation=True,
                      base_channels=base, stem_channels=base,
                      in_channels=14),
        decode_head=dict(type="PSPHead", in_channels=base * 32, in_index=3,
                         channels=base * 8, pool_scales=(1, 2, 3, 6),
                         dropout_ratio=0.1, num_classes=6,
                         align_corners=False),
        auxiliary_head=dict(type="FCNHead", in_channels=base * 16,
                            in_index=2, channels=base * 4, num_convs=1,
                            concat_input=False, dropout_ratio=0.1,
                            num_classes=6, align_corners=False),
        test_cfg=dict(mode="whole"),
    )
    from peanut_tpu.prediction.train import create_train_state

    model = build_segmentor(model_cfg)
    variables = init_segmentor_params(model, (1, crop, crop, 14))
    cfg = TrainConfig(max_iters=10, batch_size=batch)
    import optax as _o
    state, tx = create_train_state(model, variables, cfg,
                                   tx=_o.adam(1e-4))
    rng = np.random.RandomState(0)
    b = {"img": jnp.asarray(rng.rand(batch, crop, crop, 14), jnp.float32),
         "gt": jnp.asarray(
             (rng.rand(batch, crop, crop, 6) > 0.9) * 255.0)}

    step1, _ = make_train_step(model, cfg, tx, mesh=None)
    t1 = _time(lambda: step1(state, b)[1]["loss"])

    mesh = make_mesh({"data": n_dev})
    with mesh:
        stepN, _ = make_train_step(model, cfg, tx, mesh=mesh)
        tN = _time(lambda: stepN(state, b)[1]["loss"])
    return t1, tN


def nav_tick_overhead(n_dev: int = 8, envs: int = 8):
    """Same 8-env tick: unsharded vs episodes sharded over the mesh."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_agent_e2e import small_cfg, tiny_prediction_model

    from peanut_tpu.agent.batched_runtime import BatchedNavRuntime
    from peanut_tpu.core.mesh import make_mesh
    from peanut_tpu.envs import FakeNavEnv

    cfg = small_cfg()
    pm = tiny_prediction_model(cfg)

    def run(mesh):
        rt = BatchedNavRuntime(cfg, envs, prediction_model=pm, mesh=mesh)
        es = [FakeNavEnv(cfg, size_m=10.0, seed=s, max_steps=50)
              for s in range(envs)]
        obs = [e.reset() for e in es]
        for i in range(envs):
            rt.reset_env(i)
        acts = rt.act_batch(obs)                     # compile + warm
        obs = [e.step(a) for e, a in zip(es, acts)]
        t0 = time.perf_counter()
        for _ in range(5):
            acts = rt.act_batch(obs)
            obs = [e.step(a) for e, a in zip(es, acts)]
        return (time.perf_counter() - t0) / 5

    t1 = run(None)
    tN = run(make_mesh({"data": n_dev}))
    return t1, tN


def main():
    t1, tN = train_step_overhead()
    print(json.dumps({"workload": "train_step b8 crop128",
                      "t_unsharded_s": round(t1, 3),
                      "t_sharded8_s": round(tN, 3),
                      "overhead_ratio": round(tN / t1, 3)}))
    u1, uN = nav_tick_overhead()
    print(json.dumps({"workload": "nav tick 8 envs",
                      "t_unsharded_s": round(u1, 3),
                      "t_sharded8_s": round(uN, 3),
                      "overhead_ratio": round(uN / u1, 3)}))


if __name__ == "__main__":
    main()
