"""Inference FPS benchmark (reference prediction/tools/benchmark.py parity).

Measures steady-state maps/sec of a segmentor config at a given input size,
with warmup skipping and reliable device synchronization (scalar-checksum
fetch; see bench.py for why plain block_until_ready is not trusted on the
axon tunnel).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=None,
                    help="model config file (default: PEANUT prediction)")
    ap.add_argument("--size", type=int, default=720)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", choices=["float32", "bfloat16"],
                    default="bfloat16")
    ns = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..core.config_file import load_config
    from ..models import build_segmentor, init_segmentor_params
    from ..models.builder import peanut_prediction_config

    if ns.config:
        model_cfg = load_config(ns.config)["model"]
    else:
        model_cfg = peanut_prediction_config()
    in_ch = model_cfg["backbone"].get("in_channels", 3)
    model = build_segmentor(model_cfg)
    variables = init_segmentor_params(model, (1, ns.size, ns.size, in_ch))
    dtype = jnp.bfloat16 if ns.dtype == "bfloat16" else jnp.float32
    variables = jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, variables)

    @jax.jit
    def fwd_sum(v, x):
        return jnp.sum(model.apply(v, x, method=model.inference))

    xs = [jnp.asarray(np.random.rand(ns.batch, ns.size, ns.size, in_ch),
                      dtype) for _ in range(2)]
    for i in range(ns.warmup):
        float(fwd_sum(variables, xs[i % 2]))
    t0 = time.perf_counter()
    for i in range(ns.iters):
        float(fwd_sum(variables, xs[i % 2]))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "maps_per_sec": round(ns.batch * ns.iters / dt, 2),
        "ms_per_batch": round(1e3 * dt / ns.iters, 2),
        "batch": ns.batch, "size": ns.size, "dtype": ns.dtype,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
