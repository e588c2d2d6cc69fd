"""Hardware validation for the multi-lane roi_window_pool program.

Compares lanes=2/4/8 outputs bitwise against the round-2-validated
lanes=1 program at the serving window geometry, and times each variant,
so the multi-lane default (kernels/roi_window.py::_DEFAULT_LANES) can be
flipped with evidence.

Usage: python scripts/validate_roi_lanes.py [--n 8000] [--iters 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8000)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--win", type=int, default=40)
    ap.add_argument("--p", type=int, default=7)
    ap.add_argument("--c", type=int, default=256)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
    import jax
    import jax.numpy as jnp

    import peanut_tpu.kernels.roi_window as rw

    rng = np.random.RandomState(0)
    hp, wp = 640, 1152  # stacked-pyramid-ish buffer, padded
    flat = jnp.asarray(rng.rand(hp, wp, args.c).astype(np.float32),
                       dtype=jnp.bfloat16)
    ay = jnp.asarray(rng.rand(args.n, args.p, args.win).astype(np.float32))
    ax = jnp.asarray(rng.rand(args.n, args.p, args.win).astype(np.float32))
    row0 = jnp.asarray(rng.randint(0, hp - args.win, args.n), jnp.int32)
    col0 = jnp.asarray(
        (rng.randint(0, (wp - args.win) // 8, args.n) * 8), jnp.int32)

    def run(lanes):
        os.environ["PEANUT_ROI_LANES"] = str(lanes)
        fn = lambda: rw.roi_window_pool(flat, ay, ax, row0, col0,
                                        win_y=args.win, win_x=args.win)
        out = fn()
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn()
            out.block_until_ready()
        dt = (time.perf_counter() - t0) / args.iters * 1000
        return np.asarray(out), dt

    ref, t1 = run(1)
    print(f"lanes=1: {t1:8.2f} ms  (reference)")
    ok_all = True
    for lanes in (2, 4, 8):
        if args.n % lanes:
            continue
        out, t = run(lanes)
        bitwise = np.array_equal(out, ref)
        ok_all &= bitwise
        print(f"lanes={lanes}: {t:8.2f} ms  bitwise=={bitwise}"
              f"  max|d|={np.abs(out - ref).max():.3e}")
    out, t = run("auto")
    print(f"lanes=auto: {t:6.2f} ms  bitwise=={np.array_equal(out, ref)}")
    print("VALIDATED" if ok_all else "MISMATCH")


if __name__ == "__main__":
    main()
