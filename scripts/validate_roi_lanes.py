"""Hardware validation for the multi-lane ROI window kernel.

Runs ``roi_window_pool`` at the serving geometry with lanes forced to 1
(the round-2 hardware-validated single-ROI program) and lanes=auto (the
k-ROIs-per-step variant), checks bit-equality of the pooled outputs, and
times both.  Passing on the real chip is the gate for flipping
``kernels/roi_window._DEFAULT_LANES`` to "auto".

Usage: python scripts/validate_roi_lanes.py [--iters 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rois", type=int, default=8000,
                    help="box-stage population: 8 images x 1000 proposals")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from peanut_tpu.kernels import roi_window

    rng = np.random.RandomState(0)
    # serving-shaped stacked pyramid: sumH x maxW x 256 bf16 (p2..p5 of
    # 800x1088 stacked along H = 200+100+50+25 rows, 272 cols) + DMA pad
    win_y = win_x = 48
    hp, wp, c = 375 + win_y, 272 + win_x, 256
    flat = jnp.asarray(rng.rand(hp, wp, c).astype(np.float32),
                       jnp.bfloat16)
    n, p = args.rois, 7
    ay = jnp.asarray(rng.rand(n, p, win_y).astype(np.float32))
    ax = jnp.asarray(rng.rand(n, p, win_x).astype(np.float32))
    row0 = jnp.asarray(rng.randint(0, hp - win_y, n), jnp.int32)
    col0 = jnp.asarray((rng.randint(0, (wp - win_x) // 8, n) * 8),
                       jnp.int32)

    def run(lanes: str):
        os.environ["PEANUT_ROI_LANES"] = lanes
        roi_window.roi_window_pool.clear_cache()
        fn = lambda: roi_window.roi_window_pool(
            flat, ay, ax, row0, col0, win_y=win_y, win_x=win_x)
        out = fn()
        s = float(jnp.sum(out))          # sync through the tunnel
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = float(jnp.sum(fn()))
        dt = (time.perf_counter() - t0) / args.iters * 1000
        return np.asarray(out), dt, s

    out1, t1, _ = run("1")
    print(f"lanes=1    {t1:8.1f} ms / {n} ROIs")
    outk, tk, _ = run("auto")
    print(f"lanes=auto {tk:8.1f} ms / {n} ROIs  (speedup {t1 / tk:.2f}x)")

    if np.array_equal(out1, outk):
        print("OUTPUT: bit-equal")
        ok = True
    else:
        diff = np.abs(out1 - outk)
        print(f"OUTPUT: differs, max abs {diff.max():.3e} "
              f"({(diff > 0).mean() * 100:.4f}% cells)")
        ok = False
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
