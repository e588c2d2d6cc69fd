"""Hardware validation for the multi-lane ROI window kernel.

Bit-checks EVERY lane count ``_pick_lanes`` can select (2/4/8) against the
lanes=1 single-ROI program — not just the one auto picks at the serving
geometry.  Two geometries are exercised:

  * serving (win 48, C=256): only lanes=2 fits the 8 MiB VMEM window
    budget; larger counts are reported as skipped-by-budget (auto can
    never pick them here).
  * small (win 16, C=128): lanes 2, 4 AND 8 all fit, covering the counts
    auto selects at smaller windows/channels.

Timing blocks on the pooled output itself (``block_until_ready``); the
checksum host fetch happens once for correctness only, so the reported
delta is the kernel's, not the reduce+transfer overhead's.

Passing on the real chip is the gate for ``kernels/roi_window.
_DEFAULT_LANES = "auto"``.

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


def run_geometry(name, hp, wp, c, win, n, iters):
    import jax.numpy as jnp
    from peanut_tpu.kernels import roi_window

    rng = np.random.RandomState(0)
    p = 7
    flat = jnp.asarray(rng.rand(hp + win, wp + win, c).astype(np.float32),
                       jnp.bfloat16)
    ay = jnp.asarray(rng.rand(n, p, win).astype(np.float32))
    ax = jnp.asarray(rng.rand(n, p, win).astype(np.float32))
    row0 = jnp.asarray(rng.randint(0, hp, n), jnp.int32)
    col0 = jnp.asarray(rng.randint(0, wp // 8, n) * 8, jnp.int32)

    def run(lanes: str):
        os.environ["PEANUT_ROI_LANES"] = lanes
        roi_window.roi_window_pool.clear_cache()
        fn = lambda: roi_window.roi_window_pool(
            flat, ay, ax, row0, col0, win_y=win, win_x=win)
        out = fn()
        out.block_until_ready()               # warm (compile)
        checksum = float(jnp.sum(out))        # one-time correctness sync
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        # one device-scalar fetch closes the timed window: the axon tunnel
        # does not honour block_until_ready reliably, and a single fetch
        # amortized over `iters` adds ~RTT/iters of bias instead of the
        # per-iteration reduce+transfer the old loop paid
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / iters * 1000
        return np.asarray(out), dt, checksum

    print(f"[{name}] win={win} C={c} n={n}")
    out1, t1, _ = run("1")
    print(f"  lanes=1  {t1:8.2f} ms / {n} ROIs")
    ok = True
    itemsize = 2  # bf16 windows
    for k in (2, 4, 8):
        if n % k:
            print(f"  lanes={k}  skipped (n % {k} != 0)")
            continue
        need = 2 * k * win * win * c * itemsize
        if need > roi_window._WBUF_BUDGET:
            print(f"  lanes={k}  skipped by VMEM budget "
                  f"({need / 2 ** 20:.1f} MiB > "
                  f"{roi_window._WBUF_BUDGET / 2 ** 20:.0f} MiB; auto can "
                  "never pick it at this geometry)")
            continue
        outk, tk, _ = run(str(k))
        equal = np.array_equal(out1, outk)
        ok &= equal
        status = "bit-equal" if equal else \
            f"DIFFERS max {np.abs(out1 - outk).max():.3e}"
        print(f"  lanes={k}  {tk:8.2f} ms  (vs lanes=1: {t1 / tk:.2f}x)  "
              f"{status}")
    os.environ.pop("PEANUT_ROI_LANES", None)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    ok = True
    # serving geometry: stacked p2..p5 pyramid of 800x1088 (375 rows x
    # 272 cols x 256), box-stage population 8 x 1000 ROIs
    ok &= run_geometry("serving", 375, 272, 256, 48, 8000, args.iters)
    # small geometry where lanes 4 and 8 fit the budget (the counts auto
    # selects for smaller windows/channels)
    ok &= run_geometry("small", 192, 144, 128, 16, 4096, args.iters)
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
