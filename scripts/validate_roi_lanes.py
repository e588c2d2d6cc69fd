"""Validate the multi-lane ROI window kernel on the real chip.

Round-3 follow-up to kernels/roi_window.py: the k-ROIs-per-step program is
numerics-proven in interpret mode (tests/test_roi_window.py) but was left
gated behind PEANUT_ROI_LANES=1 until compile-validated on hardware.  This
script (a) checks bit-parity of lanes=2/4/8 vs the hardware-validated
lanes=1 program at the serving geometry, and (b) times each, so the default
can be flipped with data.

Run ON the TPU (no JAX_PLATFORMS override):
    python scripts/validate_roi_lanes.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from peanut_tpu.kernels import roi_window

    # serving-geometry-shaped problem: stacked FPN pyramid of one 800x1088
    # image (levels /4../32 stacked along rows), win 40x48 (col-widened),
    # p=7, C=256, n=2048 ROIs (box stage: 8 imgs x 256-ROI chunks)
    rng = np.random.RandomState(0)
    hp, wp, c = 200 + 100 + 50 + 25 + 48, 272 + 48, 256
    win_y, win_x, p = 40, 48, 7
    n = 2048
    flat = jnp.asarray(rng.rand(hp, wp, c), jnp.bfloat16)
    ay = jnp.asarray(rng.rand(n, p, win_y), jnp.float32)
    ax = jnp.asarray(rng.rand(n, p, win_x), jnp.float32)
    row0 = jnp.asarray(rng.randint(0, hp - win_y, size=n), jnp.int32)
    col0 = jnp.asarray((rng.randint(0, (wp - win_x) // 8, size=n)) * 8,
                       jnp.int32)

    results = {}
    for lanes in ("1", "2", "4", "8"):
        os.environ["PEANUT_ROI_LANES"] = lanes
        # static_argnames-only jit: lane count is read inside, so clear the
        # cache to force retrace under the new env var
        roi_window.roi_window_pool.clear_cache()
        out = roi_window.roi_window_pool(flat, ay, ax, row0, col0,
                                         win_y=win_y, win_x=win_x)
        s = float(jnp.sum(out))  # force + fetch (tunnel-safe sync)
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            out = roi_window.roi_window_pool(flat, ay, ax, row0, col0,
                                             win_y=win_y, win_x=win_x)
            float(jnp.sum(out))
        ms = (time.perf_counter() - t0) / iters * 1000
        results[lanes] = (np.asarray(out), s, ms)
        print(f"lanes={lanes}: {ms:7.2f} ms/call  checksum={s:.6e}",
              flush=True)

    ref = results["1"][0]
    ok = True
    for lanes in ("2", "4", "8"):
        diff = np.max(np.abs(results[lanes][0] - ref))
        print(f"lanes={lanes}: max |diff| vs lanes=1 = {diff}")
        ok &= diff == 0.0
    print("PARITY " + ("OK — safe to flip _DEFAULT_LANES to auto"
                       if ok else "FAILED"))


if __name__ == "__main__":
    main()
