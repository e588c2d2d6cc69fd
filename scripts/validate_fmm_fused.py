"""On-device decision validation of the fused eikonal path (round 5).

The CPU test suite gates the composed solver (tests/test_fmm_oracle.py);
the fused kernel only runs on real TPU, so this script re-runs the oracle
accuracy + planner-decision checks there and — the sharpest gate —
verifies the fused path is DECISION-EQUIVALENT to the composed TPU path
on the same worlds (stop/replan flips and STG descent gaps between the
two fields).

Measured round 5 (seeds 11-13, 480^2 make_floorplan):
  * serving plan profile (o2, blk8/in24): oracle decisions OK (gap<=0.5),
    field max 11.0 / mean 2.05 — identical stats to the CPU baseline in
    test_plan_serving_tiling_decisions.
  * exact tiling (o2, blk16/in40): ONE 1.68-cell STG descent-gap outlier
    vs the oracle — present with the fused path ON and OFF (bit-identical
    gap), i.e. a pre-existing property of the TPU composed path, not a
    fused regression.

Usage: python scripts/validate_fmm_fused.py [--seeds 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ns = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    import numpy as np

    from heap_fmm_oracle import heap_fmm
    from test_fmm_oracle import (check_decisions, make_floorplan,
                                 random_goal, solver_field)
    from peanut_tpu.kernels import fmm

    print(f"backend={jax.default_backend()}")
    failures = []

    profiles = (("plan o2 blk8/in24 [serving]", dict(block=8, inner=24)),
                ("plan o2 blk16/in40 [exact]", dict(block=16, inner=40)),
                ("dd o1 blk8/in24 ch4 [serving]",
                 dict(block=8, inner=24, order=1, scan_chunk=4)))

    for name, kw in profiles:
        worst_max = worst_mean = 0.0
        t_solve = 0.0
        flips = 0
        gap_vs_composed = 0.0
        oracle_ok = "OK"
        for seed in range(11, 11 + ns.seeds):
            rng = np.random.RandomState(seed)
            trav = make_floorplan(rng, n=480, room=96, clutter=120)
            src = random_goal(rng, trav)
            want = heap_fmm(trav, src)
            t0 = time.perf_counter()
            got = solver_field(trav, src, **kw)
            t_solve += time.perf_counter() - t0
            fin = np.isfinite(want) & np.isfinite(got)
            err = np.abs(got[fin] - want[fin])
            worst_max = max(worst_max, float(err.max()))
            worst_mean = max(worst_mean, float(err.mean()))
            # oracle decision check (report, don't abort)
            try:
                check_decisions(trav, want, got,
                                np.random.RandomState(seed), stg_gap_tol=0.5)
            except AssertionError as e:
                oracle_ok = f"DEVIATION ({e})"   # sticky across seeds
            # fused vs composed decision equivalence on the same world
            os.environ["PEANUT_FMM_FUSED"] = "0"
            composed = solver_field(trav, src, **kw)
            del os.environ["PEANUT_FMM_FUSED"]
            try:
                check_decisions(trav, composed, got,
                                np.random.RandomState(seed), stg_gap_tol=0.25)
            except AssertionError as e:
                flips += 1
                gap_vs_composed = max(gap_vs_composed,
                                      float(str(e).split()[-1])
                                      if "gap" in str(e) else 1.0)
        line = (f"{name:<32} max={worst_max:6.2f} mean<={worst_mean:5.2f} "
                f"oracle:{oracle_ok}  vs-composed "
                f"{'EQUIV' if flips == 0 else f'{flips} seeds diverge'} "
                f"({t_solve / ns.seeds * 1000:7.1f} ms/solve incl fetch)")
        print(line, flush=True)
        if flips:
            failures.append(name)

    if failures:
        print(f"FUSED-vs-COMPOSED DIVERGENCE in: {failures}")
        sys.exit(1)
    print("FUSED PATH DECISION-EQUIVALENT TO COMPOSED ON ALL PROFILES")


if __name__ == "__main__":
    main()
