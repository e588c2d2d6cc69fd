"""Sweep-kernel tiling experiments: where do the eikonal milliseconds go.

Times one directed Pallas sweep and the full eikonal solve at the serving
geometries under different batch-tile budgets / block / inner / scan_chunk
schedules.  Dev tool for VERDICT r4 items 1 and 3.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from peanut_tpu.kernels import fmm_pallas as FP
    from peanut_tpu.kernels.fmm import eikonal_distance

    rng = np.random.RandomState(0)
    B, H, W = 16, 482, 482
    trav = rng.rand(B, H, W) > 0.05
    src = np.zeros((B, H, W), bool)
    src[:, H // 2, W // 2] = True
    wall = ~trav & ~src
    d0 = np.where(src, 0.0, 1e10).astype(np.float32)

    dd = jnp.asarray(d0)
    wd = jnp.asarray(wall)
    sd = jnp.asarray(src)

    def timeit(name, fn, iters=6):
        out = fn()
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
            float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:<58}{dt:9.1f} ms", flush=True)
        return dt

    tiny = jnp.zeros((8,), jnp.float32)
    sync = jax.jit(jnp.sum)
    float(sync(tiny))
    t0 = time.perf_counter()
    for _ in range(8):
        float(sync(tiny))
    print(f"{'sync overhead':<58}"
          f"{(time.perf_counter() - t0) / 8 * 1000:9.1f} ms")

    import functools

    for budget in (400_000, 2_000_000, 8_000_000):
        FP._TILE_BUDGET = budget
        for block, inner, chunk in ((8, 24, 1), (8, 24, 4), (8, 24, 8),
                                    (16, 40, 1), (16, 40, 4), (16, 40, 8),
                                    (32, 72, 8), (16, 16, 4), (8, 16, 4)):
            if inner % chunk:
                continue
            fn = jax.jit(functools.partial(
                FP.v_sweep_pallas, reverse=False, block=block, inner=inner,
                scan_chunk=chunk))
            timeit(f"sweep o1 bud={budget//1000}k blk={block} "
                   f"inner={inner} chunk={chunk}",
                   lambda fn=fn: fn(dd, wd))
        for block, inner in ((8, 24), (16, 40)):
            fn2 = jax.jit(functools.partial(
                FP.v_sweep2_pallas, reverse=False, block=block, inner=inner))
            timeit(f"sweep o2 bud={budget//1000}k blk={block} inner={inner}",
                   lambda fn=fn2: fn(dd, wd, sd))

    FP._TILE_BUDGET = 400_000
    for blk, inn, chunk in ((8, 24, 1), (8, 24, 4)):
        fn = jax.jit(functools.partial(
            eikonal_distance, n_iters=2, block=blk, inner=inn, order=1,
            scan_chunk=chunk))
        timeit(f"eikonal o1 full bud=400k blk={blk} inner={inn} ch={chunk}",
               lambda fn=fn: fn(jnp.asarray(trav), sd))
    FP._TILE_BUDGET = 8_000_000
    for blk, inn, chunk in ((8, 24, 1), (8, 24, 4), (16, 40, 4)):
        fn = jax.jit(functools.partial(
            eikonal_distance, n_iters=2, block=blk, inner=inn, order=1,
            scan_chunk=chunk))
        timeit(f"eikonal o1 full bud=8M blk={blk} inner={inn} ch={chunk}",
               lambda fn=fn: fn(jnp.asarray(trav), sd))
    fn = jax.jit(functools.partial(
        eikonal_distance, n_iters=2, block=8, inner=24, order=2))
    timeit("eikonal o2 full bud=8M blk=8 inner=24",
           lambda fn=fn: fn(jnp.asarray(trav), sd))


if __name__ == "__main__":
    main()
