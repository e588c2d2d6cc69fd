"""Standalone device timings of the fused tick program's components at the
bench geometry (dev tool; answers "where do the 1000 ms of tick_wait go").

Each component is timed as its own jit with a device-scalar fetch closing
the window (the axon tunnel does not honour block_until_ready), so numbers
include one dispatch+RTT each — subtract the printed sync overhead to
compare against the fused program.
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from peanut_tpu.config import NavConfig
    from peanut_tpu.agent import batched_ops as B
    from peanut_tpu.kernels.fmm import eikonal_distance
    from peanut_tpu.mapping.semantic_map import SemanticMapper

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cfg = NavConfig(exact_parity=False, serve_bf16=True)
    Hl = Wl = cfg.map_size // cfg.global_downscaling       # 480
    Hf = Wf = cfg.map_size                                 # 960
    fh, fw = cfg.frame_height, cfg.frame_width
    nc = cfg.num_map_channels
    rng = np.random.RandomState(0)

    def timeit(name, fn, *args, iters=6):
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:<42}{dt:9.1f} ms")
        return dt

    tiny = jnp.zeros((8,), jnp.float32)
    sync = jax.jit(jnp.sum)
    float(sync(tiny))
    t0 = time.perf_counter()
    for _ in range(8):
        float(sync(tiny))
    print(f"{'sync overhead (dispatch+RTT)':<42}"
          f"{(time.perf_counter() - t0) / 8 * 1000:9.1f} ms")

    # --- mapper update -------------------------------------------------
    mapper = SemanticMapper(cfg)
    obs = jnp.asarray(rng.rand(n, 4 + cfg.num_sem_categories, fh, fw),
                      jnp.float32)
    poses = jnp.asarray(
        np.tile([Hl * cfg.map_resolution / 200.0,
                 Hl * cfg.map_resolution / 200.0, 0.0], (n, 1)), jnp.float32)
    lmaps = jnp.zeros((n, nc, Hl, Wl), jnp.float32)
    upd = jax.jit(lambda o, p, m: mapper.update_core(o, p, m)[1])
    timeit(f"mapper.update_core ({n},{nc},{Hl},{Wl})", upd, obs, poses,
           lmaps)

    # --- local planning distance fields (every tick) --------------------
    trav = jnp.asarray(rng.rand(n, Hl, Wl) > 0.05)
    goal = jnp.zeros((n, Hl, Wl), jnp.float32)
    goal = goal.at[:, Hl // 4, Wl // 4].set(1.0)
    locs = jnp.full((n,), Hl // 2, jnp.int32)
    plan = jax.jit(lambda t, g: B.plan_distance_fields(
        t, g, locs, locs, n_iters=cfg.fmm_sweeps))
    timeit(f"plan_distance_fields ({n},{Hl},{Wl})", plan, trav, goal)

    # --- the eikonal solve alone (both geometries) ----------------------
    src = jnp.zeros((n, Hl, Wl))
    src = src.at[:, Hl // 2, Wl // 2].set(1.0)
    eik = jax.jit(lambda t, s: eikonal_distance(t, s,
                                                n_iters=cfg.fmm_sweeps))
    timeit(f"eikonal_distance ({n},{Hl},{Wl}) o2", eik, trav, src)

    eik1 = jax.jit(lambda t, s: eikonal_distance(
        t, s, n_iters=cfg.fmm_sweeps, order=1))
    timeit(f"eikonal_distance ({n},{Hl},{Wl}) o1", eik1, trav, src)

    k = 8
    trav_f = jnp.asarray(rng.rand(k, Hf, Wf) > 0.05)
    src_f = jnp.zeros((k, Hf, Wf))
    src_f = src_f.at[:, Hf // 2, Wf // 2].set(1.0)
    timeit(f"eikonal_distance ({k},{Hf},{Wf}) o2 [dd ds=1]", eik, trav_f,
           src_f, iters=3)
    trav_h = trav_f[:, ::2, ::2]
    src_h = src_f[:, ::2, ::2]
    timeit(f"eikonal_distance ({k},{Hf // 2},{Wf // 2}) o2 [dd ds=2]",
           eik, trav_h, src_h)

    # --- morphology (goal erode/dilate, traversible build) --------------
    cat = jnp.asarray(rng.rand(n, Hl, Wl) > 0.9, jnp.float32)
    from peanut_tpu.agent.batched_ops import batch_erode, batch_dilate
    CROSS = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], np.uint8)
    morph = jax.jit(lambda x: batch_dilate(
        batch_erode(batch_erode(batch_erode(x, CROSS), CROSS), CROSS),
        CROSS))
    timeit(f"erode x3 + dilate ({n},{Hl},{Wl})", morph, cat)

    # --- window shuttles -------------------------------------------------
    fmaps = jnp.zeros((n, nc, Hf, Wf), jnp.float32)
    lmb = jnp.tile(jnp.asarray([[240, 720, 240, 720]], jnp.int32), (n, 1))
    sh_out = jax.jit(lambda f, l, m: B.window_shuttle_out(f, l, m))
    timeit(f"window_shuttle_out ({n},{nc},{Hf},{Wf})", sh_out, fmaps,
           lmaps, lmb)
    sh_in = jax.jit(lambda f, m: B.window_shuttle_in(f, m, Hl, Wl))
    timeit(f"window_shuttle_in  ({n},{nc},{Hf},{Wf})", sh_in, fmaps, lmb)


if __name__ == "__main__":
    main()
