"""Honest device-side timings of the runtime's heavy pieces (checksum sync)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

def timeit(name, fn, *args, n=5):
    s = float(fn(*args))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(n):
        s = float(fn(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:<42} {dt*1e3:8.1f} ms")
    return dt

B = 16
from peanut_tpu.kernels import eikonal_distance, masked_fill_unreachable
from peanut_tpu.kernels.morphology import disk
from peanut_tpu.agent import batched_ops as Bops
from peanut_tpu.config import NavConfig
from peanut_tpu.mapping import SemanticMapper

rng = np.random.RandomState(0)

# local FMM (16, 482, 482)
trav = jnp.asarray(rng.rand(B, 482, 482) > 0.2)
src = jnp.zeros((B, 482, 482), bool).at[:, 200, 200].set(True)
f1 = jax.jit(lambda t, s: jnp.sum(jnp.where(jnp.isfinite(
    eikonal_distance(t, s, n_iters=2)), eikonal_distance(t, s, n_iters=2), 0.0)))
timeit("fmm local (16,482,482) x2iter", f1, trav, src)

# full FMM (16, 960, 960)
trav2 = jnp.asarray(rng.rand(B, 960, 960) > 0.2)
src2 = jnp.zeros((B, 960, 960), bool).at[:, 480, 480].set(True)
timeit("fmm full (16,960,960) x2iter", f1, trav2, src2)

# mapper
cfg = NavConfig()
m = SemanticMapper(cfg)
obs = jnp.asarray(rng.rand(B, 14, 120, 160).astype(np.float32))
poses = jnp.asarray(rng.rand(B, 3).astype(np.float32) * 10)
maps = jnp.zeros((B, 14, 480, 480))
fm = jax.jit(lambda o, p, mm: jnp.sum(m.update_core(o, p, mm)[1]))
timeit("mapper exact-splat (16 envs)", fm, obs, poses, maps)

cfg2 = cfg.replace(exact_parity=False)
m2 = SemanticMapper(cfg2)
fm2 = jax.jit(lambda o, p, mm: jnp.sum(m2.update_core(o, p, mm)[1]))
timeit("mapper fast-splat (16 envs)", fm2, obs, poses, maps)

# morphology
g = jnp.asarray(rng.rand(B, 960, 960).astype(np.float32))
fd = jax.jit(lambda x: jnp.sum(Bops.batch_dilate(x, disk(4)).astype(jnp.float32)))
timeit("dilate disk4 (16,960,960)", fd, g)

# prediction f32 vs bf16
from peanut_tpu.models import build_segmentor, init_segmentor_params
from peanut_tpu.models.builder import peanut_prediction_config
model = build_segmentor(peanut_prediction_config())
v = init_segmentor_params(model, (1, 720, 720, 14))
x = jnp.asarray(rng.rand(B, 720, 720, 14).astype(np.float32))
fp = jax.jit(lambda vv, xx: jnp.sum(model.apply(vv, xx, method=model.inference)))
timeit("prednet f32 (16,720,720)", fp, v, x, n=3)
vb = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if hasattr(a,'dtype') and a.dtype==jnp.float32 else a, v)
xb = x.astype(jnp.bfloat16)
timeit("prednet bf16 (16,720,720)", fp, vb, xb, n=3)
