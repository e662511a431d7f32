# Per-stage, per-level decomposition of the canonical pyramid cost
# (VERDICT #7: find the non-solver ~47 ms). Times each stage as its own
# jitted program, N chained calls, warm.
import numpy as np

from flowreg3d_tpu.core.pyramid import level_schedule, add_boundary
from flowreg3d_tpu.core.motion_tensor import MOTION_TENSORS
from flowreg3d_tpu.core.solver import compute_flow_level
from flowreg3d_tpu.ops.resize import resize_volume
from flowreg3d_tpu.ops.warp import imregister_wrapper
from flowreg3d_tpu.ops.median_pallas import median_filter_5x5x5_pallas

SHAPE = (64, 512, 512)
plan, eml, top = level_schedule(SHAPE, 0.8, 50, 5)
print("plan:", plan, flush=True)
rngp = np.random.default_rng(0)
full = jax.device_put(rngp.random(SHAPE + (1,), np.float64)
                      .astype(np.float32), dev)
mt = MOTION_TENSORS["gc"]


def timeit(label, fn, *args, n=20):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    f = jax.jit(fn)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"  {label}: {(time.perf_counter()-t0)/n*1e3:7.2f} ms", flush=True)


prev_size = None
for i, size, (hz, hy, hx) in plan:
    print(f"level {i} size={size} h=({hz:.2f},{hy:.2f},{hx:.2f})",
          flush=True)
    lvl = jax.device_put(rngp.random(size).astype(np.float32), dev)
    lvlb = jax.device_put(
        rngp.random(tuple(s + 2 for s in size)).astype(np.float32), dev)
    timeit("resize_full->lvl (x1 of 4)",
           lambda x, _s=size: resize_volume(x, _s), full)
    if prev_size is not None:
        plv = jax.device_put(
            rngp.random(prev_size).astype(np.float32), dev)
        timeit("resize_flow prev->lvl (x1 of 3)",
               lambda x, _s=size: resize_volume(x, _s), plv)
    timeit("warp lvl", lambda f2, u, f1: imregister_wrapper(
        f2, u, u, u, f1, interpolation_method="cubic"), lvl,
        jax.device_put(np.zeros(size, np.float32), dev), lvl)
    timeit("motion tensor", lambda a, b, _h=(hz, hy, hx): jnp.stack(
        mt(a, b, *_h)), lvl, lvl)

    J = [jax.device_put(
        rngp.random(tuple(s + 2 for s in size) + (1,)).astype(np.float32)
        * 0.1, dev) for _ in range(10)]
    wt = jax.device_put(
        np.ones(tuple(s + 2 for s in size) + (1,), np.float32), dev)
    timeit("solver 100it", lambda Jv, w_, a, b, c, _h=(hz, hy, hx):
        jnp.stack(compute_flow_level(Jv, w_, a, b, c, (0.25, 0.25, 0.25),
                                     100, 5, [0.45], 1.0, _h[2], _h[1],
                                     _h[0])), J, wt, lvlb, lvlb, lvlb)
    timeit("median (x1 of 3)", median_filter_5x5x5_pallas, lvl)
    prev_size = size
print("job_070 done", flush=True)
