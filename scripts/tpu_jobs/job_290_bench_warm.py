# Warm the driver bench path with round-5 code (exact bench.py programs)
# and record the round-5 kernel-level number: pipelined 8-step stream.
ns_cleanup(globals())
import os
import numpy as np
for k in ("FLOWREG3D_PALLAS_SOLVER", "FLOWREG3D_PALLAS_MEDIAN",
          "FLOWREG3D_PALLAS_WARP", "FLOWREG3D_WARP_MIN_VOX",
          "FLOWREG3D_WARP_INT8"):
    os.environ.pop(k, None)
ns_fresh()
jax.clear_caches()
from scipy.ndimage import gaussian_filter

from flowreg3d_tpu.core.pyramid import build_pyramid_raw, pyramid_config_key
from flowreg3d_tpu.ops.warp import imregister_wrapper

FLOW_PARAMS = dict(alpha=(0.25, 0.25, 0.25), update_lag=5, iterations=100,
                   min_level=5, levels=50, eta=0.8, a_smooth=1.0,
                   a_data=0.45, const_assumption="gc")
SHAPE = (64, 512, 512)
key = pyramid_config_key(SHAPE, 1, **FLOW_PARAMS)
vol = jax.ShapeDtypeStruct(SHAPE + (1,), np.float32)
flo = jax.ShapeDtypeStruct(SHAPE + (3,), np.float32)
t0 = time.perf_counter()
pyramid = jax.jit(build_pyramid_raw(*key), device=dev).lower(
    vol, vol, flo, vol).compile()
warp = jax.jit(
    lambda moving, flow, fixed: imregister_wrapper(
        moving, flow[..., 0], flow[..., 1], flow[..., 2], fixed,
        interpolation_method="cubic"),
    device=dev).lower(vol, flo, vol).compile()
print(f"bench programs compiled {time.perf_counter()-t0:.1f}s", flush=True)

rng = np.random.default_rng(0)
blobs = np.zeros(SHAPE, np.float32)
idx = tuple(rng.integers(2, s - 2, 4000) for s in SHAPE)
blobs[idx] = rng.random(4000).astype(np.float32) + 0.5
fixed = gaussian_filter(blobs, (1.0, 2.0, 2.0)).astype(np.float32)
fixed /= fixed.max()
moving = np.roll(fixed, (1, 5, -4), axis=(0, 1, 2))
fx = jax.device_put(fixed[..., None], dev)
mv = jax.device_put(moving[..., None], dev)
uvw = jax.device_put(np.zeros(SHAPE + (3,), np.float32), dev)
wt = jax.device_put(np.ones(SHAPE + (1,), np.float32), dev)


def stream(n):
    reg = mv
    u = uvw
    for _ in range(n):
        flow = pyramid(fx, reg, u, wt)
        reg = warp(mv, flow, fx)
        u = flow
    return jax.block_until_ready(reg)


stream(2)
t0 = time.perf_counter()
stream(8)
dt = (time.perf_counter() - t0) / 8
print(f"pipelined stream: {dt:.4f} s/volume = {1/dt:.3f} vol/s", flush=True)
# per-component on the converged flow
flow = jax.block_until_ready(pyramid(fx, mv, uvw, wt))
t0 = time.perf_counter()
for _ in range(10):
    flow2 = pyramid(fx, mv, uvw, wt)
jax.block_until_ready(flow2)
pms = (time.perf_counter() - t0) / 10 * 1e3
t0 = time.perf_counter()
for _ in range(5):
    reg = warp(mv, flow, fx)
jax.block_until_ready(reg)
wms = (time.perf_counter() - t0) / 5 * 1e3
print(f"pyramid {pms:.1f} ms, warp {wms:.1f} ms (step-1 flow)", flush=True)
ns_record("job_290_bench_warm", {
    "s_per_volume": round(dt, 4), "vol_per_s": round(1 / dt, 3),
    "pyramid_ms": round(pms, 1), "warp_ms": round(wms, 1)})
print("job_290 done", flush=True)
