# Full-res QUALITY preset (min_level=0) volumes/sec — the reference's
# default quality config; routes 512x512-plane levels through the y-tiled
# solver kernels inside the real pyramid.
import numpy as np

from flowreg3d_tpu.core.pyramid import build_pyramid_raw, pyramid_config_key
from flowreg3d_tpu.ops.warp import imregister_wrapper

SHAPE = (64, 512, 512)
qkey = pyramid_config_key(
    SHAPE, 1, alpha=(0.25, 0.25, 0.25), update_lag=5, iterations=50,
    min_level=0, levels=50, eta=0.8, a_smooth=1.0, a_data=0.45)
vol = jax.ShapeDtypeStruct(SHAPE + (1,), np.float32)
flo = jax.ShapeDtypeStruct(SHAPE + (3,), np.float32)
t0 = time.perf_counter()
qpyr = jax.jit(build_pyramid_raw(*qkey), device=dev).lower(
    vol, vol, flo, vol).compile()
print(f"quality pyramid compiled in {time.perf_counter()-t0:.1f}s",
      flush=True)
qwarp = jax.jit(
    lambda moving, flow, fixed: imregister_wrapper(
        moving, flow[..., 0], flow[..., 1], flow[..., 2], fixed,
        interpolation_method="cubic"),
    device=dev).lower(vol, flo, vol).compile()

# reuse job_010 inputs if present, else synthesize
try:
    fxq, mvq, wtq = ns_fx, ns_mv, ns_wt
except NameError:
    rngq = np.random.default_rng(0)
    f = rngq.random(SHAPE).astype(np.float32)
    fxq = jax.device_put(f[..., None], dev)
    mvq = jax.device_put(np.roll(f, (1, 5, -4), (0, 1, 2))[..., None], dev)
    wtq = jax.device_put(np.ones(SHAPE + (1,), np.float32), dev)
uq = jax.device_put(np.zeros(SHAPE + (3,), np.float32), dev)


def qstream(n):
    u = uq
    last = None
    for _ in range(n):
        flow = qpyr(fxq, mvq, u, wtq)
        last = qwarp(mvq, flow, fxq)
        u = flow
    return float(jnp.sum(last[0, 0, 0]) + jnp.sum(u[0, 0, 0]))


qstream(1)
t0 = time.perf_counter()
qstream(4)
dt = (time.perf_counter() - t0) / 4
print(f"QUALITY preset (min_level=0, 50 iters): {dt:.3f} s/volume = "
      f"{1.0/dt:.3f} volumes/sec", flush=True)
print("job_050 done", flush=True)
