# Canonical bench measurement inline (claim already held by the server).
# Mirrors bench.py's protocol: AOT pyramid+warp, 2 warm + 8 measured
# chained steps synced once; plus per-component pyramid/warp timings.
import numpy as np
from scipy.ndimage import gaussian_filter

from flowreg3d_tpu.core.pyramid import build_pyramid_raw, pyramid_config_key
from flowreg3d_tpu.ops.warp import imregister_wrapper

SHAPE = (64, 512, 512)
FLOW_PARAMS = dict(alpha=(0.25, 0.25, 0.25), update_lag=5, iterations=100,
                   min_level=5, levels=50, eta=0.8, a_smooth=1.0,
                   a_data=0.45, const_assumption="gc")

rng = np.random.default_rng(0)
blobs = np.zeros(SHAPE, np.float32)
idx = tuple(rng.integers(2, s - 2, 4000) for s in SHAPE)
blobs[idx] = rng.random(4000).astype(np.float32) + 0.5
fixed_np = gaussian_filter(blobs, (1.0, 2.0, 2.0)).astype(np.float32)
fixed_np /= fixed_np.max()
moving_np = np.roll(fixed_np, (1, 5, -4), axis=(0, 1, 2))

key = pyramid_config_key(SHAPE, 1, **FLOW_PARAMS)
vol = jax.ShapeDtypeStruct(SHAPE + (1,), np.float32)
flo = jax.ShapeDtypeStruct(SHAPE + (3,), np.float32)
t0 = time.perf_counter()
pyramid = jax.jit(build_pyramid_raw(*key), device=dev).lower(
    vol, vol, flo, vol).compile()
print(f"pyramid compiled in {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
warp = jax.jit(
    lambda moving, flow, fixed: imregister_wrapper(
        moving, flow[..., 0], flow[..., 1], flow[..., 2], fixed,
        interpolation_method="cubic"),
    device=dev).lower(vol, flo, vol).compile()
print(f"warp compiled in {time.perf_counter()-t0:.1f}s", flush=True)

fx = jax.device_put(fixed_np[..., None], dev)
mv = jax.device_put(moving_np[..., None], dev)
uvw0 = jax.device_put(np.zeros(SHAPE + (3,), np.float32), dev)
wt = jax.device_put(np.ones(SHAPE + (1,), np.float32), dev)


def stream(n):
    u = uvw0
    last = None
    for _ in range(n):
        flow = pyramid(fx, mv, u, wt)
        last = warp(mv, flow, fx)
        u = flow
    return float(jnp.sum(last[0, 0, 0]) + jnp.sum(u[0, 0, 0])), u


_, flow_conv = stream(2)
t0 = time.perf_counter()
_, flow_conv = stream(8)
dt = (time.perf_counter() - t0) / 8
print(f"BENCH pipelined: {dt:.4f} s/volume = {1.0/dt:.3f} volumes/sec",
      flush=True)

# per-component (warm, synced each, on the converged chained flow)
for name, fn in (("pyramid", lambda: pyramid(fx, mv, flow_conv, wt)),
                 ("warp", lambda: warp(mv, flow_conv, fx))):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(4):
        out = fn()
    jax.block_until_ready(out)
    print(f"  {name}: {(time.perf_counter()-t0)/4*1e3:.1f} ms", flush=True)

# stash the converged flow for the warp A/B job
ns_flow_conv = flow_conv
ns_fx, ns_mv, ns_wt = fx, mv, wt
print("job_010 done", flush=True)
