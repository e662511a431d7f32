# A/B the int8 warp against the bf16x3 default on the converged chained
# flow from job_010 (same claim, same inputs). Parity + timing.
import os
import numpy as np

from flowreg3d_tpu.ops.warp import imregister_wrapper

try:
    flow = ns_flow_conv
    fx, mv, wt = ns_fx, ns_mv, ns_wt
except NameError:  # server restarted between job_010 and this job
    from scipy.ndimage import gaussian_filter
    from flowreg3d_tpu.core.pyramid import build_pyramid_raw, pyramid_config_key
    SHAPE = (64, 512, 512)
    rngw = np.random.default_rng(0)
    blobs = np.zeros(SHAPE, np.float32)
    idx = tuple(rngw.integers(2, s - 2, 4000) for s in SHAPE)
    blobs[idx] = rngw.random(4000).astype(np.float32) + 0.5
    f_np = gaussian_filter(blobs, (1.0, 2.0, 2.0)).astype(np.float32)
    f_np /= f_np.max()
    key = pyramid_config_key(SHAPE, 1, alpha=(0.25,)*3, update_lag=5,
                             iterations=100, min_level=5, levels=50,
                             eta=0.8, a_smooth=1.0, a_data=0.45)
    pyr = jax.jit(build_pyramid_raw(*key), device=dev)
    fx = jax.device_put(f_np[..., None], dev)
    mv = jax.device_put(np.roll(f_np, (1, 5, -4), (0, 1, 2))[..., None], dev)
    wt = jax.device_put(np.ones(SHAPE + (1,), np.float32), dev)
    u = jax.device_put(np.zeros(SHAPE + (3,), np.float32), dev)
    for _ in range(3):
        u = pyr(fx, mv, u, wt)
    flow = jax.block_until_ready(u)

def build(tag):
    # fresh closure per mode: jit caches don't see env vars
    return jax.jit(
        lambda moving, f, fixed, _tag=tag: imregister_wrapper(
            moving, f[..., 0], f[..., 1], f[..., 2], fixed,
            interpolation_method="cubic"))

results = {}
for mode in ("0", "1"):
    os.environ["FLOWREG3D_WARP_INT8"] = mode
    w = build(mode)
    t0 = time.perf_counter()
    out = jax.block_until_ready(w(mv, flow, fx))
    print(f"int8={mode}: compile+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        out = w(mv, flow, fx)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5
    results[mode] = (dt, np.asarray(out))
    print(f"int8={mode}: {dt*1e3:.1f} ms/warp", flush=True)
# restore the shipped default (int8 on) for every later job in this server
# session — leaving "0" here made jobs 050+ run the non-default bf16x3 path
os.environ.pop("FLOWREG3D_WARP_INT8", None)

d = np.abs(results["0"][1] - results["1"][1])
ref = np.abs(results["0"][1]).max()
print(f"int8 vs bf16x3: max abs {d.max():.3e}  rel {d.max()/ref:.3e}  "
      f"speedup {results['0'][0]/results['1'][0]:.2f}x", flush=True)
print("job_040 done", flush=True)
