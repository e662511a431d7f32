# Confirm the SHIPPED policy compiles+runs the QUALITY preset after the
# resize-batching revert (job_274 showed the batched variant crashes).
ns_cleanup(globals())
import os
import numpy as np
for k in ("FLOWREG3D_PALLAS_SOLVER", "FLOWREG3D_PALLAS_MEDIAN",
          "FLOWREG3D_PALLAS_WARP", "FLOWREG3D_WARP_MIN_VOX"):
    os.environ.pop(k, None)
ns_fresh()
jax.clear_caches()
from flowreg3d_tpu.core.pyramid import build_pyramid_raw, pyramid_config_key
QUALITY = dict(alpha=(0.25, 0.25, 0.25), update_lag=5, iterations=50,
               min_level=0, levels=50, eta=0.8, a_smooth=1.0, a_data=0.45)
SHAPE = (64, 512, 512)
key = pyramid_config_key(SHAPE, 1, **QUALITY)
vol = jax.ShapeDtypeStruct(SHAPE + (1,), np.float32)
flo = jax.ShapeDtypeStruct(SHAPE + (3,), np.float32)
t0 = time.perf_counter()
fn = jax.jit(build_pyramid_raw(*key), device=dev).lower(
    vol, vol, flo, vol).compile()
tc = time.perf_counter() - t0
print(f"QUALITY (shipped policy) compiled {tc:.1f}s", flush=True)
rng = np.random.default_rng(0)
fx = jax.device_put(rng.random(SHAPE + (1,), np.float32), dev)
mv = jax.device_put(rng.random(SHAPE + (1,), np.float32), dev)
u0 = jax.device_put(np.zeros(SHAPE + (3,), np.float32), dev)
wt = jax.device_put(np.ones(SHAPE + (1,), np.float32), dev)
jax.block_until_ready(fn(fx, mv, u0, wt))
t0 = time.perf_counter()
out = jax.block_until_ready(fn(fx, mv, u0, wt))
rs = time.perf_counter() - t0
print(f"QUALITY run {rs:.2f}s/volume = {1/rs:.4f} vol/s", flush=True)
ns_record("job_280_quality_verify", {"compile_s": round(tc, 1),
                                     "run_s": round(rs, 2),
                                     "vol_per_s": round(1 / rs, 4)})
# and the convergent config under the same shipped policy
CONV = dict(alpha=(1.5, 1.5, 1.5), update_lag=5, iterations=50,
            min_level=0, levels=50, eta=0.8, a_smooth=1.0, a_data=0.45)
key2 = pyramid_config_key(SHAPE, 1, **CONV)
try:
    t0 = time.perf_counter()
    fn2 = jax.jit(build_pyramid_raw(*key2), device=dev).lower(
        vol, vol, flo, vol).compile()
    tc2 = time.perf_counter() - t0
    print(f"CONVERGENT compiled {tc2:.1f}s", flush=True)
    import glob as _glob
    paths = _glob.glob("/tmp/acc_conv_full/inputs_*.npz")
    data = np.load(paths[0])
    H = paths[0].split("_")[-1].split(".")[0]
    fxc = jax.device_put(data["fixed"][..., None].astype(np.float32), dev)
    mvc = jax.device_put(data["moving"][..., None].astype(np.float32), dev)
    t0 = time.perf_counter()
    flow = np.asarray(jax.block_until_ready(fn2(fxc, mvc, u0, wt)))
    dt = time.perf_counter() - t0
    np.save(f"/tmp/acc_conv_full/flow_tpu_{H}.npy", flow)
    print(f"conv TPU flow (Pallas solver) in {dt:.1f}s", flush=True)
    ns_record("job_280_conv", {"compile_s": round(tc2, 1),
                               "flow_secs": round(dt, 1)})
except Exception as e:  # noqa: BLE001
    print("CONVERGENT failed:", str(e)[:150], flush=True)
    ns_record("job_280_conv", {"ok": False, "error": str(e)[:200]})
print("job_280 done", flush=True)
