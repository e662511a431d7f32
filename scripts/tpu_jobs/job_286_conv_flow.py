# Convergent-regime TPU flow with the shipped (Pallas-solver) policy,
# alone in the job so the QUALITY program's allocation is gone.
ns_cleanup(globals())
import os
import glob as _glob
import numpy as np
for k in ("FLOWREG3D_PALLAS_SOLVER", "FLOWREG3D_PALLAS_MEDIAN",
          "FLOWREG3D_PALLAS_WARP", "FLOWREG3D_WARP_MIN_VOX"):
    os.environ.pop(k, None)
ns_fresh()
jax.clear_caches()
import gc
gc.collect()
from flowreg3d_tpu.core.pyramid import build_pyramid_raw, pyramid_config_key
CONV = dict(alpha=(1.5, 1.5, 1.5), update_lag=5, iterations=50,
            min_level=0, levels=50, eta=0.8, a_smooth=1.0, a_data=0.45)
SHAPE = (64, 512, 512)
key = pyramid_config_key(SHAPE, 1, **CONV)
pyr = jax.jit(build_pyramid_raw(*key), device=dev)
paths = _glob.glob("/tmp/acc_conv_full/inputs_*.npz")
data = np.load(paths[0])
H = paths[0].split("_")[-1].split(".")[0]
fx = jax.device_put(data["fixed"][..., None].astype(np.float32), dev)
mv = jax.device_put(data["moving"][..., None].astype(np.float32), dev)
u0 = jax.device_put(np.zeros(SHAPE + (3,), np.float32), dev)
wt = jax.device_put(np.ones(SHAPE + (1,), np.float32), dev)
t0 = time.perf_counter()
flow = np.asarray(jax.block_until_ready(pyr(fx, mv, u0, wt)))
dt = time.perf_counter() - t0
np.save(f"/tmp/acc_conv_full/flow_tpu_{H}.npy", flow)
t0 = time.perf_counter()
jax.block_until_ready(pyr(fx, mv, u0, wt))
warm = time.perf_counter() - t0
print(f"conv TPU flow (Pallas solver): first {dt:.1f}s, warm {warm:.2f}s",
      flush=True)
ns_record("job_286_conv_flow", {"first_s": round(dt, 1),
                                "warm_s": round(warm, 2),
                                "config_hash": H})
print("job_286 done", flush=True)
