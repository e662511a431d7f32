# Accuracy TPU phase: f32 pyramid at canonical params on the chip, on the
# EXACT inputs the f64 CPU oracle consumed (saved npz).
import numpy as np

from flowreg3d_tpu.core.pyramid import build_pyramid_raw, pyramid_config_key

H = "010f81eff987af75"
import os as _os
_p = f"/tmp/acc_canonical/inputs_{H}.npz"
_t0 = time.perf_counter()
while not _os.path.exists(_p) and time.perf_counter() - _t0 < 1500:
    time.sleep(60)  # CPU oracle chain still writing the case inputs
data = np.load(_p)
fixed, moving = data["fixed"], data["moving"]
SHAPE = fixed.shape
FLOW_PARAMS = dict(alpha=(0.25, 0.25, 0.25), update_lag=5, iterations=100,
                   min_level=5, levels=50, eta=0.8, a_smooth=1.0,
                   a_data=0.45, const_assumption="gc")
key = pyramid_config_key(SHAPE, 1, dtype=np.dtype("float32"), **FLOW_PARAMS)
pyr = jax.jit(build_pyramid_raw(*key), device=dev)
fx = jax.device_put(fixed[..., None].astype(np.float32), dev)
mv = jax.device_put(moving[..., None].astype(np.float32), dev)
u0 = jax.device_put(np.zeros(SHAPE + (3,), np.float32), dev)
wt = jax.device_put(np.ones(SHAPE + (1,), np.float32), dev)
t0 = time.perf_counter()
flow = np.asarray(jax.block_until_ready(pyr(fx, mv, u0, wt)))
print(f"accuracy TPU flow in {time.perf_counter()-t0:.1f}s", flush=True)
np.save(f"/tmp/acc_canonical/flow_tpu_{H}.npy", flow)
print("job_085 done", flush=True)
