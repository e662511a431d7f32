# Convergent-regime full-res accuracy: f32 TPU flow on the saved case
# (compare host-side vs /tmp/acc_conv_full/flow_reftorch_*.npy).
import numpy as np
import glob as _glob

from flowreg3d_tpu.core.pyramid import build_pyramid_raw, pyramid_config_key

_t0 = time.perf_counter()
paths = []
while time.perf_counter() - _t0 < 1500:
    paths = _glob.glob("/tmp/acc_conv_full/inputs_*.npz")
    if paths:
        break
    time.sleep(60)
data = np.load(paths[0])
H2 = paths[0].split("_")[-1].split(".")[0]
fixed, moving = data["fixed"], data["moving"]
SHAPE = fixed.shape
CONV = dict(alpha=(1.5, 1.5, 1.5), update_lag=5, iterations=50,
            min_level=0, levels=50, eta=0.8, a_smooth=1.0, a_data=0.45,
            const_assumption="gc")
key = pyramid_config_key(SHAPE, 1, dtype=np.dtype("float32"), **CONV)
pyr = jax.jit(build_pyramid_raw(*key), device=dev)
fx = jax.device_put(fixed[..., None].astype(np.float32), dev)
mv = jax.device_put(moving[..., None].astype(np.float32), dev)
u0 = jax.device_put(np.zeros(SHAPE + (3,), np.float32), dev)
wt = jax.device_put(np.ones(SHAPE + (1,), np.float32), dev)
t0 = time.perf_counter()
flow = np.asarray(jax.block_until_ready(pyr(fx, mv, u0, wt)))
print(f"convergent TPU flow in {time.perf_counter()-t0:.1f}s", flush=True)
np.save(f"/tmp/acc_conv_full/flow_tpu_{H2}.npy", flow)
print("job_086 done", flush=True)
