# Convergent-regime TPU flow at full res — now unblocked: min_level=0
# auto-routes the median to XLA (fusion-crash policy in core/pyramid.py).
ns_cleanup(globals())
import os
import glob as _glob
import numpy as np
ns_fresh()
jax.clear_caches()
from flowreg3d_tpu.core.pyramid import build_pyramid_raw, pyramid_config_key
paths = _glob.glob("/tmp/acc_conv_full/inputs_*.npz")
data = np.load(paths[0])
H = paths[0].split("_")[-1].split(".")[0]
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
dt = time.perf_counter() - t0
print(f"convergent TPU flow (incl. compile) in {dt:.1f}s", flush=True)
t0 = time.perf_counter()
out = jax.block_until_ready(pyr(fx, mv, u0, wt))
warm = time.perf_counter() - t0
np.save(f"/tmp/acc_conv_full/flow_tpu_{H}.npy", flow)
ns_record("job_264_conv_tpu", {"first_s": round(dt, 1),
                               "warm_s": round(warm, 2),
                               "config_hash": H})
print("job_264 done", flush=True)
