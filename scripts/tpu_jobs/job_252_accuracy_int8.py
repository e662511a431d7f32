# Canonical TPU accuracy flow under the SHIPPED default config: the
# round-4 server env still carries job_040's FLOWREG3D_WARP_INT8="0"
# leak, so job_111's flow (and this server's compiles so far) used the
# bf16x3 warp. Clear it, recompute the canonical f32-TPU flow, and save
# it as flow_tpu_* (preserving the bf16x3 one) for the report phase.
ns_cleanup(globals())
import os
import shutil

os.environ.pop("FLOWREG3D_WARP_INT8", None)  # restore shipped default (int8)
for k in ("FLOWREG3D_PALLAS_SOLVER", "FLOWREG3D_PALLAS_MEDIAN",
          "FLOWREG3D_PALLAS_WARP", "FLOWREG3D_KERNEL_BARRIER"):
    os.environ.pop(k, None)
ns_fresh()
jax.clear_caches()
import numpy as np

from flowreg3d_tpu.core.pyramid import build_pyramid_raw, pyramid_config_key

H = "010f81eff987af75"
data = np.load(f"/tmp/acc_canonical/inputs_{H}.npz")
fixed, moving = data["fixed"], data["moving"]
SHAPE = fixed.shape
CANON = dict(alpha=(0.25, 0.25, 0.25), update_lag=5, iterations=100,
             min_level=5, levels=50, eta=0.8, a_smooth=1.0, a_data=0.45,
             const_assumption="gc")
key = pyramid_config_key(SHAPE, 1, dtype=np.dtype("float32"), **CANON)
pyr = jax.jit(build_pyramid_raw(*key), device=dev)
fx = jax.device_put(fixed[..., None].astype(np.float32), dev)
mv = jax.device_put(moving[..., None].astype(np.float32), dev)
u0 = jax.device_put(np.zeros(SHAPE + (3,), np.float32), dev)
wt = jax.device_put(np.ones(SHAPE + (1,), np.float32), dev)
t0 = time.perf_counter()
flow = np.asarray(jax.block_until_ready(pyr(fx, mv, u0, wt)))
dt = time.perf_counter() - t0
print(f"canonical TPU flow (int8 default, round-5 solver) in {dt:.1f}s",
      flush=True)
old = f"/tmp/acc_canonical/flow_tpu_{H}.npy"
if os.path.exists(old):
    shutil.move(old, f"/tmp/acc_canonical/flow_tpu_bf16x3_{H}.npy")
np.save(old, flow)
ns_record("job_252_accuracy_int8", {"flow_secs": round(dt, 1),
                                    "config_hash": H})
print("job_230 done", flush=True)
