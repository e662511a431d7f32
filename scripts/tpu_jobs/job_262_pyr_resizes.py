# Canonical pyramid after batched resizes (fixed+moving concat, flow
# components as channels): target <45 ms (was 49.1 with batched median +
# L5 windowed warp, now default).
ns_cleanup(globals())
import os
import numpy as np
os.environ.pop("FLOWREG3D_WARP_MIN_VOX", None)
ns_fresh()
jax.clear_caches()
from flowreg3d_tpu.core.pyramid import build_pyramid_raw, pyramid_config_key
SHAPE = (64, 512, 512)
CANON = dict(alpha=(0.25, 0.25, 0.25), update_lag=5, iterations=100,
             min_level=5, levels=50, eta=0.8, a_smooth=1.0, a_data=0.45,
             const_assumption="gc")
key = pyramid_config_key(SHAPE, 1, dtype=np.dtype("float32"), **CANON)
pyr = jax.jit(build_pyramid_raw(*key), device=dev)
rng = np.random.default_rng(0)
fx = jax.device_put(rng.random(SHAPE + (1,), np.float32), dev)
mv = jax.device_put(rng.random(SHAPE + (1,), np.float32), dev)
u0 = jax.device_put(np.zeros(SHAPE + (3,), np.float32), dev)
wt = jax.device_put(np.ones(SHAPE + (1,), np.float32), dev)
t0 = time.perf_counter()
out = jax.block_until_ready(pyr(fx, mv, u0, wt))
tc = time.perf_counter() - t0
t0 = time.perf_counter()
for _ in range(10):
    out = pyr(fx, mv, u0, wt)
jax.block_until_ready(out)
ms = (time.perf_counter() - t0) / 10 * 1e3
print(f"pyramid (batched resizes): compile {tc:.1f}s, {ms:.1f} ms", flush=True)
ns_record("job_262_pyr_resizes", {"compile_s": round(tc, 1),
                                  "pyramid_ms": round(ms, 2)})
print("job_262 done", flush=True)
