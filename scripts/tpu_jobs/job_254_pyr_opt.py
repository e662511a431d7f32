# Pyramid overhead (round-4 profile: 55.9 ms total; VERDICT target <45 ms):
# A/B the round-5 changes on chip —
#   (a) batched 3-component median (one kernel launch per level, not 3)
#   (b) windowed Pallas warp at level-5 size (FLOWREG3D_WARP_MIN_VOX
#       lowered below 21*168*168) vs the XLA row-gather
ns_cleanup(globals())
import os

import numpy as np

SHAPE = (64, 512, 512)
CANON = dict(alpha=(0.25, 0.25, 0.25), update_lag=5, iterations=100,
             min_level=5, levels=50, eta=0.8, a_smooth=1.0, a_data=0.45,
             const_assumption="gc")


def ns_measure_pyramid(tag, env=()):
    for k in ("FLOWREG3D_WARP_MIN_VOX",):
        os.environ.pop(k, None)
    os.environ.pop("FLOWREG3D_WARP_INT8", None)
    for k, v in env:
        os.environ[k] = v
    ns_fresh()
    jax.clear_caches()
    from flowreg3d_tpu.core.pyramid import (build_pyramid_raw,
                                            pyramid_config_key)
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
    N = 10
    for _ in range(N):
        out = pyr(fx, mv, u0, wt)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / N * 1e3
    print(f"[{tag}] compile+first {tc:.1f}s, pyramid {ms:.1f} ms",
          flush=True)
    for k, v in env:
        os.environ.pop(k, None)
    return dict(compile_s=round(tc, 1), pyramid_ms=round(ms, 2)), \
        np.asarray(out)


rec = {}
try:
    rec["batched_median"], out_a = ns_measure_pyramid("batched-median")
except Exception as e:  # noqa: BLE001
    rec["batched_median"] = {"error": str(e)[:200]}
    out_a = None
    print("batched-median FAILED:", str(e)[:150], flush=True)
try:
    rec["plus_l5_windowed_warp"], out_b = ns_measure_pyramid(
        "l5-windowed", env=(("FLOWREG3D_WARP_MIN_VOX", "400000"),))
    if out_a is not None:
        d = float(np.abs(out_a - out_b).max())
        rec["l5_warp_max_abs_delta"] = d
        print(f"l5-windowed vs default flow max abs delta {d:.3e}",
              flush=True)
except Exception as e:  # noqa: BLE001
    rec["plus_l5_windowed_warp"] = {"error": str(e)[:200]}
    print("l5-windowed FAILED:", str(e)[:150], flush=True)

ns_record("job_254_pyr_opt", rec)
print("job_235 done", flush=True)
