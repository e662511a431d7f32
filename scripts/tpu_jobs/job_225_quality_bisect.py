# Which Pallas kernel triggers the min_level=0 fusion-pass SIGABRT?
# job_215: (32,128,128) min_level=0 crashes; barrier no help; XLA-only OK.
# The windowed warp is inactive below 2^21 voxels, so the candidates at the
# reproducer size are the solver sweeps and the 5^3 median. Bisect with the
# per-kernel knobs (FLOWREG3D_PALLAS_{SOLVER,MEDIAN,WARP}=0), then compile
# + measure the full-res QUALITY preset with the best surviving mix.
ns_cleanup(globals())
import os

import numpy as np

QUALITY = dict(alpha=(0.25, 0.25, 0.25), update_lag=5, iterations=50,
               min_level=0, levels=50, eta=0.8, a_smooth=1.0, a_data=0.45)
KNOBS = ("FLOWREG3D_PALLAS_SOLVER", "FLOWREG3D_PALLAS_MEDIAN",
         "FLOWREG3D_PALLAS_WARP")


def ns_try_mix(shape, off=(), run=False, tag=""):
    for k in KNOBS:
        os.environ.pop(k, None)
    for k in off:
        os.environ[f"FLOWREG3D_PALLAS_{k}"] = "0"
    ns_fresh()
    jax.clear_caches()
    try:
        from flowreg3d_tpu.core.pyramid import (build_pyramid_raw,
                                                pyramid_config_key)
        key = pyramid_config_key(shape, 1, **QUALITY)
        vol = jax.ShapeDtypeStruct(tuple(shape) + (1,), np.float32)
        flo = jax.ShapeDtypeStruct(tuple(shape) + (3,), np.float32)
        t0 = time.perf_counter()
        fn = jax.jit(build_pyramid_raw(*key), device=dev).lower(
            vol, vol, flo, vol).compile()
        tc = time.perf_counter() - t0
        out = dict(ok=True, compile_s=round(tc, 1))
        if run:
            rng = np.random.default_rng(0)
            fx = jax.device_put(
                rng.random(tuple(shape) + (1,), np.float32), dev)
            mv = jax.device_put(
                rng.random(tuple(shape) + (1,), np.float32), dev)
            u0 = jax.device_put(np.zeros(tuple(shape) + (3,), np.float32),
                                dev)
            wt = jax.device_put(np.ones(tuple(shape) + (1,), np.float32),
                                dev)
            jax.block_until_ready(fn(fx, mv, u0, wt))
            t0 = time.perf_counter()
            jax.block_until_ready(fn(fx, mv, u0, wt))
            out["run_s"] = round(time.perf_counter() - t0, 2)
        print(f"[{tag}] {shape} off={off} OK "
              f"compile {tc:.1f}s" + (f" run {out.get('run_s')}s"
                                      if run else ""), flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(f"[{tag}] {shape} off={off} FAILED: {str(e)[:120]}",
              flush=True)
        return dict(ok=False, error=str(e)[:200])
    finally:
        for k in KNOBS:
            os.environ.pop(k, None)


REPRO = (32, 128, 128)
rec = {"repro": list(REPRO), "mixes": {}}
best = None
for off in (("SOLVER",), ("MEDIAN",), ("SOLVER", "MEDIAN")):
    r = ns_try_mix(REPRO, off, tag="bisect")
    rec["mixes"]["+".join(off)] = r
    if r["ok"] and best is None:
        best = off

FULL = (64, 512, 512)
if best is not None:
    r = ns_try_mix(FULL, best, run=True, tag="fullres-best")
    rec["fullres_mix"] = {"off": list(best), **r}
else:
    r = ns_try_mix(FULL, ("SOLVER", "MEDIAN", "WARP"), run=True,
                   tag="fullres-xla")
    rec["fullres_mix"] = {"off": ["SOLVER", "MEDIAN", "WARP"], **r}
if rec["fullres_mix"].get("ok") and "run_s" in rec["fullres_mix"]:
    rec["quality_vol_per_s"] = round(1.0 / rec["fullres_mix"]["run_s"], 4)

ns_record("job_225_quality_bisect", rec)
print("job_225 done", flush=True)
