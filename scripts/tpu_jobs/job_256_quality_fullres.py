# Full-res QUALITY preset (min_level=0, 64x512x512): find a compiling
# kernel mix. (32,128,128) evidence: solver-off OK, median-off OK —
# the crash needs BOTH custom-call families present. Full-res solver-off
# died with compile-helper exit 1 (not SIGABRT) — retry each mix here
# with full error capture, then measure volumes/sec on the winner.
ns_cleanup(globals())
import os
import numpy as np

QUALITY = dict(alpha=(0.25, 0.25, 0.25), update_lag=5, iterations=50,
               min_level=0, levels=50, eta=0.8, a_smooth=1.0, a_data=0.45)
KNOBS = ("FLOWREG3D_PALLAS_SOLVER", "FLOWREG3D_PALLAS_MEDIAN",
         "FLOWREG3D_PALLAS_WARP")
SHAPE = (64, 512, 512)


def ns_try_full(off, run=False, tag=""):
    for k in KNOBS:
        os.environ.pop(k, None)
    for k in off:
        os.environ[f"FLOWREG3D_PALLAS_{k}"] = "0"
    ns_fresh()
    jax.clear_caches()
    try:
        from flowreg3d_tpu.core.pyramid import (build_pyramid_raw,
                                                pyramid_config_key)
        key = pyramid_config_key(SHAPE, 1, **QUALITY)
        vol = jax.ShapeDtypeStruct(SHAPE + (1,), np.float32)
        flo = jax.ShapeDtypeStruct(SHAPE + (3,), np.float32)
        t0 = time.perf_counter()
        fn = jax.jit(build_pyramid_raw(*key), device=dev).lower(
            vol, vol, flo, vol).compile()
        tc = time.perf_counter() - t0
        out = dict(ok=True, compile_s=round(tc, 1))
        print(f"[{tag}] off={off} compiled {tc:.1f}s", flush=True)
        if run:
            rng = np.random.default_rng(0)
            fx = jax.device_put(rng.random(SHAPE + (1,), np.float32), dev)
            mv = jax.device_put(rng.random(SHAPE + (1,), np.float32), dev)
            u0 = jax.device_put(np.zeros(SHAPE + (3,), np.float32), dev)
            wt = jax.device_put(np.ones(SHAPE + (1,), np.float32), dev)
            jax.block_until_ready(fn(fx, mv, u0, wt))
            t0 = time.perf_counter()
            jax.block_until_ready(fn(fx, mv, u0, wt))
            out["run_s"] = round(time.perf_counter() - t0, 2)
            print(f"[{tag}] run {out['run_s']}s/volume", flush=True)
            del fx, mv, u0, wt
        del fn
        return out
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        print(f"[{tag}] off={off} FAILED:", msg[:600], flush=True)
        return dict(ok=False, error=msg[:400])
    finally:
        for k in KNOBS:
            os.environ.pop(k, None)


rec = {"shape": list(SHAPE), "mixes": {}}
winner = None
for off in (("MEDIAN",), ("SOLVER",), ("SOLVER", "MEDIAN"),
            ("SOLVER", "MEDIAN", "WARP")):
    r = ns_try_full(off, run=(winner is None), tag="+".join(off))
    rec["mixes"]["+".join(off)] = r
    if r.get("ok") and winner is None:
        winner = off
        rec["winner"] = {"off": list(off), **r}
        if "run_s" in r:
            rec["quality_vol_per_s"] = round(1.0 / r["run_s"], 4)
        break  # got the row; leave deeper mixes for later if needed

ns_record("job_256_quality_fullres", rec)
print("job_240 done", flush=True)
