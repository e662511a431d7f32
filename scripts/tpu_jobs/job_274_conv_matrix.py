# Why does min_level=0 crash again (job_270) when job_256's mix compiled?
# Matrix: (a) QUALITY params on CURRENT code (did the batched-resize
# restructure reintroduce it?); (b) convergent with solver ALSO off
# (guaranteed-compile fallback -> run it to produce the conv TPU flow).
ns_cleanup(globals())
import os
import glob as _glob
import numpy as np

KNOBS = ("FLOWREG3D_PALLAS_SOLVER", "FLOWREG3D_PALLAS_MEDIAN",
         "FLOWREG3D_PALLAS_WARP")


def ns_try(shape, params, off=(), tag=""):
    for k in KNOBS:
        os.environ.pop(k, None)
    for k in off:
        os.environ[f"FLOWREG3D_PALLAS_{k}"] = "0"
    ns_fresh()
    jax.clear_caches()
    try:
        from flowreg3d_tpu.core.pyramid import (build_pyramid_raw,
                                                pyramid_config_key)
        key = pyramid_config_key(shape, 1, **params)
        vol = jax.ShapeDtypeStruct(tuple(shape) + (1,), np.float32)
        flo = jax.ShapeDtypeStruct(tuple(shape) + (3,), np.float32)
        t0 = time.perf_counter()
        fn = jax.jit(build_pyramid_raw(*key), device=dev).lower(
            vol, vol, flo, vol).compile()
        tc = time.perf_counter() - t0
        print(f"[{tag}] off={off} compiled {tc:.1f}s", flush=True)
        return dict(ok=True, compile_s=round(tc, 1)), fn
    except Exception as e:  # noqa: BLE001
        print(f"[{tag}] off={off} FAILED: {str(e)[:120]}", flush=True)
        return dict(ok=False, error=str(e)[:200]), None
    finally:
        for k in KNOBS:
            os.environ.pop(k, None)


QUALITY = dict(alpha=(0.25, 0.25, 0.25), update_lag=5, iterations=50,
               min_level=0, levels=50, eta=0.8, a_smooth=1.0, a_data=0.45)
CONV = dict(alpha=(1.5, 1.5, 1.5), update_lag=5, iterations=50,
            min_level=0, levels=50, eta=0.8, a_smooth=1.0, a_data=0.45,
            const_assumption="gc")
SHAPE = (64, 512, 512)
rec = {}
r, fn = ns_try(SHAPE, QUALITY, tag="quality-current")
rec["quality_current"] = r
fn = None
r, fn = ns_try(SHAPE, CONV, off=("SOLVER",), tag="conv-solver-off")
rec["conv_solver_off"] = r
if r["ok"]:
    paths = _glob.glob("/tmp/acc_conv_full/inputs_*.npz")
    data = np.load(paths[0])
    H = paths[0].split("_")[-1].split(".")[0]
    fx = jax.device_put(data["fixed"][..., None].astype(np.float32), dev)
    mv = jax.device_put(data["moving"][..., None].astype(np.float32), dev)
    u0 = jax.device_put(np.zeros(SHAPE + (3,), np.float32), dev)
    wt = jax.device_put(np.ones(SHAPE + (1,), np.float32), dev)
    t0 = time.perf_counter()
    flow = np.asarray(jax.block_until_ready(fn(fx, mv, u0, wt)))
    dt = time.perf_counter() - t0
    np.save(f"/tmp/acc_conv_full/flow_tpu_{H}.npy", flow)
    rec["conv_flow_secs"] = round(dt, 1)
    print(f"conv TPU flow (XLA solver) in {dt:.1f}s", flush=True)
    del fx, mv, u0, wt
fn = None
ns_record("job_274_conv_matrix", rec)
print("job_274 done", flush=True)
