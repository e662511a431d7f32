# QUALITY preset (min_level=0) XLA-TPU fusion-pass SIGABRT: bisect the
# smallest crashing shape, then try workarounds. The crash happens in the
# axon REMOTE compile-helper subprocess, so every attempt surfaces as a
# catchable JaxRuntimeError here (round-4 jobs 050/130/113 evidence).
ns_cleanup(globals())
ns_fresh()
import os
import numpy as np

from flowreg3d_tpu.core.pyramid import build_pyramid_raw, pyramid_config_key

QUALITY = dict(alpha=(0.25, 0.25, 0.25), update_lag=5, iterations=50,
               min_level=0, levels=50, eta=0.8, a_smooth=1.0, a_data=0.45)


def ns_try_quality(shape, use_pallas=None, barrier=False, tag=""):
    os.environ.pop("FLOWREG3D_KERNEL_BARRIER", None)
    if barrier:
        os.environ["FLOWREG3D_KERNEL_BARRIER"] = "1"
    try:
        key = pyramid_config_key(shape, 1, use_pallas=use_pallas, **QUALITY)
        vol = jax.ShapeDtypeStruct(tuple(shape) + (1,), np.float32)
        flo = jax.ShapeDtypeStruct(tuple(shape) + (3,), np.float32)
        t0 = time.perf_counter()
        fn = jax.jit(build_pyramid_raw(*key), device=dev).lower(
            vol, vol, flo, vol).compile()
        tc = time.perf_counter() - t0
        print(f"[{tag}] {shape} compiled in {tc:.1f}s", flush=True)
        return dict(ok=True, compile_s=round(tc, 1)), fn
    except Exception as e:  # noqa: BLE001
        msg = str(e)[:200]
        print(f"[{tag}] {shape} FAILED: {msg}", flush=True)
        return dict(ok=False, error=msg), None
    finally:
        os.environ.pop("FLOWREG3D_KERNEL_BARRIER", None)


rec = {"ladder": []}
crash_shape = None
for shape in ((16, 64, 64), (32, 128, 128), (64, 256, 256), (64, 512, 512)):
    r, fn = ns_try_quality(shape, tag="plain")
    rec["ladder"].append({"shape": list(shape), **r})
    fn = None
    if not r["ok"]:
        crash_shape = shape
        break

if crash_shape is not None:
    # workaround 1: optimization_barrier around every Pallas kernel output
    r, fn = ns_try_quality(crash_shape, barrier=True, tag="barrier")
    rec["barrier"] = {"shape": list(crash_shape), **r}
    fn = None
    # workaround 2: XLA-only pyramid (no custom calls; viable after the
    # round-5 channel-leading layout fix)
    r2, fn2 = ns_try_quality(crash_shape, use_pallas=False, tag="xla-only")
    rec["xla_only"] = {"shape": list(crash_shape), **r2}
    fn2 = None
else:
    print("no crash reproduced up to (64,512,512)", flush=True)

ns_record("job_215_quality_ladder", rec)
print("job_215 done", flush=True)
