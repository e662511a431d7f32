# Direct parity of the windowed Pallas warp at level-5 geometry
# (21,168,168) vs the XLA row-gather: textured volume + smooth flow.
# Decides whether FLOWREG3D_WARP_MIN_VOX can default below 2^21.
ns_cleanup(globals())
import os
import numpy as np

rng = np.random.default_rng(0)
SH = (21, 168, 168)
vol = rng.random(SH).astype(np.float32)
for ax in range(3):
    vol = (vol + np.roll(vol, 1, ax) + np.roll(vol, -1, ax)) / 3.0
zz, yy, xx = np.meshgrid(*[np.linspace(0, 2 * np.pi, s) for s in SH],
                         indexing="ij")
u = (2.0 * np.sin(yy) * np.cos(xx)).astype(np.float32)
v = (1.5 * np.cos(zz) * np.sin(xx)).astype(np.float32)
w = (1.0 * np.sin(zz + yy)).astype(np.float32)
res = {}
for tag, minvox in (("rowgather", str(1 << 30)), ("windowed", "100000")):
    os.environ["FLOWREG3D_WARP_MIN_VOX"] = minvox
    os.environ.pop("FLOWREG3D_WARP_INT8", None)
    ns_fresh()
    jax.clear_caches()
    from flowreg3d_tpu.ops.warp import imregister_wrapper
    fn = jax.jit(lambda m, a, b, c, f: imregister_wrapper(
        m, a, b, c, f, interpolation_method="cubic"), device=dev)
    m = jax.device_put(vol, dev)
    out = jax.block_until_ready(fn(m, jax.device_put(u, dev),
                                   jax.device_put(v, dev),
                                   jax.device_put(w, dev), m))
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(m, jax.device_put(u, dev), jax.device_put(v, dev),
                 jax.device_put(w, dev), m)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / 10 * 1e3
    res[tag] = (np.asarray(out), ms)
    print(f"{tag}: {ms:.2f} ms", flush=True)
os.environ.pop("FLOWREG3D_WARP_MIN_VOX", None)
d = np.abs(res["windowed"][0] - res["rowgather"][0])
rel = float(d.max() / (np.abs(res["rowgather"][0]).max() + 1e-12))
print(f"windowed vs rowgather @ level5: max abs {d.max():.3e} rel {rel:.3e}",
      flush=True)
ns_record("job_258_l5warp_parity", {
    "shape": list(SH), "rowgather_ms": round(res["rowgather"][1], 2),
    "windowed_ms": round(res["windowed"][1], 2),
    "max_abs": float(d.max()), "rel": rel})
print("job_258 done", flush=True)
