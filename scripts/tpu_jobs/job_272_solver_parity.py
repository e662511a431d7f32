# Full-res y-tiled Pallas solver vs XLA fallback with PHYSICAL motion-
# tensor J (job_210 used random non-PSD J -> chaotic 1.4e-2 deviation;
# this is the credible parity number for BASELINE.md).
ns_cleanup(globals())
import numpy as np
ns_fresh()
jax.clear_caches()
from flowreg3d_tpu.core.motion_tensor import get_motion_tensor_gc
from flowreg3d_tpu.core.solver import compute_flow_level

P, M, N = 64, 512, 512
rng = np.random.default_rng(0)
# level-sized volumes WITHOUT the ring: the motion tensor pads them
base = rng.random((P, M, N)).astype(np.float32)
for ax in range(3):
    base = (base + np.roll(base, 1, ax) + np.roll(base, -1, ax)) / 3.0
mov = np.roll(np.roll(base, 1, 1), -1, 2)
J_fn = jax.jit(lambda a, b: get_motion_tensor_gc(a, b, 1.0, 1.0, 1.0),
               device=dev)
J = [jax.device_put(np.asarray(j), dev) for j in
     jax.block_until_ready(J_fn(jax.device_put(base, dev),
                                jax.device_put(mov, dev)))]
J = [j[..., None] for j in J]
wt = jax.device_put(np.ones((P + 2, M + 2, N + 2, 1), np.float32), dev)
z = jax.device_put(np.zeros((P + 2, M + 2, N + 2), np.float32), dev)
ITER, LAG = 20, 5
res = {}
for tag, up in (("xla", False), ("pallas", True)):
    t0 = time.perf_counter()
    out = jax.block_until_ready(compute_flow_level(
        J, wt, z, z, z, (1.5, 1.2, 1.1), ITER, LAG, np.array([0.45]),
        1.0, 1.0, 1.0, 1.0, use_pallas=up))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        out = compute_flow_level(J, wt, z, z, z, (1.5, 1.2, 1.1), ITER,
                                 LAG, np.array([0.45]), 1.0, 1.0, 1.0,
                                 1.0, use_pallas=up)
    jax.block_until_ready(out)
    tr = (time.perf_counter() - t0) / 3 * 1e3
    res[tag] = [np.asarray(x) for x in out]
    print(f"{tag}: first {tc:.1f}s, {tr:.1f} ms/{ITER}it", flush=True)
    res[tag + "_ms"] = round(tr, 1)
rel = max(float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))
          for a, b in zip(res["pallas"], res["xla"]))
print(f"y-tiled vs XLA (physical J): rel max {rel:.3e}", flush=True)
ns_record("job_272_solver_parity", {
    "shape": [P, M, N], "iterations": ITER, "rel_max": rel,
    "xla_ms": res["xla_ms"], "pallas_ms": res["pallas_ms"]})
print("job_266 done", flush=True)
