# Full-resolution XLA solver fallback after the channel-leading layout fix
# (core/solver.py round 5): compile + run one (64,512,512) C=1 level with
# use_pallas=False — previously requested 90 GB HBM (f32[66,514,514,1]
# lane-padded 129x, round-4 job_101) — then the deferred on-chip parity
# check of the y-tiled Pallas kernel vs this XLA reference, plus timings.
ns_cleanup(globals())
ns_fresh()
import numpy as np

from flowreg3d_tpu.core.solver import compute_flow_level

P, M, N = 64, 512, 512
rng = np.random.default_rng(0)
f1 = rng.uniform(0.2, 0.8, (P + 2, M + 2, N + 2)).astype(np.float32)
J = [jax.device_put(rng.uniform(0.1, 0.5, (P + 2, M + 2, N + 2, 1))
                    .astype(np.float32), dev) for _ in range(10)]
wt = jax.device_put(np.ones((P + 2, M + 2, N + 2, 1), np.float32), dev)
u0 = jax.device_put(f1 * 0.05, dev)
v0 = jax.device_put(f1 * -0.03, dev)
w0 = jax.device_put(f1 * 0.02, dev)

ITER, LAG = 20, 5
results = {}
for tag, use_pallas in (("xla", False), ("pallas", True)):
    try:
        t0 = time.perf_counter()
        out = jax.block_until_ready(compute_flow_level(
            J, wt, u0, v0, w0, (1.5, 1.2, 1.1), ITER, LAG,
            np.array([0.45]), 1.0, 1.0, 1.0, 1.0, use_pallas=use_pallas))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            out = compute_flow_level(
                J, wt, u0, v0, w0, (1.5, 1.2, 1.1), ITER, LAG,
                np.array([0.45]), 1.0, 1.0, 1.0, 1.0, use_pallas=use_pallas)
        jax.block_until_ready(out)
        tr = (time.perf_counter() - t0) / 3
        results[tag] = dict(compile_s=round(tc, 1),
                            run_ms=round(tr * 1e3, 1),
                            du=np.asarray(out[0]), dv=np.asarray(out[1]),
                            dw=np.asarray(out[2]))
        print(f"{tag}: first {tc:.1f}s, {tr*1e3:.1f} ms/{ITER} it", flush=True)
    except Exception as e:  # noqa: BLE001
        results[tag] = dict(error=str(e)[:300])
        print(f"{tag} FAILED: {e}", flush=True)

rec = {"shape": [P, M, N], "iterations": ITER}
for tag in ("xla", "pallas"):
    r = results[tag]
    rec[tag] = ({"error": r["error"]} if "error" in r
                else {"compile_s": r["compile_s"], "run_ms": r["run_ms"]})
if all("error" not in results[t] for t in ("xla", "pallas")):
    rel = max(
        float(np.abs(results["pallas"][k] - results["xla"][k]).max()
              / (np.abs(results["xla"][k]).max() + 1e-12))
        for k in ("du", "dv", "dw"))
    rec["pallas_vs_xla_rel_max"] = float(rel)
    print(f"y-tiled Pallas vs XLA fallback rel max: {rel:.3e}", flush=True)
try:
    ms = dev.memory_stats()
    rec["peak_bytes_in_use"] = int(ms.get("peak_bytes_in_use", -1))
except Exception:
    pass
ns_record("job_210_fullres_xla", rec)
for tag in results:
    results[tag].pop("du", None)
    results[tag].pop("dv", None)
    results[tag].pop("dw", None)
print("job_210 done", flush=True)
