# Linear-regime discriminator for the y-tiled solver parity: a_data=1.0
# makes psi_data identity (no lagged nonlinearity) -> red-black SOR is a
# deterministic contraction; fp noise stays ~1e-6. If y-tiled vs XLA is
# ~1e-6 here, job_272's 1.8e-2 was nonlinear chaos; if ~1e-2, tile bug.
ns_cleanup(globals())
import numpy as np
ns_fresh()
jax.clear_caches()
from flowreg3d_tpu.core.motion_tensor import get_motion_tensor_gc
from flowreg3d_tpu.core.solver import compute_flow_level

P, M, N = 64, 512, 512
rng = np.random.default_rng(0)
base = rng.random((P, M, N)).astype(np.float32)
for ax in range(3):
    base = (base + np.roll(base, 1, ax) + np.roll(base, -1, ax)) / 3.0
mov = np.roll(np.roll(base, 1, 1), -1, 2)
J_fn = jax.jit(lambda a, b: get_motion_tensor_gc(a, b, 1.0, 1.0, 1.0),
               device=dev)
J = [j[..., None] for j in jax.block_until_ready(
    J_fn(jax.device_put(base, dev), jax.device_put(mov, dev)))]
wt = jax.device_put(np.ones((P + 2, M + 2, N + 2, 1), np.float32), dev)
z = jax.device_put(np.zeros((P + 2, M + 2, N + 2), np.float32), dev)
res = {}
for a_data, iters, tag in ((1.0, 20, "linear"), (0.45, 5, "nl5")):
    outs = {}
    for mode, up in (("xla", False), ("pallas", True)):
        out = jax.block_until_ready(compute_flow_level(
            J, wt, z, z, z, (1.5, 1.2, 1.1), iters, 5, np.array([a_data]),
            1.0, 1.0, 1.0, 1.0, use_pallas=up))
        outs[mode] = [np.asarray(x) for x in out]
    rel = max(float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))
              for a, b in zip(outs["pallas"], outs["xla"]))
    res[tag] = rel
    print(f"{tag} (a_data={a_data}, {iters} it): rel max {rel:.3e}",
          flush=True)
ns_record("job_276_linear_parity", res)
print("job_276 done", flush=True)
