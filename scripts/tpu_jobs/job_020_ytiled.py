# y-tiled solver: first REAL-TPU compile + parity + timing at a full-res
# 512x512-plane level (VERDICT round-3 item: quality preset min_level=0
# routes here; only CPU interpret parity existed).
import numpy as np

from flowreg3d_tpu.core.solver import compute_flow_level

rngl = np.random.default_rng(3)
P_, M_, N_ = 66, 514, 514      # (Z+2, Y+2, X+2) level grid at min_level 0
C = 1

Jt_np = (rngl.random((10, P_, M_, N_, C)).astype(np.float32) * 0.1)
weight_np = np.ones((P_, M_, N_, C), np.float32)
u_np = rngl.random((P_, M_, N_)).astype(np.float32) * 0.5
v_np = rngl.random((P_, M_, N_)).astype(np.float32) * 0.5
w_np = rngl.random((P_, M_, N_)).astype(np.float32) * 0.5

J_entries = [jax.device_put(Jt_np[i], dev) for i in range(10)]
weight = jax.device_put(weight_np, dev)
uu = jax.device_put(u_np, dev)
vv = jax.device_put(v_np, dev)
ww = jax.device_put(w_np, dev)

for a_smooth in (1.0, 0.5):
    for use_pallas, label in ((True, "pallas-ytiled"), (False, "xla")):
        fn = jax.jit(lambda J, wt, a, b, c, _s=a_smooth, _p=use_pallas:
                     compute_flow_level(J, wt, a, b, c, (1.5, 1.2, 1.1),
                                        20, 5, [1.0], _s, 1.0, 1.0, 1.0,
                                        use_pallas=_p))
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(J_entries, weight, uu, vv, ww))
        print(f"a_smooth={a_smooth} {label}: compile+first "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(J_entries, weight, uu, vv, ww))
        print(f"a_smooth={a_smooth} {label}: warm 20 iters "
              f"{(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
        if use_pallas:
            got = [np.asarray(x) for x in out]
        else:
            ref = [np.asarray(x) for x in out]
    err = max(np.abs(g[1:-1, 1:-1, 1:-1] - r[1:-1, 1:-1, 1:-1]).max()
              for g, r in zip(got, ref))
    scale = max(np.abs(r).max() for r in ref)
    print(f"a_smooth={a_smooth} ytiled-vs-xla interior max abs {err:.3e} "
          f"(rel {err/scale:.3e})", flush=True)
print("job_020 done", flush=True)
