"""Z-sharded solver parity vs the single-device solver (8-dev CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowreg3d_tpu.core.solver import compute_flow_level
from flowreg3d_tpu.parallel.spatial import (
    compute_flow_level_sharded,
    spatial_mesh,
)



# heavy tier: interpret-mode Pallas / shard_map compiles (minutes on 1 CPU)
pytestmark = pytest.mark.slow

def _problem(shape=(26, 20, 24), C=1, seed=0):
    rng = np.random.default_rng(seed)
    p, m, n = shape
    gx = rng.standard_normal((p, m, n, C)).astype(np.float32) * 0.3
    gy = rng.standard_normal((p, m, n, C)).astype(np.float32) * 0.3
    gz = rng.standard_normal((p, m, n, C)).astype(np.float32) * 0.3
    gt = rng.standard_normal((p, m, n, C)).astype(np.float32) * 0.1
    J = (gx * gx, gy * gy, gz * gz, gt * gt, gx * gy, gx * gz, gy * gz,
         gx * gt, gy * gt, gz * gt)
    weight = np.ones((p, m, n, C), np.float32)
    u = rng.standard_normal((p, m, n)).astype(np.float32) * 0.1
    v = rng.standard_normal((p, m, n)).astype(np.float32) * 0.1
    w = rng.standard_normal((p, m, n)).astype(np.float32) * 0.1
    return ([jnp.asarray(j) for j in J], jnp.asarray(weight),
            jnp.asarray(u), jnp.asarray(v), jnp.asarray(w))


@pytest.mark.sharding
@pytest.mark.parametrize("n_dev,shape", [
    (8, (26, 20, 24)),   # uneven split: 24 interior rows over 8 devs
    (4, (17, 16, 20)),   # 15 interior rows over 4 devs (padding path)
])
def test_sharded_matches_single_device(n_dev, shape):
    assert len(jax.devices()) >= n_dev
    mesh = spatial_mesh(jax.devices()[:n_dev])
    J, weight, u, v, w = _problem(shape)
    kw = dict(alpha=(1.2, 1.0, 0.8), iterations=8, update_lag=3,
              a_data=np.array([0.45]), hx=1.0, hy=1.0, hz=1.0)

    ref = compute_flow_level(J, weight, u, v, w, a_smooth=1.0,
                             use_pallas=False, **kw)
    got = compute_flow_level_sharded(J, weight, u, v, w, mesh=mesh, **kw)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=5e-4, atol=5e-4)
