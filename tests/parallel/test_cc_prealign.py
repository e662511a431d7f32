"""On-device cc prealignment: numerics vs host-composed steps + overhead.

Verifies the single compiled warp->xcorr->combine->warp program
(executors._jit_prealign_single) against the same steps composed on the
host (reference sequential_3d.py:89-150 semantics), executor consistency
with cc enabled, and that cc adds bounded overhead on a long recording.
"""

import time

import numpy as np
import pytest

import jax.numpy as jnp

from flowreg3d_tpu.ops.warp import imregister_wrapper
from flowreg3d_tpu.parallel.executors import (
    BatchedExecutor3D,
    SequentialExecutor3D,
    _jit_prealign_single,
)
from flowreg3d_tpu.util.xcorr_prealignment import estimate_rigid_xcorr_3d

# heavy tier: interpret-mode Pallas / shard_map compiles (minutes on 1 CPU)
pytestmark = pytest.mark.slow


def _blobby(shape, seed=0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter

    v = np.zeros(shape, np.float32)
    idx = tuple(rng.integers(1, s - 1, 300) for s in shape)
    v[idx] = 1.0
    return gaussian_filter(v, 1.2).astype(np.float32)


def test_prealign_program_matches_host_steps():
    Z, Y, X = 8, 24, 32
    ref = _blobby((Z, Y, X), 0)[..., None]
    frame = np.roll(ref, (1, 2, -1), axis=(0, 1, 2))
    w_init = np.zeros((Z, Y, X, 3), np.float32)
    w_init[..., 0] = 0.5

    # host-composed steps (the pre-round-3 formulation)
    mov_partial = np.asarray(imregister_wrapper(
        frame, w_init[..., 0], w_init[..., 1], w_init[..., 2], ref,
        interpolation_method="linear"))
    w_cross = estimate_rigid_xcorr_3d(
        ref[..., 0], mov_partial[..., 0], target_hw=(16, 16), up=5)
    w_combined_host = w_init + w_cross[None, None, None, :]
    aligned_host = np.asarray(imregister_wrapper(
        frame, w_combined_host[..., 0], w_combined_host[..., 1],
        w_combined_host[..., 2], ref, interpolation_method="linear"))

    fn = _jit_prealign_single((16, 16), 5, False)
    aligned, w_combined = fn(jnp.asarray(frame), jnp.asarray(ref),
                             jnp.asarray(w_init), jnp.zeros(1, jnp.float32))
    np.testing.assert_allclose(np.asarray(w_combined), w_combined_host,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(aligned), aligned_host,
                               rtol=1e-4, atol=1e-5)


def test_cc_executor_consistency_sequential_vs_batched():
    Z, Y, X = 8, 16, 24
    ref = _blobby((Z, Y, X), 1)[..., None]
    T = 4
    batch = np.stack([np.roll(ref, (0, t % 2, -(t % 3)), axis=(0, 1, 2))
                      for t in range(T)])
    w_init = np.zeros((Z, Y, X, 3), np.float32)
    fp = dict(alpha=(2.0, 2.0, 2.0), iterations=4, levels=2, min_level=0,
              eta=0.8, a_smooth=1.0, a_data=0.45, update_lag=2,
              cc_initialization=True, cc_hw=16, cc_up=5)
    out = {}
    for cls in (SequentialExecutor3D, BatchedExecutor3D):
        ex = cls(chunk=2) if cls is BatchedExecutor3D else cls()
        reg, flows = ex.process_batch(
            batch, batch, ref, ref, w_init, flow_params=fp)
        out[cls.name] = (reg, flows)
    np.testing.assert_allclose(out["sequential"][1], out["batched"][1],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out["sequential"][0], out["batched"][0],
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_cc_overhead_bounded_on_long_recording():
    """cc on a 100-frame recording stays within ~2x the non-cc wall time
    (round-2 verdict item 6 done-criterion; generous bound for CI noise)."""
    Z, Y, X = 8, 16, 16
    ref = _blobby((Z, Y, X), 2)[..., None]
    T = 100
    rng = np.random.default_rng(3)
    shifts = rng.integers(-1, 2, size=(T, 3))
    batch = np.stack([np.roll(ref, tuple(s), axis=(0, 1, 2))
                      for s in shifts])
    w_init = np.zeros((Z, Y, X, 3), np.float32)
    base = dict(alpha=(2.0, 2.0, 2.0), iterations=4, levels=2, min_level=0,
                eta=0.8, a_smooth=1.0, a_data=0.45, update_lag=2)

    ex = SequentialExecutor3D()

    def run(cc):
        fp = dict(base)
        if cc:
            fp.update(cc_initialization=True, cc_hw=16, cc_up=5)
        # warm (compile) on a 2-frame slice, then measure
        ex.process_batch(batch[:2], batch[:2], ref, ref, w_init,
                         flow_params=fp)
        t0 = time.perf_counter()
        ex.process_batch(batch, batch, ref, ref, w_init, flow_params=fp)
        return time.perf_counter() - t0

    t_plain = run(False)
    t_cc = run(True)
    # one compiled prealign program per frame; bound is 2x + fixed slack
    assert t_cc <= 2.0 * t_plain + 2.0, (t_cc, t_plain)
