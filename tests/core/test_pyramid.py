"""End-to-end pyramid tests: synthetic motion recovery with EPE scoring.

Models the reference's EPE harness (examples/motion_correct_3d_test.py:620-745)
at test-friendly sizes.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import gaussian_filter

from flowreg3d_tpu import get_displacement, imregister_wrapper
from flowreg3d_tpu.motion_generation import (
    evaluate_flow_accuracy,
    get_test_3d_generator,
    improvement_ratio,
    warp_volume_backward,
)



# heavy tier: interpret-mode Pallas / shard_map compiles (minutes on 1 CPU)
pytestmark = pytest.mark.slow

def _cell_volume(rng, shape=(32, 48, 48), n_blobs=40):
    """Smooth random blob volume resembling fluorescence data."""
    p, m, n = shape
    vol = np.zeros(shape)
    zs = rng.integers(3, p - 3, n_blobs)
    ys = rng.integers(3, m - 3, n_blobs)
    xs = rng.integers(3, n - 3, n_blobs)
    amps = rng.random(n_blobs) + 0.5
    for z, y, x, a in zip(zs, ys, xs, amps):
        vol[z, y, x] = a
    vol = gaussian_filter(vol, 2.0)
    return (vol / vol.max()).astype(np.float32)


FLOW_PARAMS = dict(alpha=(1.5, 1.5, 1.5), iterations=30, update_lag=5,
                   min_level=0, levels=50, eta=0.8, a_smooth=1.0, a_data=0.45)


def test_translation_recovery(rng):
    vol = _cell_volume(rng)
    d = np.array([1.7, -1.2, 0.9], np.float32)  # dx, dy, dz
    flow_gt = np.broadcast_to(d, vol.shape + (3,)).copy()
    # displaced(x) = vol(x - d) == backward-warp of vol by -d
    displaced = warp_volume_backward(vol, -flow_gt)

    flow = np.asarray(get_displacement(vol, displaced, **FLOW_PARAMS))
    epe = evaluate_flow_accuracy(flow, flow_gt, boundary=6)
    assert epe < 0.35, f"EPE {epe}"


def test_generated_motion_recovery_and_correction(rng):
    vol = _cell_volume(rng, shape=(28, 44, 44))
    gen = get_test_3d_generator()
    flow_gt, _ = gen(depth=vol.shape[0], height=vol.shape[1],
                     width=vol.shape[2], rng=np.random.default_rng(7))
    # keep displacements small relative to the tiny volume
    flow_gt *= 0.5
    displaced = warp_volume_backward(vol, -flow_gt)

    flow = np.asarray(get_displacement(vol, displaced, **FLOW_PARAMS))
    epe = evaluate_flow_accuracy(flow, flow_gt, boundary=8)
    assert epe < 0.6, f"EPE {epe}"

    corrected = np.asarray(imregister_wrapper(
        jnp.asarray(displaced), jnp.asarray(flow[..., 0]),
        jnp.asarray(flow[..., 1]), jnp.asarray(flow[..., 2]),
        jnp.asarray(vol), interpolation_method="cubic"))
    ratio = improvement_ratio(vol, displaced, corrected, boundary=6)
    assert ratio > 2.0, f"improvement {ratio}"


def test_multichannel_and_uvw_init(rng):
    vol = _cell_volume(rng, shape=(24, 32, 32))
    vol2 = np.stack([vol, vol * 0.7 + 0.01], axis=-1)
    d = np.array([0.8, 0.5, -0.6], np.float32)
    flow_gt = np.broadcast_to(d, vol.shape + (3,)).copy()
    displaced = np.stack(
        [warp_volume_backward(vol2[..., c], -flow_gt) for c in range(2)], -1)

    flow = np.asarray(get_displacement(
        vol2, displaced, weight=np.array([0.5, 0.5]), **FLOW_PARAMS))
    epe = evaluate_flow_accuracy(flow, flow_gt, boundary=5)
    assert epe < 0.4, f"EPE {epe}"

    # warm start at the ground truth should stay at the ground truth
    flow_ws = np.asarray(get_displacement(
        vol2, displaced, weight=np.array([0.5, 0.5]), uvw=jnp.asarray(flow_gt),
        **FLOW_PARAMS))
    epe_ws = evaluate_flow_accuracy(flow_ws, flow_gt, boundary=5)
    assert epe_ws < 0.4, f"EPE {epe_ws}"

    # regression: the initialization must actually be HONORED (reference
    # warps moving by the resized uvw at every level incl. the coarsest,
    # core/optical_flow_3d.py:417-434) — with a starved solver the
    # warm-started run must beat the cold one decisively
    starved = dict(FLOW_PARAMS, iterations=1, levels=2)
    cold = np.asarray(get_displacement(
        vol2, displaced, weight=np.array([0.5, 0.5]), **starved))
    warm = np.asarray(get_displacement(
        vol2, displaced, weight=np.array([0.5, 0.5]),
        uvw=jnp.asarray(flow_gt), **starved))
    epe_cold = evaluate_flow_accuracy(cold, flow_gt, boundary=5)
    epe_warm = evaluate_flow_accuracy(warm, flow_gt, boundary=5)
    assert epe_warm < 0.5 * epe_cold, (epe_warm, epe_cold)


def test_min_level_upsample(rng):
    vol = _cell_volume(rng, shape=(24, 40, 40))
    d = np.array([1.0, -0.8, 0.0], np.float32)
    flow_gt = np.broadcast_to(d, vol.shape + (3,)).copy()
    displaced = warp_volume_backward(vol, -flow_gt)
    params = dict(FLOW_PARAMS)
    params["min_level"] = 2
    flow = np.asarray(get_displacement(vol, displaced, **params))
    assert flow.shape == vol.shape + (3,)
    epe = evaluate_flow_accuracy(flow, flow_gt, boundary=6)
    assert epe < 0.6, f"EPE {epe}"
