"""Z-sharded full pyramid vs the single-device pyramid (virtual mesh).

VERDICT round-1 item 9: a volume exceeding one chip's HBM must run
end-to-end with per-device Z-slabs and match the single-device result.
The config keeps compile time bounded while spanning sharded fine levels
(z >= 4*n_dev), replicated coarse levels, and an uneven z-split; both
tests share one compiled program (same static config).
"""

import jax
import numpy as np
from scipy.ndimage import gaussian_filter

from flowreg3d_tpu.core.pyramid import get_displacement
from flowreg3d_tpu.parallel.spatial import spatial_mesh
from flowreg3d_tpu.parallel.spatial_pyramid import get_displacement_sharded
import pytest

# heavy tier: interpret-mode Pallas / shard_map compiles (minutes on 1 CPU)
pytestmark = pytest.mark.slow

# levels=2 keeps the shard_map compile ~5 min (each level adds ring-matmul
# loops; levels=3 compiles ~15 min on the CPU backend)
PARAMS = dict(alpha=(1.5, 1.5, 1.5), update_lag=3, iterations=6,
              min_level=0, levels=2, eta=0.8, a_data=0.45,
              const_assumption="gc")
SHAPE = (42, 24, 24)   # 42 over 4 devices: pz=11, 2 rows of shard padding
N_DEV = 4


def _pair(shape, seed=0):
    rng = np.random.default_rng(seed)
    blobs = np.zeros(shape, np.float32)
    n = 600
    idx = tuple(rng.integers(2, s - 2, n) for s in shape)
    blobs[idx] = rng.random(n).astype(np.float32) + 0.5
    fixed = gaussian_filter(blobs, (1.0, 1.5, 1.5)).astype(np.float32)
    fixed /= fixed.max()
    moving = np.roll(fixed, (1, 2, -2), axis=(0, 1, 2))
    return fixed, moving


def test_sharded_pyramid_matches_single_device():
    fixed, moving = _pair(SHAPE)
    mesh = spatial_mesh(jax.devices()[:N_DEV])

    ref = np.asarray(get_displacement(
        fixed, moving, a_smooth=1.0, **PARAMS))
    flow, valid = get_displacement_sharded(
        fixed, moving, mesh=mesh, **PARAMS)
    assert bool(valid)
    # tolerance note: a 1-device-mesh control run of the SAME sharded
    # program shows identical worst-case deviation (~2.6e-3) — benign f32
    # reassociation (resize axis order, stencil grouping) amplified by the
    # omega=1.95 SOR through 3 nonlinear levels, not a sharding artifact
    # (mean |diff| is ~3e-5)
    diff = np.abs(np.asarray(flow) - ref)
    assert diff.mean() < 2e-4, diff.mean()
    np.testing.assert_allclose(np.asarray(flow), ref, rtol=6e-3, atol=6e-3)


def test_sharded_pyramid_asmooth_varying_weight():
    """a_smooth != 1 (flow-driven diffusivity, psi halo exchange) plus a
    spatially-varying weight volume, vs the single-device pyramid. One
    combined config keeps this to a single shard_map compile."""
    fixed, moving = _pair(SHAPE, seed=3)
    rng = np.random.default_rng(7)
    wvol = (0.5 + rng.random(SHAPE + (1,))).astype(np.float32)
    mesh = spatial_mesh(jax.devices()[:N_DEV])

    ref = np.asarray(get_displacement(
        fixed, moving, a_smooth=0.5, weight=wvol, **PARAMS))
    flow, valid = get_displacement_sharded(
        fixed, moving, mesh=mesh, a_smooth=0.5, weight=wvol, **PARAMS)
    assert bool(valid)
    diff = np.abs(np.asarray(flow) - ref)
    assert diff.mean() < 2e-4, diff.mean()
    np.testing.assert_allclose(np.asarray(flow), ref, rtol=6e-3, atol=6e-3)


def test_sharded_pyramid_halo_violation_flagged():
    """Flows demanding z-samples beyond halo_w must clear the valid flag
    (same static config as above -> reuses the compiled program)."""
    fixed, moving = _pair(SHAPE, seed=1)
    mesh = spatial_mesh(jax.devices()[:N_DEV])
    big_w = np.zeros(SHAPE + (3,), np.float32)
    big_w[..., 2] = 14.0  # z-displacement far beyond the default halo
    flow, valid = get_displacement_sharded(
        fixed, moving, mesh=mesh, uvw=big_w, **PARAMS)
    assert not bool(valid)


def test_spatial_executor_end_to_end():
    """The 'spatial' executor registers frames with the Z-sharded pyramid
    through the standard pipeline surface (tiny config: shared compile)."""
    from flowreg3d_tpu.pipeline import compensate_arr_3D
    from flowreg3d_tpu.pipeline.corrector import RegistrationConfig
    from flowreg3d_tpu.parallel.executors import get_executor

    ex = get_executor("spatial", devices=jax.devices()[:2])
    assert ex.get_info()["sharding"] == "z-spatial"

    fixed, moving = _pair((16, 16, 16))
    from flowreg3d_tpu.pipeline import OFOptions

    opts = OFOptions(quality_setting="fast", levels=1, iterations=2,
                     update_lag=2, alpha=(1.5, 1.5, 1.5),
                     sigma=[[0.3, 0.3, 0.3, 0.1]], a_smooth=1.0)
    reg, flow = compensate_arr_3D(
        moving[None, ..., None], fixed[..., None], options=opts,
        config=RegistrationConfig(parallelization="spatial", prefetch=0,
                                  async_write=False))
    assert np.isfinite(reg).all() and np.isfinite(flow).all()
    inner = (0, slice(2, -2), slice(2, -2), slice(2, -2), 0)
    assert (np.abs(reg - fixed[None, ..., None])[inner].mean()
            < np.abs(moving - fixed)[2:-2, 2:-2, 2:-2].mean())
