"""Pallas half-sweep parity vs the XLA red-black solver (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowreg3d_tpu.core.solver import _solve
from flowreg3d_tpu.core.solver_pallas import halfsweep_pallas

from tests.core.oracle import sor_redblack_oracle

# heavy tier: interpret-mode Pallas / shard_map compiles (minutes on 1 CPU)
pytestmark = pytest.mark.slow


def _inputs(shape=(10, 14, 18), C=1, seed=0):
    rng = np.random.default_rng(seed)
    p, m, n = shape
    Jt = jnp.asarray(rng.random((10, p, m, n, C)).astype(np.float32)) * 0.1
    weight = jnp.ones((p, m, n, C), jnp.float32)
    u = jnp.asarray(rng.random((p, m, n)).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.random((p, m, n)).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.random((p, m, n)).astype(np.float32) * 0.5)
    return Jt, weight, u, v, w


def test_halfsweep_interpret_matches_oracle():
    """One red+black sweep (interpret mode) == the numpy red-black oracle."""
    Jt, weight, u, v, w = _inputs()
    J = [np.asarray(Jt[i], np.float64) for i in range(10)]
    alpha = (1.5, 1.2, 1.1)
    want = sor_redblack_oracle(J, np.asarray(weight), np.asarray(u),
                               np.asarray(v), np.asarray(w), alpha,
                               iterations=1, update_lag=5, a_data=[1.0],
                               a_smooth=1.0, hx=1.0, hy=1.0, hz=1.0)

    # build SJ with psi == 1 (a_data=1): SJ_xy = sum_c weight*J_xy
    order = {"11": 0, "22": 1, "33": 2, "12": 4, "13": 5, "23": 6,
             "14": 7, "24": 8, "34": 9}
    SJ = tuple(jnp.sum(weight * Jt[i], -1)
               for i in (0, 1, 2, 4, 5, 6, 7, 8, 9))
    params = jnp.asarray(alpha, jnp.float32)

    from flowreg3d_tpu.core.solver import set_boundary_3d

    du = jnp.zeros_like(u)
    dv = jnp.zeros_like(u)
    dw = jnp.zeros_like(u)
    du, dv, dw = halfsweep_pallas(du, dv, dw, u, v, w, SJ, params, 0,
                                  interpret=True)
    du = set_boundary_3d(du)
    dv = set_boundary_3d(dv)
    dw = set_boundary_3d(dw)
    du, dv, dw = halfsweep_pallas(du, dv, dw, u, v, w, SJ, params, 1,
                                  interpret=True)
    du = set_boundary_3d(du)
    dv = set_boundary_3d(dv)
    dw = set_boundary_3d(dw)

    for got, ref in zip((du, dv, dw), want):
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shape", [(9, 12, 16), (18, 20, 24)])
def test_solve_pallas_interpret_matches_xla(shape):
    """Full _solve with pallas half-sweeps (interpret) == XLA path."""
    Jt, weight, u, v, w = _inputs(shape)
    alpha = jnp.asarray((1.0, 1.0, 1.0), jnp.float32)
    a_data = jnp.asarray([0.45], jnp.float32)
    one = jnp.float32(1.0)
    # _solve takes channel-LEADING operands (round-5 TPU layout fix)
    args = (jnp.moveaxis(Jt, -1, 1), jnp.moveaxis(weight, -1, 0),
            u, v, w, alpha, a_data, one, one, one, one, 6, 3,
            True)
    ref = _solve(*args, use_pallas=False)
    import flowreg3d_tpu.core.solver_pallas as sp

    orig = sp.sweep_iterations_pallas
    sp.sweep_iterations_pallas = lambda *a, **k: orig(*a, interpret=True, **k)
    try:
        got = _solve(*args, use_pallas=True)
    finally:
        sp.sweep_iterations_pallas = orig
    # f32 accumulation-order differences grow with SOR iterations (omega
    # 1.95); single-sweep parity is exact (test above), iterated runs agree
    # to ~1e-4 relative
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-3, atol=1e-3)


def test_asmooth_halfsweeps_match_numpy_oracle():
    """psi-kernel red+black sweep (interpret) == numpy oracle, a_smooth=0.5."""
    from flowreg3d_tpu.core.solver import set_boundary_3d, _psi_smooth_field
    from flowreg3d_tpu.core.solver_pallas import halfsweep_pallas_psi

    Jt, weight, u, v, w = _inputs()
    J = [np.asarray(Jt[i], np.float64) for i in range(10)]
    alpha = (1.5, 1.2, 1.1)
    want = sor_redblack_oracle(J, np.asarray(weight), np.asarray(u),
                               np.asarray(v), np.asarray(w), alpha,
                               iterations=1, update_lag=5, a_data=[1.0],
                               a_smooth=0.5, hx=1.0, hy=1.0, hz=1.0)

    SJ = tuple(jnp.sum(weight * Jt[i], -1)
               for i in (0, 1, 2, 4, 5, 6, 7, 8, 9))
    params = jnp.asarray(alpha, jnp.float32)
    du = jnp.zeros_like(u)
    dv = jnp.zeros_like(u)
    dw = jnp.zeros_like(u)
    for phase in (0, 1):
        du = set_boundary_3d(du)
        dv = set_boundary_3d(dv)
        dw = set_boundary_3d(dw)
        if phase == 0:
            psi = _psi_smooth_field(u, du, v, dv, w, dw, 0.5, 1.0, 1.0, 1.0)
        du, dv, dw = halfsweep_pallas_psi(du, dv, dw, u, v, w, psi, SJ,
                                          params, phase, interpret=True)
    du = set_boundary_3d(du)
    dv = set_boundary_3d(dv)
    dw = set_boundary_3d(dw)
    for got, ref in zip((du, dv, dw), want):
        np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-5,
                                   atol=3e-5)


@pytest.mark.parametrize("shape", [(9, 28, 16), (12, 24, 140)])
def test_sweep_y_tiled_matches_whole_plane(shape):
    """y-tiled fused kernel (force_ty, interpret) == whole-plane kernel.

    The tiled path is what runs at full-resolution levels (512^2 planes at
    min_level 0) where whole-plane slabs exceed VMEM; numerics must be
    independent of the tile height. Non-multiple-of-ty m exercises the
    partial last tile."""
    from flowreg3d_tpu.core.solver_pallas import sweep_iterations_pallas

    Jt, weight, u, v, w = _inputs(shape)
    SJ = tuple(jnp.sum(weight * Jt[i], -1)
               for i in (0, 1, 2, 4, 5, 6, 7, 8, 9))
    params = jnp.asarray((1.5, 1.2, 1.1), jnp.float32)
    du = jnp.zeros_like(u)
    dv = jnp.zeros_like(u)
    dw = jnp.zeros_like(u)
    ref = sweep_iterations_pallas(du, dv, dw, u, v, w, SJ, params, 2,
                                  interpret=True)
    got = sweep_iterations_pallas(du, dv, dw, u, v, w, SJ, params, 2,
                                  interpret=True, force_ty=8)
    # ring rows are owned by the caller's set_boundary (the fused kernels
    # leave them untouched; the emulation path refreshes them) — compare
    # the post-boundary fields, which is what _solve consumes
    from flowreg3d_tpu.core.solver import set_boundary_3d

    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(set_boundary_3d(g)),
                                   np.asarray(set_boundary_3d(r)),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shape", [(9, 28, 16)])
def test_sweep_psi_y_tiled_matches_whole_plane(shape):
    """y-tiled psi kernel (force_ty, interpret) == whole-plane psi kernel."""
    from flowreg3d_tpu.core.solver_pallas import sweep_iterations_pallas_psi

    Jt, weight, u, v, w = _inputs(shape)
    SJ = tuple(jnp.sum(weight * Jt[i], -1)
               for i in (0, 1, 2, 4, 5, 6, 7, 8, 9))
    params = jnp.asarray((1.5, 1.2, 1.1, 0.5, 0.5, 0.5, 0.5), jnp.float32)
    du = jnp.zeros_like(u)
    dv = jnp.zeros_like(u)
    dw = jnp.zeros_like(u)
    ref = sweep_iterations_pallas_psi(du, dv, dw, u, v, w, SJ, params, 2,
                                      interpret=True)
    got = sweep_iterations_pallas_psi(du, dv, dw, u, v, w, SJ, params, 2,
                                      interpret=True, force_ty=8)
    from flowreg3d_tpu.core.solver import set_boundary_3d

    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(set_boundary_3d(g)),
                                   np.asarray(set_boundary_3d(r)),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("a_smooth", [0.5, 0.75])
def test_solve_pallas_asmooth_interpret_matches_xla(a_smooth):
    """Flow-driven-diffusivity kernel path (interpret) == XLA path.

    The reference's *default* configuration uses a_smooth=0.5 (reference
    core/optical_flow_3d.py:319), so this is the quality-config parity.
    """
    Jt, weight, u, v, w = _inputs((9, 12, 16))
    alpha = jnp.asarray((1.0, 1.2, 0.9), jnp.float32)
    a_data = jnp.asarray([0.45], jnp.float32)
    one = jnp.float32(1.0)
    # _solve takes channel-LEADING operands (round-5 TPU layout fix)
    args = (jnp.moveaxis(Jt, -1, 1), jnp.moveaxis(weight, -1, 0),
            u, v, w, alpha, a_data, jnp.float32(a_smooth),
            one, one, one, 6, 3, False)
    ref = _solve(*args, use_pallas=False)
    import flowreg3d_tpu.core.solver_pallas as sp

    orig = sp.sweep_iterations_pallas_psi
    sp.sweep_iterations_pallas_psi = (
        lambda *a, **k: orig(*a, interpret=True, **k))
    try:
        got = _solve(*args, use_pallas=True)
    finally:
        sp.sweep_iterations_pallas_psi = orig
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-3, atol=1e-3)
