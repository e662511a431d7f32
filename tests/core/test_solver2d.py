"""2D legacy solver tests (parity scope: reference core.compute_flow)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import gaussian_filter, shift as ndshift

from flowreg3d_tpu.core.solver2d import compute_flow

jax.config.update("jax_enable_x64", True)


def _motion_tensor_2d(f1, f2):
    """Brightness-constancy 2D motion tensor (J11, J22, J33, J12, J13, J23)."""
    fx = 0.5 * (np.gradient(f1, axis=1) + np.gradient(f2, axis=1))
    fy = 0.5 * (np.gradient(f1, axis=0) + np.gradient(f2, axis=0))
    ft = f2 - f1
    return (fx * fx, fy * fy, ft * ft, fx * fy, fx * ft, fy * ft)


def _problem(shift_yx=(0.0, 0.4), shape=(40, 44)):
    rng = np.random.default_rng(3)
    f1 = gaussian_filter(rng.random(shape), 2.5)
    f2 = ndshift(f1, shift_yx, order=1, mode="nearest")
    J = [jnp.asarray(np.pad(j, 1, mode="edge"))[..., None]
         for j in _motion_tensor_2d(f1, f2)]
    m, n = shape[0] + 2, shape[1] + 2
    weight = jnp.ones((m, n, 1), jnp.float64)
    u = jnp.zeros((m, n), jnp.float64)
    v = jnp.zeros((m, n), jnp.float64)
    return J, weight, u, v


def test_translation_recovery_x():
    J, weight, u, v = _problem(shift_yx=(0.0, 0.4))
    du, dv = compute_flow(J, weight, u, v, alpha=(0.02, 0.02), iterations=80,
                          update_lag=5, a_data=1.0, a_smooth=1.0)
    du_i = np.asarray(du)[8:-8, 8:-8]
    dv_i = np.asarray(dv)[8:-8, 8:-8]
    assert abs(np.median(du_i) - 0.4) < 0.15
    assert abs(np.median(dv_i)) < 0.15


def test_translation_recovery_y_nonlinear():
    J, weight, u, v = _problem(shift_yx=(0.4, 0.0))
    du, dv = compute_flow(J, weight, u, v, alpha=(0.02, 0.02), iterations=80,
                          update_lag=5, a_data=0.45, a_smooth=0.5)
    dv_i = np.asarray(dv)[8:-8, 8:-8]
    du_i = np.asarray(du)[8:-8, 8:-8]
    assert abs(np.median(dv_i) - 0.4) < 0.15
    assert abs(np.median(du_i)) < 0.15


def test_zero_motion_gives_zero_flow():
    J, weight, u, v = _problem(shift_yx=(0.0, 0.0))
    du, dv = compute_flow(J, weight, u, v, alpha=(0.02, 0.02), iterations=40,
                          update_lag=5, a_data=0.45, a_smooth=1.0)
    assert float(jnp.abs(du).max()) < 0.05
    assert float(jnp.abs(dv).max()) < 0.05
