"""Finite-difference stencils matching numpy/MATLAB gradient semantics.

Parity targets: ``np.gradient`` (central differences, one-sided boundaries)
as used by the motion tensors (reference core/optical_flow_3d.py:95-113) and
``matlab_gradient`` (reference core/optical_flow_3d.py:8-16).
"""

import jax.numpy as jnp


def gradient_axis(f, axis, spacing=1.0):
    """np.gradient along one axis: central interior, one-sided boundaries."""
    n = f.shape[axis]
    if n < 2:
        return jnp.zeros_like(f)

    def sl(a, b):
        idx = [slice(None)] * f.ndim
        idx[axis] = slice(a, b)
        return tuple(idx)

    interior = (f[sl(2, None)] - f[sl(None, -2)]) / (2.0 * spacing)
    first = (f[sl(1, 2)] - f[sl(0, 1)]) / spacing
    last = (f[sl(-1, None)] - f[sl(-2, -1)]) / spacing
    return jnp.concatenate([first, interior, last], axis=axis)


def gradient_zyx(f, hz=1.0, hy=1.0, hx=1.0):
    """np.gradient(f, hz, hy, hx) over the three leading axes."""
    return (
        gradient_axis(f, 0, hz),
        gradient_axis(f, 1, hy),
        gradient_axis(f, 2, hx),
    )


def second_diff_zyx(f, hz, hy, hx):
    """Second differences per axis, zero at boundaries.

    Parity: ``gradient3`` inner helper (reference core/optical_flow_3d.py:115-122).
    Returns (fxx, fyy, fzz).
    """
    fxx = jnp.zeros_like(f)
    fyy = jnp.zeros_like(f)
    fzz = jnp.zeros_like(f)
    fxx = fxx.at[:, :, 1:-1].set(
        (f[:, :, :-2] - 2.0 * f[:, :, 1:-1] + f[:, :, 2:]) / (hx * hx))
    fyy = fyy.at[:, 1:-1, :].set(
        (f[:, :-2, :] - 2.0 * f[:, 1:-1, :] + f[:, 2:, :]) / (hy * hy))
    fzz = fzz.at[1:-1, :, :].set(
        (f[:-2, :, :] - 2.0 * f[1:-1, :, :] + f[2:, :, :]) / (hz * hz))
    return fxx, fyy, fzz


def divergence(flow, hz=1.0, hy=1.0, hx=1.0):
    """du/dx + dv/dy + dw/dz of a (Z,Y,X,3) flow field ([dx,dy,dz] order)."""
    du_dx = gradient_axis(flow[..., 0], 2, hx)
    dv_dy = gradient_axis(flow[..., 1], 1, hy)
    dw_dz = gradient_axis(flow[..., 2], 0, hz)
    return du_dx + dv_dy + dw_dz
