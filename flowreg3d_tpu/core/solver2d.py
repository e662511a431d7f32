"""2D red-black SOR level solver (legacy/2D path).

Parity target: the reference's 2D solver exported as ``core.compute_flow``
(reference core/level_solver_3d.py:6-243): nonlinear point-wise SOR on the
2D Euler-Lagrange system — data term with lagged-nonlinearity psi updates
every ``update_lag`` iterations, flow-driven smoothness diffusivity each
iteration, omega=1.95, Neumann boundaries. Same red-black vectorization as
the 3D solver (core/solver.py).

J entries: 2D motion tensor (J11, J22, J33, J12, J13, J23) with the
convention J = [[J11, J12, J13], [J12, J22, J23], [J13, J23, J33]] over
(u, v, 1) — i.e. J13/J23 are the data-term couplings and J33 the constant.
"""

from functools import partial

import jax
import jax.numpy as jnp

OMEGA = 1.95
EPS_PSI = 1e-6
EPS_SMOOTH = 1e-5


def set_boundary_2d(f):
    f = f.at[0, :].set(f[1, :])
    f = f.at[-1, :].set(f[-2, :])
    f = f.at[:, 0].set(f[:, 1])
    f = f.at[:, -1].set(f[:, -2])
    return f


def _cgrad(f, axis, h):
    n = f.shape[axis]
    fp = f.take(jnp.minimum(jnp.arange(n) + 1, n - 1), axis=axis)
    fm = f.take(jnp.maximum(jnp.arange(n) - 1, 0), axis=axis)
    return (fp - fm) / (2.0 * h)


def _psi_smooth(u, du, v, dv, a, hx, hy):
    g = jnp.zeros_like(u)
    for comp, dcomp in ((u, du), (v, dv)):
        cc = comp + dcomp
        for axis, h in ((0, hy), (1, hx)):
            d = _cgrad(cc, axis, h)
            g = g + d * d
    return a * (jnp.maximum(g, 0.0) + EPS_SMOOTH) ** (a - 1.0)


def _interior(f):
    return f[1:-1, 1:-1]


def _nbr(f):
    return dict(xm=f[1:-1, :-2], xp=f[1:-1, 2:],
                ym=f[:-2, 1:-1], yp=f[2:, 1:-1])


@partial(jax.jit, static_argnames=("iterations", "update_lag",
                                   "a_smooth_is_one"))
def _solve2d(Jt, weight, u, v, alpha, a_data, a_smooth, hx, hy,
             iterations, update_lag, a_smooth_is_one):
    """Jt: (6, m, n, C) stacked [J11, J22, J33, J12, J13, J23]."""
    dtype = u.dtype
    _, m, n, C = Jt.shape
    J11, J22, J33, J12, J13, J23 = [Jt[i] for i in range(6)]

    du = jnp.zeros((m, n), dtype)
    dv = jnp.zeros((m, n), dtype)
    ax = alpha[0] / (hx * hx)
    ay = alpha[1] / (hy * hy)
    a_vec = a_data.reshape(1, 1, C)

    jj = jax.lax.broadcasted_iota(jnp.int32, (m - 2, n - 2), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (m - 2, n - 2), 1)
    red = ((jj + ii) % 2) == 0

    def tick(du, dv):
        d_u = du[..., None]
        d_v = dv[..., None]
        E = (J11 * d_u * d_u + J22 * d_v * d_v + 2 * J12 * d_u * d_v
             + 2 * J13 * d_u + 2 * J23 * d_v + J33)
        E = jnp.maximum(E, 0.0)
        psi = jnp.where(a_vec != 1.0,
                        a_vec * (E + EPS_PSI) ** (a_vec - 1.0),
                        jnp.ones_like(E))
        S = weight * psi
        return (jnp.sum(S * J11, -1), jnp.sum(S * J22, -1),
                jnp.sum(S * J12, -1), jnp.sum(S * J13, -1),
                jnp.sum(S * J23, -1))

    def smooth_weights(du, dv):
        if a_smooth_is_one:
            shape = (m - 2, n - 2)
            return {k: jnp.full(shape, val, dtype) for k, val in (
                ("xm", ax), ("xp", ax), ("ym", ay), ("yp", ay))}
        psi = _psi_smooth(u, du, v, dv, a_smooth, hx, hy)
        c = _interior(psi)
        nb = _nbr(psi)
        return dict(xm=0.5 * (c + nb["xm"]) * ax,
                    xp=0.5 * (c + nb["xp"]) * ax,
                    ym=0.5 * (c + nb["ym"]) * ay,
                    yp=0.5 * (c + nb["yp"]) * ay)

    def half(mask, du, dv, SJ, sw):
        SJ11, SJ22, SJ12, SJ13, SJ23 = SJ
        duI = _interior(du)
        dvI = _interior(dv)
        nu = -(_interior(SJ13) + _interior(SJ12) * dvI)
        nv = -(_interior(SJ23) + _interior(SJ12) * duI)
        sw_sum = sw["xm"] + sw["xp"] + sw["ym"] + sw["yp"]

        def comp(base, inc, nd, dd, old):
            tot = base + inc
            nb = _nbr(tot)
            baseI = _interior(base)
            num = nd + sum(sw[k] * (nb[k] - baseI) for k in sw)
            den = dd + sw_sum
            frac = jnp.where(den != 0, num / den, jnp.zeros_like(den))
            new = (1.0 - OMEGA) * old + OMEGA * frac
            return jnp.where(mask, new, old)

        new_du = comp(u, du, nu, _interior(SJ11), duI)
        new_dv = comp(v, dv, nv, _interior(SJ22), dvI)
        du = set_boundary_2d(du.at[1:-1, 1:-1].set(new_du))
        dv = set_boundary_2d(dv.at[1:-1, 1:-1].set(new_dv))
        return du, dv

    SJ0 = tick(du, dv)

    def body(it, state):
        du, dv, SJ = state
        SJ = jax.lax.cond(jnp.mod(it, update_lag) == 0,
                          lambda _: tick(du, dv), lambda sj: sj, SJ)
        du = set_boundary_2d(du)
        dv = set_boundary_2d(dv)
        sw = smooth_weights(du, dv)
        du, dv = half(red, du, dv, SJ, sw)
        du, dv = half(~red, du, dv, SJ, sw)
        return du, dv, SJ

    du, dv, _ = jax.lax.fori_loop(0, iterations, body, (du, dv, SJ0))
    return du, dv


def compute_flow(J_entries, weight, u, v, alpha=(2.0, 2.0), iterations=20,
                 update_lag=5, a_data=0.45, a_smooth=1.0, hx=1.0, hy=1.0):
    """Solve one 2D level; returns (du, dv).

    J_entries: 6 arrays (m, n, C) in order [J11, J22, J33, J12, J13, J23];
    weight (m, n, C); u, v (m, n) accumulated flow with boundary ring.
    """
    import numpy as np

    dtype = u.dtype
    Jt = jnp.stack(list(J_entries)).astype(dtype)
    C = Jt.shape[-1]
    a_data = jnp.asarray(np.broadcast_to(np.asarray(a_data, np.float64),
                                         (C,)), dtype)
    alpha = jnp.asarray(alpha, dtype)
    a_smooth_is_one = float(a_smooth) == 1.0
    return _solve2d(Jt, weight.astype(dtype), u, v, alpha, a_data,
                    jnp.asarray(a_smooth, dtype), jnp.asarray(hx, dtype),
                    jnp.asarray(hy, dtype), int(iterations), int(update_lag),
                    a_smooth_is_one)
