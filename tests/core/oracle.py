"""Independent numpy oracles for the variational level solver.

Written from the algorithm spec (SURVEY.md §2.1/§2.2): nonlinear SOR on the
Euler-Lagrange system with lagged-nonlinearity psi_data (every ``update_lag``
iterations), flow-driven smoothness diffusivity psi_smooth each iteration,
omega=1.95, Neumann boundaries. Two sweep orders are provided:

- ``sor_redblack_oracle``: checkerboard half-sweeps, the exact scheme of
  flowreg3d_tpu.core.solver — used for tight numerical verification.
- ``sor_lexicographic_oracle``: classic in-place lexicographic Gauss-Seidel
  (the reference's CPU ordering) — used to verify both orderings reach the
  same fixed point within tolerance.

Pure numpy, float64, small volumes only (tests).
"""

import numpy as np

OMEGA = 1.95
EPS_PSI = 1e-6
EPS_SMOOTH = 1e-5


def set_boundary(f):
    f[:, 0, :] = f[:, 1, :]
    f[:, -1, :] = f[:, -2, :]
    f[:, :, 0] = f[:, :, 1]
    f[:, :, -1] = f[:, :, -2]
    f[0, :, :] = f[1, :, :]
    f[-1, :, :] = f[-2, :, :]
    return f


def psi_smooth_field(u, du, v, dv, w, dw, a, hx, hy, hz):
    g = np.zeros_like(u)
    for comp, dcomp in ((u, du), (v, dv), (w, dw)):
        cc = comp + dcomp
        for axis, h in ((0, hz), (1, hy), (2, hx)):
            fp = np.take(cc, np.minimum(np.arange(cc.shape[axis]) + 1,
                                        cc.shape[axis] - 1), axis=axis)
            fm = np.take(cc, np.maximum(np.arange(cc.shape[axis]) - 1, 0),
                         axis=axis)
            d = (fp - fm) / (2.0 * h)
            g += d * d
    g = np.maximum(g, 0.0)
    return a * (g + EPS_SMOOTH) ** (a - 1.0)


def psi_data_field(J, du, dv, dw, a_data):
    """(p,m,n,C) lagged-nonlinearity weights; 1 where a_data[c] == 1."""
    (J11, J22, J33, J44, J12, J13, J23, J14, J24, J34) = J
    d_u = du[..., None]
    d_v = dv[..., None]
    d_w = dw[..., None]
    E = (J11 * d_u * d_u + J22 * d_v * d_v + J33 * d_w * d_w
         + 2 * J12 * d_u * d_v + 2 * J13 * d_u * d_w + 2 * J23 * d_v * d_w
         + 2 * J14 * d_u + 2 * J24 * d_v + 2 * J34 * d_w + J44)
    E = np.maximum(E, 0.0)
    a = np.asarray(a_data, np.float64).reshape(1, 1, 1, -1)
    psi = a * (E + EPS_PSI) ** (a - 1.0)
    return np.where(a == 1.0, 1.0, psi)


def _smooth_weight_arrays(psi_s, a_smooth, alpha, hx, hy, hz, shape):
    p, m, n = shape
    ax = alpha[0] / (hx * hx)
    ay = alpha[1] / (hy * hy)
    az = alpha[2] / (hz * hz)
    I = np.s_[1:-1, 1:-1, 1:-1]
    if a_smooth == 1.0:
        full = np.full((p - 2, m - 2, n - 2), 1.0)
        return {
            "xm": ax * full, "xp": ax * full,
            "ym": ay * full, "yp": ay * full,
            "zm": az * full, "zp": az * full,
        }
    c = psi_s[I]
    return {
        "xm": 0.5 * (c + psi_s[1:-1, 1:-1, :-2]) * ax,
        "xp": 0.5 * (c + psi_s[1:-1, 1:-1, 2:]) * ax,
        "ym": 0.5 * (c + psi_s[1:-1, :-2, 1:-1]) * ay,
        "yp": 0.5 * (c + psi_s[1:-1, 2:, 1:-1]) * ay,
        "zm": 0.5 * (c + psi_s[:-2, 1:-1, 1:-1]) * az,
        "zp": 0.5 * (c + psi_s[2:, 1:-1, 1:-1]) * az,
    }


def sor_redblack_oracle(J, weight, u, v, w, alpha, iterations, update_lag,
                        a_data, a_smooth, hx, hy, hz):
    """Red-black SOR, mirroring flowreg3d_tpu.core.solver update order."""
    J = [np.asarray(x, np.float64) for x in J]
    weight = np.asarray(weight, np.float64)
    u = np.asarray(u, np.float64)
    v = np.asarray(v, np.float64)
    w = np.asarray(w, np.float64)
    p, m, n, C = J[0].shape
    du = np.zeros((p, m, n))
    dv = np.zeros((p, m, n))
    dw = np.zeros((p, m, n))
    psi = np.ones((p, m, n, C))

    kk, jj, ii = np.meshgrid(np.arange(1, p - 1), np.arange(1, m - 1),
                             np.arange(1, n - 1), indexing="ij")
    red = ((kk + jj + ii) % 2) == 0

    I = np.s_[1:-1, 1:-1, 1:-1]

    def nbr(f):
        return {
            "xm": f[1:-1, 1:-1, :-2], "xp": f[1:-1, 1:-1, 2:],
            "ym": f[1:-1, :-2, 1:-1], "yp": f[1:-1, 2:, 1:-1],
            "zm": f[:-2, 1:-1, 1:-1], "zp": f[2:, 1:-1, 1:-1],
        }

    (J11, J22, J33, J44, J12, J13, J23, J14, J24, J34) = J

    def half(mask, du, dv, dw, S, sw):
        SJ = {k: np.sum(S * val, -1) for k, val in (
            ("11", J11), ("22", J22), ("33", J33),
            ("12", J12), ("13", J13), ("23", J23),
            ("14", J14), ("24", J24), ("34", J34))}
        nu = -(SJ["14"][I] + SJ["12"][I] * dv[I] + SJ["13"][I] * dw[I])
        nv = -(SJ["24"][I] + SJ["12"][I] * du[I] + SJ["23"][I] * dw[I])
        nw = -(SJ["34"][I] + SJ["13"][I] * du[I] + SJ["23"][I] * dv[I])
        sw_sum = sum(sw.values())
        out = []
        for base, inc, nd, dd in ((u, du, nu, SJ["11"]), (v, dv, nv, SJ["22"]),
                                  (w, dw, nw, SJ["33"])):
            tot = base + inc
            nb = nbr(tot)
            num = nd + sum(sw[k] * (nb[k] - base[I]) for k in sw)
            den = dd[I] + sw_sum
            frac = np.where(den != 0, num / np.where(den != 0, den, 1.0), 0.0)
            new = (1 - OMEGA) * inc[I] + OMEGA * frac
            upd = inc.copy()
            upd[I] = np.where(mask, new, inc[I])
            out.append(set_boundary(upd))
        return out

    for it in range(iterations):
        if it % update_lag == 0:
            psi = psi_data_field(J, du, dv, dw, a_data)
        S = weight * psi
        du = set_boundary(du)
        dv = set_boundary(dv)
        dw = set_boundary(dw)
        psi_s = (psi_smooth_field(u, du, v, dv, w, dw, a_smooth, hx, hy, hz)
                 if a_smooth != 1.0 else None)
        sw = _smooth_weight_arrays(psi_s, a_smooth, alpha, hx, hy, hz, (p, m, n))
        du, dv, dw = half(red, du, dv, dw, S, sw)
        du, dv, dw = half(~red, du, dv, dw, S, sw)
    return du, dv, dw


def sor_lexicographic_oracle(J, weight, u, v, w, alpha, iterations, update_lag,
                             a_data, a_smooth, hx, hy, hz):
    """In-place lexicographic Gauss-Seidel SOR (reference CPU ordering):
    du is updated voxel-by-voxel and the fresh du feeds dv's equation."""
    J = [np.asarray(x, np.float64) for x in J]
    weight = np.asarray(weight, np.float64)
    u = np.asarray(u, np.float64)
    v = np.asarray(v, np.float64)
    w = np.asarray(w, np.float64)
    p, m, n, C = J[0].shape
    (J11, J22, J33, J44, J12, J13, J23, J14, J24, J34) = J
    du = np.zeros((p, m, n))
    dv = np.zeros((p, m, n))
    dw = np.zeros((p, m, n))
    psi = np.ones((p, m, n, C))
    a_data = np.asarray(a_data, np.float64)
    ax = alpha[0] / (hx * hx)
    ay = alpha[1] / (hy * hy)
    az = alpha[2] / (hz * hz)

    for it in range(iterations):
        if it % update_lag == 0:
            psi = psi_data_field(J, du, dv, dw, a_data)
        if a_smooth != 1.0:
            psi_s = psi_smooth_field(u, du, v, dv, w, dw, a_smooth, hx, hy, hz)
        set_boundary(du)
        set_boundary(dv)
        set_boundary(dw)
        for k in range(1, p - 1):
            for j in range(1, m - 1):
                for i in range(1, n - 1):
                    if a_smooth != 1.0:
                        wts = (
                            (0.5 * (psi_s[k, j, i] + psi_s[k, j, i - 1]) * ax, (k, j, i - 1)),
                            (0.5 * (psi_s[k, j, i] + psi_s[k, j, i + 1]) * ax, (k, j, i + 1)),
                            (0.5 * (psi_s[k, j, i] + psi_s[k, j - 1, i]) * ay, (k, j - 1, i)),
                            (0.5 * (psi_s[k, j, i] + psi_s[k, j + 1, i]) * ay, (k, j + 1, i)),
                            (0.5 * (psi_s[k, j, i] + psi_s[k - 1, j, i]) * az, (k - 1, j, i)),
                            (0.5 * (psi_s[k, j, i] + psi_s[k + 1, j, i]) * az, (k + 1, j, i)),
                        )
                    else:
                        wts = (
                            (ax, (k, j, i - 1)), (ax, (k, j, i + 1)),
                            (ay, (k, j - 1, i)), (ay, (k, j + 1, i)),
                            (az, (k - 1, j, i)), (az, (k + 1, j, i)),
                        )
                    num_u = num_v = num_w = 0.0
                    den_s = 0.0
                    for wgt, idx in wts:
                        num_u += wgt * (u[idx] + du[idx] - u[k, j, i])
                        num_v += wgt * (v[idx] + dv[idx] - v[k, j, i])
                        num_w += wgt * (w[idx] + dw[idx] - w[k, j, i])
                        den_s += wgt
                    S = weight[k, j, i] * psi[k, j, i]
                    den_u = den_s + float(np.sum(S * J11[k, j, i]))
                    den_v = den_s + float(np.sum(S * J22[k, j, i]))
                    den_w = den_s + float(np.sum(S * J33[k, j, i]))
                    nu = num_u - float(np.sum(S * (J14[k, j, i]
                                                   + J12[k, j, i] * dv[k, j, i]
                                                   + J13[k, j, i] * dw[k, j, i])))
                    du[k, j, i] = ((1 - OMEGA) * du[k, j, i]
                                   + OMEGA * (nu / den_u if den_u != 0 else 0.0))
                    nv = num_v - float(np.sum(S * (J24[k, j, i]
                                                   + J12[k, j, i] * du[k, j, i]
                                                   + J23[k, j, i] * dw[k, j, i])))
                    dv[k, j, i] = ((1 - OMEGA) * dv[k, j, i]
                                   + OMEGA * (nv / den_v if den_v != 0 else 0.0))
                    nw = num_w - float(np.sum(S * (J34[k, j, i]
                                                   + J13[k, j, i] * du[k, j, i]
                                                   + J23[k, j, i] * dv[k, j, i])))
                    dw[k, j, i] = ((1 - OMEGA) * dw[k, j, i]
                                   + OMEGA * (nw / den_w if den_w != 0 else 0.0))
    return du, dv, dw
