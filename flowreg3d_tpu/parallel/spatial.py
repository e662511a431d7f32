"""Spatially-sharded level solver: Z-axis sharding with halo exchange.

The reference cannot process volumes larger than one worker's RAM
(SURVEY.md §5: "Z/Y/X — nothing"). This module shards the SOR solver's Z
axis over the device mesh: each chip holds a contiguous Z-slab of the
volume plus the ten motion-tensor fields, and exchanges one-voxel halos
with its mesh neighbors via ``lax.ppermute`` before every half-sweep —
the honest 3D-stencil counterpart of context parallelism, riding ICI.

Both smoothness regimes are supported: ``a_smooth == 1`` (constant
diffusivity) exchanges one-voxel flow halos per half-sweep; ``a_smooth !=
1`` additionally computes the flow-driven diffusivity field psi locally
each iteration and exchanges its ghost rows (one extra ppermute pair per
iteration). Numerics match core/solver.py's red-black sweep up to f32
reduction order.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

OMEGA = 1.95
EPS_PSI = 1e-6
EPS_SMOOTH = 1e-5


def spatial_mesh(devices=None, axis="z"):
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis,))


def _exchange_halo(f, axis_name):
    """Update the ghost z-rows of a local (pz+2, m, n) block.

    Interior shards receive neighbors' edge rows; the global top/bottom
    shards apply the Neumann copy (global set_boundary_3d semantics).
    """
    idx = jax.lax.axis_index(axis_name)
    size = jax.lax.axis_size(axis_name)
    down = [(i, (i + 1) % size) for i in range(size)]   # send last row down
    up = [(i, (i - 1) % size) for i in range(size)]     # send first row up

    from_above = jax.lax.ppermute(f[-2], axis_name, down)  # neighbor's last
    from_below = jax.lax.ppermute(f[1], axis_name, up)     # neighbor's first

    top_ghost = jnp.where(idx == 0, f[1], from_above)
    bottom_ghost = jnp.where(idx == size - 1, f[-2], from_below)
    return f.at[0].set(top_ghost).at[-1].set(bottom_ghost)


def _set_boundary_yx(f):
    f = f.at[:, 0, :].set(f[:, 1, :])
    f = f.at[:, -1, :].set(f[:, -2, :])
    f = f.at[:, :, 0].set(f[:, :, 1])
    f = f.at[:, :, -1].set(f[:, :, -2])
    return f


def _psi_sharded(du, dv, dw, u, v, w, a_smooth, hx, hy, hz, axis_name,
                 z_off, p_int):
    """Flow-driven diffusivity psi on the local ringed block.

    Matches core/solver._psi_smooth_field evaluated on the global ringed
    grid: interior rows are exact from the local block (their z-neighbors
    are present as exchanged ghosts); ghost rows then come from the
    neighbors' exchange; global ring rows (ringed-grid row 0 / p_int+1 —
    wherever they fall in a block, including past shard padding) are
    computed locally with set_boundary emulation (ghost increment =
    adjacent interior increment) and kept through the exchange.
    """
    pz2, m, n = du.shape
    G = (jnp.arange(pz2) + z_off)[:, None, None]
    p_e = p_int + 1
    yg = jnp.arange(m)[None, :, None]
    xg = jnp.arange(n)[None, None, :]

    def inc_eff(inc):
        up = jnp.roll(inc, -1, 0)    # inc[r+1]
        dn = jnp.roll(inc, 1, 0)     # inc[r-1]
        return jnp.where(G == 0, up, jnp.where(G >= p_e, dn, inc))

    g2 = None
    for base, inc in ((u, du), (v, dv), (w, dw)):
        tot = base + inc_eff(inc)
        tp = jnp.roll(tot, -1, 0)
        tm = jnp.roll(tot, 1, 0)
        gz = (jnp.where(G >= p_e, tot, tp)
              - jnp.where(G == 0, tot, tm)) * (0.5 / hz)
        tp = jnp.roll(tot, -1, 1)
        tm = jnp.roll(tot, 1, 1)
        gy = (jnp.where(yg == m - 1, tot, tp)
              - jnp.where(yg == 0, tot, tm)) * (0.5 / hy)
        tp = jnp.roll(tot, -1, 2)
        tm = jnp.roll(tot, 1, 2)
        gx = (jnp.where(xg == n - 1, tot, tp)
              - jnp.where(xg == 0, tot, tm)) * (0.5 / hx)
        d2 = gz * gz + gy * gy + gx * gx
        g2 = d2 if g2 is None else g2 + d2
    g2 = jnp.maximum(g2, 0.0)
    psi = a_smooth * (g2 + EPS_SMOOTH) ** (a_smooth - 1.0)

    psi_ex = _exchange_halo(psi, axis_name)
    keep_top = z_off == 0
    keep_bot = (z_off + pz2 - 1) >= p_e
    top = jnp.where(keep_top, psi[0], psi_ex[0])
    bot = jnp.where(keep_bot, psi[-1], psi_ex[-1])
    return psi_ex.at[0].set(top).at[-1].set(bot)


def _local_halfsweep(phase, z_off, p_int, du, dv, dw, u, v, w, SJ,
                     ax, ay, az, psi=None):
    """Masked SOR update of the local block's interior rows (1..pz).

    The global Neumann z-faces are applied by clamping (a ghost z-neighbor
    equals the center), so rows padded past the true interior stay inert.
    ``psi``: optional local ringed diffusivity block (a_smooth != 1); when
    given, per-direction weights are 0.5*(psi_center + psi_neighbor)*a_dir
    (reference core/level_solver_3d.py:262-311).
    """
    (SJ11, SJ22, SJ33, SJ12, SJ13, SJ23, SJ14, SJ24, SJ34) = SJ
    pz2, m, n = du.shape

    I = np.s_[1:-1, 1:-1, 1:-1]

    def nbr(f):
        return dict(xm=f[1:-1, 1:-1, :-2], xp=f[1:-1, 1:-1, 2:],
                    ym=f[1:-1, :-2, 1:-1], yp=f[1:-1, 2:, 1:-1],
                    zm=f[:-2, 1:-1, 1:-1], zp=f[2:, 1:-1, 1:-1])

    zg = (jax.lax.broadcasted_iota(jnp.int32, (pz2 - 2, m - 2, n - 2), 0)
          + 1 + z_off)
    yg = jax.lax.broadcasted_iota(jnp.int32, (pz2 - 2, m - 2, n - 2), 1) + 1
    xg = jax.lax.broadcasted_iota(jnp.int32, (pz2 - 2, m - 2, n - 2), 2) + 1
    mask = (((zg + yg + xg) % 2) == phase) & (zg <= p_int)

    if psi is None:
        sw = None
        sw_sum = 2.0 * (ax + ay + az)
    else:
        psiI = psi[I]
        nbp = nbr(psi)
        sw = dict(xm=0.5 * (psiI + nbp["xm"]) * ax,
                  xp=0.5 * (psiI + nbp["xp"]) * ax,
                  ym=0.5 * (psiI + nbp["ym"]) * ay,
                  yp=0.5 * (psiI + nbp["yp"]) * ay,
                  zm=0.5 * (psiI + nbp["zm"]) * az,
                  zp=0.5 * (psiI + nbp["zp"]) * az)
        sw_sum = (sw["xm"] + sw["xp"] + sw["ym"] + sw["yp"]
                  + sw["zm"] + sw["zp"])
    duI, dvI, dwI = du[I], dv[I], dw[I]
    nu = -(SJ14[I] + SJ12[I] * dvI + SJ13[I] * dwI)
    nv = -(SJ24[I] + SJ12[I] * duI + SJ23[I] * dwI)
    nw = -(SJ34[I] + SJ13[I] * duI + SJ23[I] * dvI)

    def comp(base, inc, nd, dd, old):
        # global Neumann z-ghosts: ghost tot = base_ghost + inc_center
        # (set_boundary copies the increment only; the base field's ring
        # holds caller-provided values)
        tot = base + inc
        nb = nbr(tot)
        nb_base = nbr(base)
        incI = inc[I]
        zm = jnp.where(zg == 1, nb_base["zm"] + incI, nb["zm"])
        zp = jnp.where(zg == p_int, nb_base["zp"] + incI, nb["zp"])
        baseI = base[I]
        if psi is None:
            num = (nd
                   + ax * (nb["xm"] + nb["xp"] - 2 * baseI)
                   + ay * (nb["ym"] + nb["yp"] - 2 * baseI)
                   + az * (zm + zp - 2 * baseI))
        else:
            num = (nd
                   + sw["xm"] * (nb["xm"] - baseI)
                   + sw["xp"] * (nb["xp"] - baseI)
                   + sw["ym"] * (nb["ym"] - baseI)
                   + sw["yp"] * (nb["yp"] - baseI)
                   + sw["zm"] * (zm - baseI)
                   + sw["zp"] * (zp - baseI))
        den = dd[I] + sw_sum
        new = (1.0 - OMEGA) * old + OMEGA * num / den
        return jnp.where(mask, new, old)

    new_du = comp(u, du, nu, SJ11, duI)
    new_dv = comp(v, dv, nv, SJ22, dvI)
    new_dw = comp(w, dw, nw, SJ33, dwI)
    du = _set_boundary_yx(du.at[I].set(new_du))
    dv = _set_boundary_yx(dv.at[I].set(new_dv))
    dw = _set_boundary_yx(dw.at[I].set(new_dw))
    return du, dv, dw


def _sharded_solve_body(Jt_local, weight_local, u_l, v_l, w_l, alpha, a_data,
                        iterations, update_lag, axis_name, pz, h, p_int,
                        a_smooth=1.0):
    """Runs inside shard_map: local blocks carry one ghost row on each side."""
    dtype = u_l.dtype
    _, pz2, m, n, C = Jt_local.shape
    J = [Jt_local[i] for i in range(10)]
    (J11, J22, J33, J44, J12, J13, J23, J14, J24, J34) = J
    a_vec = a_data.reshape(1, 1, 1, C)
    hx, hy, hz = h
    ax = alpha[0] / (hx * hx)
    ay = alpha[1] / (hy * hy)
    az = alpha[2] / (hz * hz)

    # derive from a varying operand so the carry is typed as device-varying
    # over the mesh axis (a plain zeros literal is "unvarying" and breaks
    # the fori_loop carry typing under shard_map)
    du = u_l * 0.0
    dv = u_l * 0.0
    dw = u_l * 0.0
    z_off = jax.lax.axis_index(axis_name) * pz

    def tick(du, dv, dw):
        d_u = du[..., None]
        d_v = dv[..., None]
        d_w = dw[..., None]
        E = (J11 * d_u * d_u + J22 * d_v * d_v + J33 * d_w * d_w
             + 2 * J12 * d_u * d_v + 2 * J13 * d_u * d_w + 2 * J23 * d_v * d_w
             + 2 * J14 * d_u + 2 * J24 * d_v + 2 * J34 * d_w + J44)
        E = jnp.maximum(E, 0.0)
        psi = jnp.where(a_vec != 1.0,
                        a_vec * (E + EPS_PSI) ** (a_vec - 1.0),
                        jnp.ones_like(E))
        S = weight_local * psi
        return tuple(jnp.sum(S * Jxy, -1) for Jxy in
                     (J11, J22, J33, J12, J13, J23, J14, J24, J34))

    def exchange(du, dv, dw):
        return (_exchange_halo(du, axis_name), _exchange_halo(dv, axis_name),
                _exchange_halo(dw, axis_name))

    SJ0 = tick(du, dv, dw)

    a_smooth_is_one = float(a_smooth) == 1.0

    def body(it, state):
        du, dv, dw, SJ = state
        SJ = jax.lax.cond(jnp.mod(it, update_lag) == 0,
                          lambda _: tick(du, dv, dw), lambda s: s, SJ)
        du, dv, dw = exchange(du, dv, dw)
        # psi evaluated before the red half and reused for black, matching
        # core/solver's per-iteration smooth_weights
        psi = (None if a_smooth_is_one else _psi_sharded(
            du, dv, dw, u_l, v_l, w_l, a_smooth, hx, hy, hz, axis_name,
            z_off, p_int))
        du, dv, dw = _local_halfsweep(0, z_off, p_int, du, dv, dw,
                                      u_l, v_l, w_l, SJ, ax, ay, az, psi)
        du, dv, dw = exchange(du, dv, dw)
        du, dv, dw = _local_halfsweep(1, z_off, p_int, du, dv, dw,
                                      u_l, v_l, w_l, SJ, ax, ay, az, psi)
        return du, dv, dw, SJ

    du, dv, dw, _ = jax.lax.fori_loop(0, iterations, body, (du, dv, dw, SJ0))
    du, dv, dw = exchange(du, dv, dw)
    return du, dv, dw


def compute_flow_level_sharded(J_entries, weight, u, v, w, alpha, iterations,
                               update_lag, a_data, hx=1.0, hy=1.0, hz=1.0,
                               mesh=None, axis="z", a_smooth=1.0):
    """Z-sharded level solve (both a_smooth regimes).

    Same contract as core.solver.compute_flow_level: J_entries is the
    10-tuple (p, m, n, C) [J11,J22,J33,J44,J12,J13,J23,J14,J24,J34] on
    boundary-ringed grids, u/v/w (p, m, n). The interior z-rows are split
    over the mesh; each shard keeps 1 ghost row per side, refreshed by
    ppermute before every half-sweep. Returns (du, dv, dw) gathered.
    """
    from jax import shard_map

    mesh = mesh or spatial_mesh()
    n_dev = mesh.devices.size
    dtype = u.dtype
    p, m, n = u.shape
    p_int = p - 2
    pz = -(-p_int // n_dev)
    pad = pz * n_dev - p_int

    def pad_z(f):
        # pad interior so it splits evenly; padded rows are inert (they
        # sit beyond the true interior and their updates are discarded)
        return jnp.pad(f, ((0, pad), (0, 0), (0, 0))
                       + ((0, 0),) * (f.ndim - 3), mode="edge")

    # local blocks with ghosts: shard rows [k*pz, k*pz+pz+2) — build by
    # stacking shifted views so shard_map can split a leading axis evenly
    def blocks(f):
        fp = pad_z(f)
        return jnp.stack([
            jax.lax.dynamic_slice_in_dim(fp, k * pz, pz + 2, axis=0)
            for k in range(n_dev)], axis=0)

    Jt = jnp.stack([jnp.asarray(j, dtype) for j in J_entries])
    Jt_b = jnp.stack([blocks(Jt[i]) for i in range(10)], axis=1)  # (dev,10,..)
    w_b = blocks(weight.astype(dtype))
    u_b = blocks(u)
    v_b = blocks(v)
    w3_b = blocks(w)

    alpha = jnp.asarray(alpha, dtype)
    a_data = jnp.asarray(a_data, dtype)
    h = (float(hx), float(hy), float(hz))

    def unb(x):
        # x: (n_dev, pz+2, m, n) stacked local blocks (with ghosts)
        interior = x[:, 1:-1].reshape(n_dev * pz, m, n)[:p_int]
        return jnp.concatenate([interior[:1], interior, interior[-1:]], 0)

    # the leading stacked-blocks axis is the sharded axis; each shard sees
    # its (1, pz+2, ...) block
    # jit is essential: an un-jitted shard_map executes op-by-op with one
    # dispatch-compile per primitive per device (see spatial_pyramid.py)
    fn = jax.jit(shard_map(
        lambda Jt_l, w_l, u_l, v_l, w3_l, al, ad: tuple(
            x[None] for x in _sharded_solve_body(
                Jt_l[0], w_l[0], u_l[0], v_l[0], w3_l[0], al, ad,
                int(iterations), int(update_lag), axis, pz, h, p_int,
                float(a_smooth))),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(axis), P(axis), P(axis)),
    ))
    du_b, dv_b, dw_b = fn(Jt_b, w_b, u_b, v_b, w3_b, alpha, a_data)
    out = []
    for x in (du_b, dv_b, dw_b):
        full = unb(x)
        full = _set_boundary_yx(full)
        out.append(full)
    return tuple(out)
