"""Nonlinear red-black SOR level solver for the 3D Euler-Lagrange system.

Solves, per pyramid level, for the flow increment (du,dv,dw) of the
variational motion model: data term with lagged-nonlinearity psi_data updates
every ``update_lag`` iterations, flow-driven smoothness diffusivity psi_smooth
``a*(|grad(u+du)|^2+eps)^(a-1)`` every iteration, SOR relaxation omega=1.95,
Neumann (copy) boundaries.

Behavioral parity targets: the reference's numba lexicographic Gauss-Seidel
(reference core/level_solver_3d.py:314-546) and its vectorized red-black
formulation (reference core/torch/level_solver_3d.py:33-341). We use the
red-black scheme — two data-parallel half-sweeps over checkerboard masks —
because it is the formulation that vectorizes on TPU; it converges to the
same fixed point as the lexicographic sweep but differs per-iteration (the
same caveat the reference documents for its own GPU path, README.md:15).

TPU-first design choices:
- Single ``lax.fori_loop`` over iterations; the psi_data/update-lag tick is a
  ``lax.cond`` so the loop body is traced once per level shape.
- Channel reductions are hoisted into the tick: since the data-term sums are
  linear in the J entries, we precompute ``SJxy = sum_c W_c*psi_c*Jxy_c`` once
  per tick and the per-iteration sweeps touch only 9 channel-free volumes.
- Everything is elementwise + static shifts -> XLA fuses each half-sweep into
  a few HBM passes. A Pallas VMEM-resident variant is the planned upgrade.
"""

from functools import partial

import jax
import jax.numpy as jnp

OMEGA = 1.95
EPS_PSI = 1e-6
EPS_SMOOTH = 1e-5


def set_boundary_3d(f):
    """Neumann copy boundaries (reference core/level_solver_3d.py:246-259)."""
    f = f.at[:, 0, :].set(f[:, 1, :])
    f = f.at[:, -1, :].set(f[:, -2, :])
    f = f.at[:, :, 0].set(f[:, :, 1])
    f = f.at[:, :, -1].set(f[:, :, -2])
    f = f.at[0, :, :].set(f[1, :, :])
    f = f.at[-1, :, :].set(f[-2, :, :])
    return f


def _psi_smooth_field(u, du, v, dv, w, dw, a, hx, hy, hz):
    """Flow-driven diffusivity a*(|grad(u+du,v+dv,w+dw)|^2+eps)^(a-1).

    Gradients use clamped-index central differences over the full grid
    (parity: reference core/level_solver_3d.py:262-311).
    """
    def cgrad(f, axis, h):
        fp = jnp.concatenate(
            [f.take(jnp.arange(1, f.shape[axis]), axis=axis),
             f.take(jnp.array([f.shape[axis] - 1]), axis=axis)], axis=axis)
        fm = jnp.concatenate(
            [f.take(jnp.array([0]), axis=axis),
             f.take(jnp.arange(0, f.shape[axis] - 1), axis=axis)], axis=axis)
        return (fp - fm) / (2.0 * h)

    g = jnp.zeros_like(u)
    for comp, dcomp in ((u, du), (v, dv), (w, dw)):
        cc = comp + dcomp
        for axis, h in ((0, hz), (1, hy), (2, hx)):
            d = cgrad(cc, axis, h)
            g = g + d * d
    g = jnp.maximum(g, 0.0)
    return a * (g + EPS_SMOOTH) ** (a - 1.0)


def _checkerboard_masks(p, m, n, dtype):
    kk = jax.lax.broadcasted_iota(jnp.int32, (p - 2, m - 2, n - 2), 0) + 1
    jj = jax.lax.broadcasted_iota(jnp.int32, (p - 2, m - 2, n - 2), 1) + 1
    ii = jax.lax.broadcasted_iota(jnp.int32, (p - 2, m - 2, n - 2), 2) + 1
    red = ((kk + jj + ii) % 2) == 0
    return red, ~red


def _interior(f):
    return f[1:-1, 1:-1, 1:-1]


def _nbr(f):
    """Six neighbor views of the interior of a full-grid array."""
    return dict(
        xm=f[1:-1, 1:-1, :-2], xp=f[1:-1, 1:-1, 2:],
        ym=f[1:-1, :-2, 1:-1], yp=f[1:-1, 2:, 1:-1],
        zm=f[:-2, 1:-1, 1:-1], zp=f[2:, 1:-1, 1:-1],
    )


@partial(jax.jit, static_argnames=("iterations", "update_lag",
                                   "a_smooth_is_one", "use_pallas"))
def _solve(Jc, weight, u, v, w, alpha, a_data, a_smooth, hx, hy, hz,
           iterations, update_lag, a_smooth_is_one, use_pallas=False):
    """Jc: (10,C,p,m,n) stacked [J11,J22,J33,J44,J12,J13,J23,J14,J24,J34].

    Channel-LEADING layout for every (C,…) array, including the jit-boundary
    inputs: with C trailing, TPU XLA tiles the minor dims (n, C) as T(8,128)
    and pads C=1 -> 128 lanes — measured 129x HBM expansion (66.5 MB ->
    8.4 GB per temp) at a (66,514,514,1) level, OOMing the XLA fallback at
    full resolution. Leading C keeps the minor dims (m, n), which tile
    densely. Callers convert via compute_flow_level (public trailing-C
    contract) or pass channel-leading directly (compute_flow_level_cl).
    """
    dtype = u.dtype
    _, C, p, m, n = Jc.shape
    J11, J22, J33, J44, J12, J13, J23, J14, J24, J34 = [
        Jc[i] for i in range(10)]
    weight = weight.reshape(C, p, m, n)

    # derive from the operands (not a zeros literal) so the loop carry is
    # typed as device-varying when any solver input varies under shard_map
    zero_seed = (u + Jc[0, 0]) * jnp.zeros((), dtype)
    du = zero_seed
    dv = zero_seed
    dw = zero_seed

    ax = alpha[0] / (hx * hx)
    ay = alpha[1] / (hy * hy)
    az = alpha[2] / (hz * hz)

    red_mask, black_mask = _checkerboard_masks(p, m, n, dtype)

    a_vec = a_data.reshape(C, 1, 1, 1)

    def tick_update(du, dv, dw):
        du4 = du[None]
        dv4 = dv[None]
        dw4 = dw[None]
        E = (J11 * du4 * du4 + J22 * dv4 * dv4 + J33 * dw4 * dw4
             + 2.0 * J12 * du4 * dv4 + 2.0 * J13 * du4 * dw4
             + 2.0 * J23 * dv4 * dw4
             + 2.0 * J14 * du4 + 2.0 * J24 * dv4 + 2.0 * J34 * dw4 + J44)
        E = jnp.maximum(E, 0.0)
        psi = jnp.where(a_vec != 1.0,
                        a_vec * (E + EPS_PSI) ** (a_vec - 1.0),
                        jnp.ones_like(E))
        S = weight * psi
        return (
            jnp.sum(S * J11, 0), jnp.sum(S * J22, 0), jnp.sum(S * J33, 0),
            jnp.sum(S * J12, 0), jnp.sum(S * J13, 0), jnp.sum(S * J23, 0),
            jnp.sum(S * J14, 0), jnp.sum(S * J24, 0), jnp.sum(S * J34, 0),
        )

    def smooth_weights(du, dv, dw):
        if a_smooth_is_one:
            shape = (p - 2, m - 2, n - 2)
            return {k: jnp.full(shape, val, dtype) for k, val in (
                ("xm", ax), ("xp", ax), ("ym", ay), ("yp", ay),
                ("zm", az), ("zp", az))}
        psi = _psi_smooth_field(u, du, v, dv, w, dw, a_smooth, hx, hy, hz)
        psiC = _interior(psi)
        nb = _nbr(psi)
        return dict(
            xm=0.5 * (psiC + nb["xm"]) * ax, xp=0.5 * (psiC + nb["xp"]) * ax,
            ym=0.5 * (psiC + nb["ym"]) * ay, yp=0.5 * (psiC + nb["yp"]) * ay,
            zm=0.5 * (psiC + nb["zm"]) * az, zp=0.5 * (psiC + nb["zp"]) * az,
        )

    def half_sweep(mask, du, dv, dw, SJ, sw):
        (SJ11, SJ22, SJ33, SJ12, SJ13, SJ23, SJ14, SJ24, SJ34) = SJ
        duI = _interior(du)
        dvI = _interior(dv)
        dwI = _interior(dw)

        nu_data = -(_interior(SJ14) + _interior(SJ12) * dvI
                    + _interior(SJ13) * dwI)
        nv_data = -(_interior(SJ24) + _interior(SJ12) * duI
                    + _interior(SJ23) * dwI)
        nw_data = -(_interior(SJ34) + _interior(SJ13) * duI
                    + _interior(SJ23) * dvI)

        sw_sum = sw["xm"] + sw["xp"] + sw["ym"] + sw["yp"] + sw["zm"] + sw["zp"]

        def sweep_component(base, inc, num_data, den_data, old):
            # per-direction term: w * (base_nbr + inc_nbr - base_ctr); the
            # center unknown inc_ctr appears only on the LHS (in the denom).
            tot = base + inc
            nb = _nbr(tot)
            baseI = _interior(base)
            num = (num_data
                   + sw["xm"] * (nb["xm"] - baseI)
                   + sw["xp"] * (nb["xp"] - baseI)
                   + sw["ym"] * (nb["ym"] - baseI)
                   + sw["yp"] * (nb["yp"] - baseI)
                   + sw["zm"] * (nb["zm"] - baseI)
                   + sw["zp"] * (nb["zp"] - baseI))
            den = den_data + sw_sum
            frac = jnp.where(den != 0, num / den, jnp.zeros_like(den))
            new = (1.0 - OMEGA) * old + OMEGA * frac
            return jnp.where(mask, new, old)

        new_du = sweep_component(u, du, nu_data, _interior(SJ11), duI)
        new_dv = sweep_component(v, dv, nv_data, _interior(SJ22), dvI)
        new_dw = sweep_component(w, dw, nw_data, _interior(SJ33), dwI)

        du = set_boundary_3d(du.at[1:-1, 1:-1, 1:-1].set(new_du))
        dv = set_boundary_3d(dv.at[1:-1, 1:-1, 1:-1].set(new_dv))
        dw = set_boundary_3d(dw.at[1:-1, 1:-1, 1:-1].set(new_dw))
        return du, dv, dw

    SJ0 = tick_update(du, dv, dw)

    if use_pallas and pallas_kernel_on("SOLVER") and not a_smooth_is_one:
        # Fused flow-driven-diffusivity kernel: one pallas_call runs
        # update_lag full psi->red->black iterations (psi computed
        # in-kernel from the pre-red increments, the exact reference
        # scheme); the psi_data tick stays in XLA between blocks.
        from flowreg3d_tpu.core.solver_pallas import (
            sweep_iterations_pallas_psi)

        params = jnp.stack([
            ax, ay, az, a_smooth,
            0.5 / hx, 0.5 / hy, 0.5 / hz]).astype(dtype)
        n_full, rem = divmod(int(iterations), int(update_lag))

        def block(state, _, k_iters):
            du, dv, dw = state
            SJ = tick_update(du, dv, dw)
            du, dv, dw = kernel_barrier(*sweep_iterations_pallas_psi(
                du, dv, dw, u, v, w, SJ, params, int(k_iters)))
            return (du, dv, dw), None

        state = (du, dv, dw)
        if n_full:
            state, _ = jax.lax.scan(
                partial(block, k_iters=update_lag), state, None,
                length=n_full)
        if rem:
            state, _ = block(state, None, rem)
        du, dv, dw = state
        return (set_boundary_3d(du), set_boundary_3d(dv),
                set_boundary_3d(dw))

    if use_pallas and pallas_kernel_on("SOLVER") and a_smooth_is_one:
        # Fused kernel path: one pallas_call per psi_data tick block runs
        # update_lag full red-black iterations in-place (Neumann ghosts
        # clamped in-kernel, so no boundary passes between sweeps). The
        # blocks between ticks are identical -> lax.scan compiles one.
        from flowreg3d_tpu.core.solver_pallas import sweep_iterations_pallas

        params = jnp.stack([ax, ay, az]).astype(dtype)
        n_full, rem = divmod(int(iterations), int(update_lag))

        def block(state, _, k_iters):
            du, dv, dw = state
            SJ = tick_update(du, dv, dw)
            du, dv, dw = kernel_barrier(*sweep_iterations_pallas(
                du, dv, dw, u, v, w, SJ, params, int(k_iters)))
            return (du, dv, dw), None

        state = (du, dv, dw)
        if n_full:
            state, _ = jax.lax.scan(
                partial(block, k_iters=update_lag), state, None,
                length=n_full)
        if rem:
            state, _ = block(state, None, rem)
        du, dv, dw = state
        return (set_boundary_3d(du), set_boundary_3d(dv),
                set_boundary_3d(dw))

    else:
        def body(it, state):
            du, dv, dw, SJ = state
            SJ = jax.lax.cond(
                jnp.mod(it, update_lag) == 0,
                lambda _: tick_update(du, dv, dw),
                lambda sj: sj,
                SJ,
            )
            du = set_boundary_3d(du)
            dv = set_boundary_3d(dv)
            dw = set_boundary_3d(dw)
            sw = smooth_weights(du, dv, dw)
            du, dv, dw = half_sweep(red_mask, du, dv, dw, SJ, sw)
            du, dv, dw = half_sweep(black_mask, du, dv, dw, SJ, sw)
            return du, dv, dw, SJ

    du, dv, dw, _ = jax.lax.fori_loop(0, iterations, body, (du, dv, dw, SJ0))
    return du, dv, dw


def pallas_kernel_on(name):
    """Per-kernel Pallas opt-out: FLOWREG3D_PALLAS_{SOLVER|WARP|MEDIAN}=0
    routes just that op to its XLA path (trace-time; used to bisect and
    work around the min_level=0 fusion-pass compiler crash)."""
    import os

    return os.environ.get(f"FLOWREG3D_PALLAS_{name}", "1") not in (
        "0", "false", "False")


def kernel_barrier(*arrays):
    """Optionally fence Pallas kernel outputs from XLA fusion.

    FLOWREG3D_KERNEL_BARRIER=1 wraps each Pallas custom call's outputs in
    ``jax.lax.optimization_barrier`` — the workaround knob for the XLA TPU
    fusion-pass SIGABRT (absl raw_hash_map::at inside
    AllowedFusionsWithCustomCallAsProducer) triggered by the min_level=0
    full-resolution pyramid. Read at trace time; default off.
    """
    import os

    if os.environ.get("FLOWREG3D_KERNEL_BARRIER") == "1":
        out = jax.lax.optimization_barrier(arrays)
        return out if len(arrays) > 1 else out[0]
    return arrays if len(arrays) > 1 else arrays[0]


def pallas_enabled():
    """Pallas half-sweeps run on real TPUs; XLA everywhere else.

    Override with FLOWREG3D_PALLAS=0/1."""
    import os

    env = os.environ.get("FLOWREG3D_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False


def compute_flow_level(J_entries, weight, u, v, w, alpha, iterations,
                       update_lag, a_data, a_smooth, hx, hy, hz,
                       use_pallas=None):
    """Solve one level; inputs follow the reference solver's conventions.

    J_entries: tuple of 10 arrays (p,m,n,C) in the order
    [J11,J22,J33,J44,J12,J13,J23,J14,J24,J34]; weight (p,m,n,C);
    u,v,w (p,m,n) accumulated flow (with one-voxel boundary ring);
    alpha 3-sequence; a_data (C,). Returns (du, dv, dw).

    The trailing-C operands are converted to channel-leading OUTSIDE the
    jit boundary (see _solve's docstring for the TPU layout rationale);
    in-jit callers that already hold per-channel (p,m,n) entries should
    use ``compute_flow_level_cl`` and skip the transposes entirely.
    """
    dtype = u.dtype
    Jc = [jnp.moveaxis(jnp.asarray(j, dtype), -1, 0) for j in J_entries]
    wc = jnp.moveaxis(jnp.asarray(weight, dtype), -1, 0)
    return compute_flow_level_cl(Jc, wc, u, v, w, alpha, iterations,
                                 update_lag, a_data, a_smooth, hx, hy, hz,
                                 use_pallas=use_pallas)


def compute_flow_level_cl(J_entries, weight, u, v, w, alpha, iterations,
                          update_lag, a_data, a_smooth, hx, hy, hz,
                          use_pallas=None):
    """Channel-leading variant: J_entries are 10 arrays (C,p,m,n), weight
    (C,p,m,n) — the TPU-native layout (no degenerate minor dims; see
    _solve). Semantics identical to ``compute_flow_level``."""
    dtype = u.dtype
    Jt = jnp.stack(J_entries).astype(dtype)
    a_data = jnp.asarray(a_data, dtype)
    alpha = jnp.asarray(alpha, dtype)
    a_smooth_is_one = float(a_smooth) == 1.0
    if use_pallas is None:
        # planes past the whole-plane VMEM budget route to the y-tiled
        # fused kernels inside solver_pallas, so every level shape runs
        # Pallas when a TPU is present
        use_pallas = pallas_enabled()
    return _solve(Jt, weight.astype(dtype), u, v, w, alpha, a_data,
                  jnp.asarray(a_smooth, dtype),
                  jnp.asarray(hx, dtype), jnp.asarray(hy, dtype),
                  jnp.asarray(hz, dtype),
                  int(iterations), int(update_lag), a_smooth_is_one,
                  bool(use_pallas))
