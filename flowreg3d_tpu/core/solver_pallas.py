"""Pallas TPU kernel for the red-black SOR half-sweep.

The level solver's hot loop (core/solver.py) is a 6-neighbor stencil over
three coupled fields — bandwidth-bound. The XLA formulation materializes
~20 full-grid intermediates per half-sweep; this kernel fuses one half-sweep
into a single VMEM-resident pass: a 1-D grid over z-slabs, each program DMAs
its slab (+1-row z halo for the stencil fields) from HBM into VMEM scratch,
computes the masked SOR update for du/dv/dw in registers, and writes the
slab back in place (outputs aliased to inputs; safe because a half-sweep
only reads opposite-parity neighbors, which it never writes).

Scope: the ``a_smooth == 1`` path (constant diffusivity — the benchmark and
reference-default configuration). The flow-driven-diffusivity path stays on
the XLA solver. Numerics match core/solver.py's half_sweep exactly
(parity-tested in interpret mode on CPU and compiled on TPU).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OMEGA = 1.95

# fields with z-halo: du, dv, dw, u, v, w
_N_HALO = 6
# slab-only fields: SJ11, SJ22, SJ33, SJ12, SJ13, SJ23, SJ14, SJ24, SJ34
_N_SLAB = 9


def _kernel(red_phase, p_int, m0, n0, params_ref, *refs):
    """One half-sweep over one z-slab. See module docstring."""
    halo_refs = refs[:_N_HALO]
    slab_refs = refs[_N_HALO:_N_HALO + _N_SLAB]
    out_refs = refs[_N_HALO + _N_SLAB:_N_HALO + _N_SLAB + 3]
    vmem_halo, vmem_slab, vmem_out, sem_in, sem_out = refs[-5:]

    i = pl.program_id(0)
    sz = vmem_out.shape[1]
    m = vmem_out.shape[2]
    n = vmem_out.shape[3]
    ax = params_ref[0]
    ay = params_ref[1]
    az = params_ref[2]

    # --- DMA in ------------------------------------------------------------
    in_dmas = []
    for k, ref in enumerate(halo_refs):
        dma = pltpu.make_async_copy(
            ref.at[pl.ds(i * sz, sz + 2)], vmem_halo.at[k], sem_in.at[k])
        dma.start()
        in_dmas.append(dma)
    for k, ref in enumerate(slab_refs):
        dma = pltpu.make_async_copy(
            ref.at[pl.ds(i * sz + 1, sz)], vmem_slab.at[k],
            sem_in.at[_N_HALO + k])
        dma.start()
        in_dmas.append(dma)
    for dma in in_dmas:
        dma.wait()

    du = vmem_halo[0]
    dv = vmem_halo[1]
    dw = vmem_halo[2]
    u = vmem_halo[3]
    v = vmem_halo[4]
    w = vmem_halo[5]
    (SJ11, SJ22, SJ33, SJ12, SJ13, SJ23, SJ14, SJ24, SJ34) = [
        vmem_slab[k] for k in range(_N_SLAB)]

    duC = du[1:sz + 1]
    dvC = dv[1:sz + 1]
    dwC = dw[1:sz + 1]

    # checkerboard on GLOBAL coordinates: padded row g == original row g
    zg = (jax.lax.broadcasted_iota(jnp.int32, (sz, m, n), 0) + i * sz + 1)
    yg = jax.lax.broadcasted_iota(jnp.int32, (sz, m, n), 1)
    xg = jax.lax.broadcasted_iota(jnp.int32, (sz, m, n), 2)
    mask = ((zg + yg + xg) % 2 == red_phase)
    mask = mask & ((zg <= p_int)
                   & (yg >= 1) & (yg <= m0 - 2)
                   & (xg >= 1) & (xg <= n0 - 2))

    sw_sum = 2.0 * (ax + ay + az)

    def shifted_sums(base, inc):
        tot = base + inc
        totC = tot[1:sz + 1]
        # pltpu.roll requires non-negative shifts: shift size-1 == shift -1
        xm = pltpu.roll(totC, 1, 2)   # brings x-1 values to x
        xp = pltpu.roll(totC, n - 1, 2)
        ym = pltpu.roll(totC, 1, 1)
        yp = pltpu.roll(totC, m - 1, 1)
        zm = tot[0:sz]
        zp = tot[2:sz + 2]
        baseC = base[1:sz + 1]
        return (ax * (xm + xp - 2.0 * baseC)
                + ay * (ym + yp - 2.0 * baseC)
                + az * (zm + zp - 2.0 * baseC))

    nu = -(SJ14 + SJ12 * dvC + SJ13 * dwC) + shifted_sums(u, du)
    nv = -(SJ24 + SJ12 * duC + SJ23 * dwC) + shifted_sums(v, dv)
    nw = -(SJ34 + SJ13 * duC + SJ23 * dvC) + shifted_sums(w, dw)

    new_du = (1.0 - OMEGA) * duC + OMEGA * nu / (SJ11 + sw_sum)
    new_dv = (1.0 - OMEGA) * dvC + OMEGA * nv / (SJ22 + sw_sum)
    new_dw = (1.0 - OMEGA) * dwC + OMEGA * nw / (SJ33 + sw_sum)

    vmem_out[0] = jnp.where(mask, new_du, duC)
    vmem_out[1] = jnp.where(mask, new_dv, dvC)
    vmem_out[2] = jnp.where(mask, new_dw, dwC)

    # --- DMA out -----------------------------------------------------------
    out_dmas = []
    for k in range(3):
        dma = pltpu.make_async_copy(
            vmem_out.at[k], out_refs[k].at[pl.ds(i * sz + 1, sz)],
            sem_out.at[k])
        dma.start()
        out_dmas.append(dma)
    for dma in out_dmas:
        dma.wait()


def _pick_slab(p_int, m, n, budget_bytes=10 * 2 ** 20):
    per_slice = m * n * 4
    sz = max(1, int(budget_bytes // (24 * per_slice)))
    return min(sz, p_int)


def _sweep_kernel(n_iters, p_int, m0, n0, params_ref, duvw_ref, base_ref,
                  sj_ref, out_ref, vmem_duvw, vmem_base, vmem_sj, vmem_out,
                  sem_in, sem_out):
    """Fused sweep: grid (n_iters, 2 phases, n_slabs), updates in place.

    Inputs are STACKED on a leading axis (duvw (3,P,m,n), base u/v/w
    (3,P,m,n), SJ (9,P,m,n)) so each program issues 3 input DMAs + 1 output
    DMA instead of 18 — the per-iteration cost is DMA-setup-bound at these
    slab sizes. Neumann boundaries are applied by clamping (ghost tot =
    base_ghost + inc_center), so no boundary pass runs between half-sweeps.
    """
    phase = pl.program_id(1)
    i = pl.program_id(2)
    sz = vmem_out.shape[1]
    m = vmem_out.shape[2]
    n = vmem_out.shape[3]
    ax = params_ref[0]
    ay = params_ref[1]
    az = params_ref[2]

    d1 = pltpu.make_async_copy(
        duvw_ref.at[:, pl.ds(i * sz, sz + 2)], vmem_duvw, sem_in.at[0])
    d2 = pltpu.make_async_copy(
        base_ref.at[:, pl.ds(i * sz, sz + 2)], vmem_base, sem_in.at[1])
    d3 = pltpu.make_async_copy(
        sj_ref.at[:, pl.ds(i * sz + 1, sz)], vmem_sj, sem_in.at[2])
    d1.start()
    d2.start()
    d3.start()
    d1.wait()
    d2.wait()
    d3.wait()

    du = vmem_duvw[0]
    dv = vmem_duvw[1]
    dw = vmem_duvw[2]
    u = vmem_base[0]
    v = vmem_base[1]
    w = vmem_base[2]
    (SJ11, SJ22, SJ33, SJ12, SJ13, SJ23, SJ14, SJ24, SJ34) = [
        vmem_sj[k] for k in range(_N_SLAB)]

    duC = du[1:sz + 1]
    dvC = dv[1:sz + 1]
    dwC = dw[1:sz + 1]

    zg = (jax.lax.broadcasted_iota(jnp.int32, (sz, m, n), 0) + i * sz + 1)
    yg = jax.lax.broadcasted_iota(jnp.int32, (sz, m, n), 1)
    xg = jax.lax.broadcasted_iota(jnp.int32, (sz, m, n), 2)
    mask = ((zg + yg + xg) % 2 == phase)
    mask = mask & ((zg <= p_int)
                   & (yg >= 1) & (yg <= m0 - 2)
                   & (xg >= 1) & (xg <= n0 - 2))

    sw_sum = 2.0 * (ax + ay + az)

    def shifted_sums(base, inc):
        # Neumann ghosts carry the increment's center value but the BASE
        # field's own ring values (set_boundary copies du only; u's ring is
        # whatever the caller provided): ghost tot = base_ghost + inc_center
        tot = base + inc
        totC = tot[1:sz + 1]
        baseC = base[1:sz + 1]
        incC = inc[1:sz + 1]
        xm = jnp.where(xg == 1, pltpu.roll(baseC, 1, 2) + incC,
                       pltpu.roll(totC, 1, 2))
        xp = jnp.where(xg == n0 - 2, pltpu.roll(baseC, n - 1, 2) + incC,
                       pltpu.roll(totC, n - 1, 2))
        ym = jnp.where(yg == 1, pltpu.roll(baseC, 1, 1) + incC,
                       pltpu.roll(totC, 1, 1))
        yp = jnp.where(yg == m0 - 2, pltpu.roll(baseC, m - 1, 1) + incC,
                       pltpu.roll(totC, m - 1, 1))
        zm = jnp.where(zg == 1, base[0:sz] + incC, tot[0:sz])
        zp = jnp.where(zg == p_int, base[2:sz + 2] + incC, tot[2:sz + 2])
        return (ax * (xm + xp - 2.0 * baseC)
                + ay * (ym + yp - 2.0 * baseC)
                + az * (zm + zp - 2.0 * baseC))

    nu = -(SJ14 + SJ12 * dvC + SJ13 * dwC) + shifted_sums(u, du)
    nv = -(SJ24 + SJ12 * duC + SJ23 * dwC) + shifted_sums(v, dv)
    nw = -(SJ34 + SJ13 * duC + SJ23 * dvC) + shifted_sums(w, dw)

    new_du = (1.0 - OMEGA) * duC + OMEGA * nu / (SJ11 + sw_sum)
    new_dv = (1.0 - OMEGA) * dvC + OMEGA * nv / (SJ22 + sw_sum)
    new_dw = (1.0 - OMEGA) * dwC + OMEGA * nw / (SJ33 + sw_sum)

    vmem_out[0] = jnp.where(mask, new_du, duC)
    vmem_out[1] = jnp.where(mask, new_dv, dvC)
    vmem_out[2] = jnp.where(mask, new_dw, dwC)

    out_dma = pltpu.make_async_copy(
        vmem_out, out_ref.at[:, pl.ds(i * sz + 1, sz)], sem_out.at[0])
    out_dma.start()
    out_dma.wait()


def sweep_iterations_pallas(du, dv, dw, u, v, w, SJ, params, n_iters,
                            interpret=False):
    """``n_iters`` full red-black iterations in ONE pallas_call.

    Ghost-cell (Neumann) handling is done in-kernel by clamping, so du/dv/dw
    boundary rows are NOT updated here — callers that need the ring must
    apply set_boundary afterwards (the pyramid's median/accumulate steps only
    use the interior).
    """
    if interpret:
        # the interpreter does not expose aliased writes across grid
        # programs, so emulate the fused grid with per-phase calls (same
        # numerics, validated against the XLA path)
        from flowreg3d_tpu.core.solver import set_boundary_3d

        for _ in range(n_iters):
            du = set_boundary_3d(du)
            dv = set_boundary_3d(dv)
            dw = set_boundary_3d(dw)
            du, dv, dw = halfsweep_pallas(du, dv, dw, u, v, w, SJ, params, 0,
                                          interpret=True)
            du = set_boundary_3d(du)
            dv = set_boundary_3d(dv)
            dw = set_boundary_3d(dw)
            du, dv, dw = halfsweep_pallas(du, dv, dw, u, v, w, SJ, params, 1,
                                          interpret=True)
        return du, dv, dw

    p, m0, n0 = du.shape
    p_int = p - 2
    m = -(-m0 // 8) * 8
    n = -(-n0 // 128) * 128
    sz = _pick_slab(p_int, m, n)
    n_slabs = -(-p_int // sz)
    p_pad = n_slabs * sz + 2
    padz = p_pad - p

    def padf(f):
        return jnp.pad(f, ((0, 0), (0, padz), (0, m - m0), (0, n - n0)))

    # stacked operands: 3 input DMAs + 1 output DMA per grid program
    duvw = padf(jnp.stack([du, dv, dw]))
    base = padf(jnp.stack([u, v, w]))
    sj = padf(jnp.stack(list(SJ)))

    kern = functools.partial(_sweep_kernel, n_iters, p_int, m0, n0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_iters, 2, n_slabs),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((3, sz + 2, m, n), du.dtype),
            pltpu.VMEM((3, sz + 2, m, n), du.dtype),
            pltpu.VMEM((_N_SLAB, sz, m, n), du.dtype),
            pltpu.VMEM((3, sz, m, n), du.dtype),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, p_pad, m, n), du.dtype),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(jnp.asarray(params, du.dtype), duvw, base, sj)
    return tuple(out[k, :p, :m0, :n0] for k in range(3))


def halfsweep_pallas(du, dv, dw, u, v, w, SJ, params, red_phase,
                     interpret=False):
    """One red (red_phase=0) or black (1) half-sweep, a_smooth == 1.

    du/dv/dw/u/v/w: (p, m, n); SJ: 9-tuple of (p, m, n) channel-reduced
    data-term fields; params: (3,) [ax, ay, az]. Returns updated
    (du, dv, dw); boundary ring rows/cols are passed through unchanged.
    """
    p, m0, n0 = du.shape
    p_int = p - 2
    # Mosaic DMA slices must be (8, 128)-aligned on the minor two dims
    m = -(-m0 // 8) * 8
    n = -(-n0 // 128) * 128
    sz = _pick_slab(p_int, m, n)
    n_slabs = -(-p_int // sz)
    p_pad = n_slabs * sz + 2
    padz = p_pad - p

    def padf(f):
        return jnp.pad(f, ((0, padz), (0, m - m0), (0, n - n0)))

    halo_in = [padf(f) for f in (du, dv, dw, u, v, w)]
    slab_in = [padf(f) for f in SJ]

    kern = functools.partial(_kernel, red_phase, p_int, m0, n0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_slabs,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * (_N_HALO + _N_SLAB),
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        scratch_shapes=[
            pltpu.VMEM((_N_HALO, sz + 2, m, n), du.dtype),
            pltpu.VMEM((_N_SLAB, sz, m, n), du.dtype),
            pltpu.VMEM((3, sz, m, n), du.dtype),
            pltpu.SemaphoreType.DMA((_N_HALO + _N_SLAB,)),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((p_pad, m, n), du.dtype)] * 3,
        input_output_aliases={1: 0, 2: 1, 3: 2},  # +1 for scalar prefetch
        interpret=interpret,
    )(jnp.asarray(params, du.dtype), *halo_in, *slab_in)
    return tuple(f[:p, :m0, :n0] for f in out)
