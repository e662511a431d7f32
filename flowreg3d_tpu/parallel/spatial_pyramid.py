"""Z-sharded full pyramid: ``get_displacement`` for volumes beyond one chip.

Round-1 sharded only the level solver (parallel/spatial.py); this module
shards the ENTIRE coarse-to-fine pyramid over a 1-D device mesh along Z so
a volume exceeding one chip's HBM runs end-to-end. Design:

- **Fine levels** (level z-extent >= 4*n_dev) are sharded: stencil stages
  (motion tensor, 5^3 median) run redundantly on halo-extended slabs and
  crop — exact because the halo exceeds the stencil radius, and global
  z-faces keep the ops' own boundary handling; the SOR solver is the
  existing halo-exchange sharded solver; resizes and the cubic-warp
  prefilter contract Z with **ring matmuls** (each step multiplies the
  resident shard by the matching static matrix block, then rotates the
  shard via ``ppermute``) — exact at any scale, memory O(local).
- **Coarse levels** (tiny) run replicated on every device — their memory
  is negligible and it avoids empty shards.
- The level warp samples Z within a +-``halo_w`` window of each output
  plane; flows exceeding it are flagged in the returned ``valid`` scalar
  (the only approximation-bounded stage; microscopy z-drifts are a few
  planes).

Both a_smooth regimes are supported (flow-driven diffusivity adds one psi
halo exchange per solver iteration — parallel/spatial._psi_sharded), and
weights may be spatially varying. Parity: numerics match core/pyramid.py's
``get_displacement`` to f32 reduction order (tested rtol ~1e-4 on the
virtual CPU mesh).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from flowreg3d_tpu.core.motion_tensor import MOTION_TENSORS
from flowreg3d_tpu.core.pyramid import add_boundary, level_schedule
from flowreg3d_tpu.core.solver import compute_flow_level
from flowreg3d_tpu.ops.filters import median_filter_5x5x5
from flowreg3d_tpu.ops.resize import _axis_sigmas, _resize_matrix_np
from flowreg3d_tpu.ops.warp import _bspline_prefilter_mat_np
from flowreg3d_tpu.parallel.spatial import spatial_mesh

_DEF_HALO = 4     # redundant-stencil halo (max stencil radius is 4)
_DEF_HALO_W = 6   # warp z-sampling halo (max |w|/hz the warp can express)


def _sym_pad_rows(M, rows_needed):
    """Extend a (out, in) matrix so padded output rows reproduce np.pad
    'symmetric' of the true output (row z_out + j == row z_out - 1 - j)."""
    out_len = M.shape[0]
    extra = rows_needed - out_len
    if extra <= 0:
        return M[:rows_needed]
    refl = [M[out_len - 1 - (j % out_len)] for j in range(extra)]
    return np.concatenate([M, np.stack(refl)], axis=0)


def _halo_exchange(f, axis_name, H, mode, z_total):
    """Extend a local (pz, ...) slab with H neighbor planes per side.

    After the ppermute exchange, every extended row whose GLOBAL index
    falls outside [0, z_total) — global face halos AND shard-padding rows
    beyond the true extent — is replaced by the requested numpy pad
    semantics via a local mirror gather ('symmetric': ghost_1 = row 0;
    'reflect': ghost_1 = row 1; 'edge'). The mirrored source always lies
    inside the extended slab because overhang <= H + padding < pz + H.
    """
    idx = jax.lax.axis_index(axis_name)
    size = jax.lax.axis_size(axis_name)
    pz = f.shape[0]
    down = [(i, (i + 1) % size) for i in range(size)]
    up = [(i, (i - 1) % size) for i in range(size)]

    from_above = jax.lax.ppermute(f[-H:], axis_name, down)
    from_below = jax.lax.ppermute(f[:H], axis_name, up)
    ext = jnp.concatenate([from_above, f, from_below], axis=0)

    g = (jnp.arange(pz + 2 * H) - H) + idx * pz   # global row per ext row
    if mode == "symmetric":
        src = jnp.where(g < 0, -1 - g,
                        jnp.where(g >= z_total, 2 * z_total - 1 - g, g))
    elif mode == "reflect":
        src = jnp.where(g < 0, -g,
                        jnp.where(g >= z_total, 2 * z_total - 2 - g, g))
    else:  # edge
        src = jnp.clip(g, 0, z_total - 1)
    src_local = jnp.clip(src - idx * pz + H, 0, pz + 2 * H - 1)
    return jnp.take(ext, src_local, axis=0)


def _ring_matmul_z(x_local, M, axis_name, rows_per_dev, out_rows_per_dev,
                   out_stride=None):
    """Sharded z-contraction: out_local = M[own rows, :] @ x (x z-sharded).

    ``M``: static (out_total, in_total) numpy matrix, in_total =
    n_dev * rows_per_dev. Each device produces ``out_rows_per_dev`` rows
    starting at ``idx * out_stride`` (stride defaults to the row count;
    overlapping windows pass a smaller stride). One ppermute per ring
    step; peak memory = one shard + the local output.
    """
    size = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    if out_stride is None:
        out_stride = out_rows_per_dev
    Mj = jnp.asarray(M, x_local.dtype)
    my_rows = jax.lax.dynamic_slice_in_dim(
        Mj, idx * out_stride, out_rows_per_dev, axis=0)

    perm = [(i, (i - 1) % size) for i in range(size)]  # pull from below

    def partial_prod(s, x_cur):
        src = jnp.mod(idx + s, size)
        Mblk = jax.lax.dynamic_slice_in_dim(
            my_rows, src * rows_per_dev, rows_per_dev, axis=1)
        return jnp.tensordot(Mblk, x_cur, axes=([1], [0]))

    def step(s, carry):
        x_cur, acc = carry
        acc = acc + partial_prod(s, x_cur)
        x_cur = jax.lax.ppermute(x_cur, axis_name, perm)
        return x_cur, acc

    # step 0 unrolled: seeds the carry from varying operands (a zeros
    # literal is "unvarying" over the mesh axis and breaks the fori carry
    # typing under shard_map)
    acc0 = partial_prod(0, x_local)
    x1 = jax.lax.ppermute(x_local, axis_name, perm)
    _, out = jax.lax.fori_loop(1, size, step, (x1, acc0))
    return out


def _replicated_from_sharded(x_local, M, axis_name, rows_per_dev):
    """out (full) = M @ x (x z-sharded): partial contraction + psum."""
    idx = jax.lax.axis_index(axis_name)
    Mj = jnp.asarray(M, x_local.dtype)
    Mblk = jax.lax.dynamic_slice_in_dim(
        Mj, idx * rows_per_dev, rows_per_dev, axis=1)
    part = jnp.tensordot(Mblk, x_local, axes=([1], [0]))
    return jax.lax.psum(part, axis_name)


def _resize_mats(in_shape, out_shape):
    """(Mz, My, Mx) dense fused-Gauss-cubic matrices (pyramid sigma rule)."""
    sz, sy, sx = _axis_sigmas(in_shape, out_shape, 0.6, False)
    return (_resize_matrix_np(in_shape[0], out_shape[0], float(sz)),
            _resize_matrix_np(in_shape[1], out_shape[1], float(sy)),
            _resize_matrix_np(in_shape[2], out_shape[2], float(sx)))


def _apply_yx(x, My, Mx):
    hp = jax.lax.Precision.HIGHEST
    My = jnp.asarray(My, x.dtype)
    Mx = jnp.asarray(Mx, x.dtype)
    x = jnp.einsum("zyx...,hy->zhx...", x, My, precision=hp)
    return jnp.einsum("zyx...,wx->zyw...", x, Mx, precision=hp)


def _warp_local(f2c_ext, f1_local, u, v, w, z_start, Hw, size_l, hz, hy, hx):
    """Tricubic warp of local output rows from halo-extended coefficients.

    ``f2c_ext``: prefiltered B-spline coefficients, ext z-rows
    [z_start - Hw, z_start + pz + Hw + 3) of the level volume, full Y/X.
    Returns (warped (pz, Y, X), valid scalar).
    """
    from flowreg3d_tpu.ops.warp import (_row_gather_interp, _stacked_taps,
                                        _w4)

    Zl, Yl, Xl = size_l
    pz = f1_local.shape[0]
    gz = (jnp.arange(pz, dtype=u.dtype) + z_start)[:, None, None]
    gy = jnp.arange(Yl, dtype=u.dtype)[None, :, None]
    gx = jnp.arange(Xl, dtype=u.dtype)[None, None, :]
    mx = gx + u / hx
    my = gy + v / hy
    mz = gz + w / hz
    oob = ((mx < 0) | (mx >= Xl) | (my < 0) | (my >= Yl)
           | (mz < 0) | (mz >= Zl))
    cx = jnp.where(oob, gx + 0 * mx, jnp.clip(mx, 0, Xl - 1))
    cy = jnp.where(oob, gy + 0 * my, jnp.clip(my, 0, Yl - 1))
    cz = jnp.where(oob, gz + 0 * mz, jnp.clip(mz, 0, Zl - 1))

    z0 = jnp.floor(cz)
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    lz = z0.astype(jnp.int32) - (z_start - Hw)
    # rows past the global z-extent are padding; their flows are junk and
    # their outputs are discarded — exclude them from the validity check
    row_real = (gz < Zl)
    ok = (lz >= 0) & (lz + 3 <= f2c_ext.shape[0] - 1)
    valid = jnp.all(ok | ~row_real)
    lz = jnp.clip(lz, 0, f2c_ext.shape[0] - 4)

    ext_z = f2c_ext.shape[0]
    taps = _stacked_taps(f2c_ext, (4, 4, 4), (ext_z - 3, Yl, Xl))
    lin = ((lz * Yl + y0.astype(jnp.int32)) * Xl
           + x0.astype(jnp.int32)).reshape(-1)
    fracs = ((cz - z0).reshape(-1), (cy - y0).reshape(-1),
             (cx - x0).reshape(-1))
    out = _row_gather_interp(taps, lin, fracs, (_w4, _w4, _w4), (4, 4, 4))
    out = out.reshape(pz, Yl, Xl)
    return jnp.where(oob, f1_local, out), valid


def _prefilter_yx(x):
    """Local Y/X cubic-B-spline prefilter passes -> (z, Y+3, X+3)."""
    hp = jax.lax.Precision.HIGHEST
    py = jnp.asarray(_bspline_prefilter_mat_np(x.shape[1]), x.dtype)
    px = jnp.asarray(_bspline_prefilter_mat_np(x.shape[2]), x.dtype)
    x = jnp.einsum("zyx,wx->zyw", x, px, precision=hp)
    return jnp.einsum("zyx,hy->zhx", x, py, precision=hp)


def _build_sharded_pyramid(shape, n_channels, n_dev, axis_name, alpha,
                           update_lag, iterations, min_level, levels, eta,
                           a_data, const_assumption, dtype, halo, halo_w,
                           a_smooth=1.0):
    """Returns the shard_map body fn(fixed_l, moving_l, uvw_l, weight_l)."""
    Z, Y, X = shape
    plan, eff_min_level, _ = level_schedule(shape, eta, levels, min_level)
    motion_tensor = MOTION_TENSORS[const_assumption]
    a_data_arr = np.asarray(a_data, np.float64).reshape(-1)
    if a_data_arr.size == 1:
        a_data_arr = np.repeat(a_data_arr, n_channels)

    pz_in = -(-Z // n_dev)           # input rows per device (z-padded)
    Z_pad = pz_in * n_dev

    # static per-level plan entries: (size, h, sharded?, pz_l)
    steps = []
    for i, size, (hz, hy, hx) in plan:
        sharded = size[0] >= 4 * n_dev
        pz_l = -(-size[0] // n_dev) if sharded else size[0]
        alpha_scaling = 1.0 if i == eff_min_level else eta ** (-0.5 * i)
        steps.append((size, (hz, hy, hx), sharded, pz_l,
                      tuple(alpha_scaling * a for a in alpha)))

    def resize_from_input(x_local, size, sharded, pz_l, channels=False):
        """Level volume from the full-res z-sharded input (z first, then
        local y/x passes on the smaller z-extent)."""
        Mz, My, Mx = _resize_mats((Z, Y, X), size)
        Mz = _sym_pad_rows(np.pad(Mz, ((0, 0), (0, Z_pad - Z))),
                           (pz_l * n_dev) if sharded else Mz.shape[0])
        if sharded:
            zloc = _ring_matmul_z(x_local, Mz, axis_name, pz_in, pz_l)
        else:
            zloc = _replicated_from_sharded(x_local, Mz, axis_name, pz_in)
        return _apply_yx(zloc, My, Mx)

    def resize_flow(u_int, size_from, size_to, from_sharded, to_sharded,
                    pz_from, pz_to):
        """Between-level flow resize (interior grids, no rings)."""
        Mz, My, Mx = _resize_mats(size_from, size_to)
        zf = size_from[0]
        if from_sharded:
            Mz_p = np.pad(Mz, ((0, 0), (0, pz_from * n_dev - zf)))
        else:
            Mz_p = Mz
        Mz_p = _sym_pad_rows(Mz_p, (pz_to * n_dev) if to_sharded
                             else Mz_p.shape[0])
        if from_sharded and to_sharded:
            z = _ring_matmul_z(u_int, Mz_p, axis_name, pz_from, pz_to)
        elif from_sharded:
            z = _replicated_from_sharded(u_int, Mz_p, axis_name, pz_from)
        elif to_sharded:
            idx = jax.lax.axis_index(axis_name)
            Mj = jnp.asarray(Mz_p, u_int.dtype)
            my_rows = jax.lax.dynamic_slice_in_dim(
                Mj, idx * pz_to, pz_to, axis=0)
            z = jnp.tensordot(my_rows, u_int, axes=([1], [0]))
        else:
            z = jnp.tensordot(jnp.asarray(Mz_p, u_int.dtype), u_int,
                              axes=([1], [0]))
        return _apply_yx(z, My, Mx)

    def body(fixed_l, moving_l, uvw_l, weight_l):
        idx = jax.lax.axis_index(axis_name)
        u = v = w = None
        prev = None  # (size, sharded, pz_l)
        valid = jnp.bool_(True)

        for step_i, (size, (hz, hy, hx), sharded, pz_l, alpha_l) in \
                enumerate(steps):
            f1 = jnp.stack([
                resize_from_input(fixed_l[..., c], size, sharded, pz_l)
                for c in range(n_channels)], axis=-1)
            f2 = jnp.stack([
                resize_from_input(moving_l[..., c], size, sharded, pz_l)
                for c in range(n_channels)], axis=-1)
            wt = jnp.stack([
                resize_from_input(weight_l[..., c], size, sharded, pz_l)
                for c in range(n_channels)], axis=-1)

            if step_i == 0:
                # top level always replicated (it is far below threshold)
                u = resize_from_input(uvw_l[..., 0], size, sharded, pz_l)
                v = resize_from_input(uvw_l[..., 1], size, sharded, pz_l)
                w = resize_from_input(uvw_l[..., 2], size, sharded, pz_l)
            else:
                psize, psharded, ppz = prev
                u = resize_flow(u, psize, size, psharded, sharded, ppz,
                                pz_l)
                v = resize_flow(v, psize, size, psharded, sharded, ppz,
                                pz_l)
                w = resize_flow(w, psize, size, psharded, sharded, ppz,
                                pz_l)

            z_start = idx * pz_l if sharded else 0
            n_rows = pz_l

            # -- warp moving by the running flow ---------------------------
            warped_ch = []
            for c in range(n_channels):
                # prefilter: local y/x passes then the z-pass; z-pass
                # matrix rows select exactly the ext window each device's
                # taps can touch
                f2yx = _prefilter_yx(f2[..., c])
                Mpre = _bspline_prefilter_mat_np(size[0])  # (Zl+3, Zl)
                if sharded:
                    Mpre_p = np.pad(
                        Mpre, ((halo_w, pz_l * n_dev + halo_w + 3
                                - Mpre.shape[0]), (0, pz_l * n_dev - size[0])))
                    cz_ext = _ring_matmul_z(
                        f2yx, Mpre_p, axis_name, pz_l,
                        pz_l + 2 * halo_w + 3, out_stride=pz_l)
                    # rows [z_start - Hw, z_start + pz + Hw + 3): the pad
                    # above shifts matrix rows so row 0 == ext row -Hw
                else:
                    cz_ext = jnp.tensordot(
                        jnp.asarray(np.pad(Mpre, ((halo_w, halo_w), (0, 0))),
                                    f2yx.dtype),
                        f2yx, axes=([1], [0]))
                warped, ok = _warp_local(
                    cz_ext, f1[..., c], u, v, w,
                    z_start, halo_w, size, hz, hy, hx)
                valid = valid & ok
                warped_ch.append(warped)
            tmp = jnp.stack(warped_ch, axis=-1)

            # -- motion tensor on halo-extended slabs ----------------------
            if sharded:
                f1e = _halo_exchange(f1, axis_name, halo, "symmetric",
                                     size[0])
                tmpe = _halo_exchange(tmp, axis_name, halo, "symmetric",
                                      size[0])
                crop = slice(halo, halo + n_rows + 2)
            else:
                f1e, tmpe = f1, tmp
                crop = slice(0, n_rows + 2)
            J_ch = [motion_tensor(f1e[..., c], tmpe[..., c], hz, hy, hx)
                    for c in range(n_channels)]
            J_entries = [
                jnp.stack([J_ch[c][k][crop] for c in range(n_channels)],
                          axis=-1)
                for k in range(10)]

            wt_r = jnp.pad(wt, ((1, 1), (1, 1), (1, 1), (0, 0)))

            # -- solve -----------------------------------------------------
            ub = add_boundary(u)
            vb = add_boundary(v)
            wb = add_boundary(w)
            if sharded:
                du, dv, dw = _solve_sharded_local(
                    J_entries, wt_r, ub, vb, wb, alpha_l, iterations,
                    update_lag, a_data_arr, hx, hy, hz, axis_name,
                    pz_l, size[0], a_smooth)
            else:
                du, dv, dw = compute_flow_level(
                    J_entries, wt_r, ub, vb, wb, alpha_l, iterations,
                    update_lag, a_data_arr, a_smooth, hx, hy, hz,
                    use_pallas=False)
                du, dv, dw = (x[1:-1, 1:-1, 1:-1] for x in (du, dv, dw))

            # -- median + accumulate --------------------------------------
            if min(size) > 5:
                if sharded:
                    du, dv, dw = (
                        _median_sharded(x, axis_name, size[0])
                        for x in (du, dv, dw))
                else:
                    du, dv, dw = (median_filter_5x5x5(x)
                                  for x in (du, dv, dw))
            u = u + du
            v = v + dv
            w = w + dw
            prev = (size, sharded, pz_l)

        # -- final output: full-res z-sharded flow -------------------------
        fsize, fsharded, fpz = prev
        if eff_min_level > 0 or fsize != (Z, Y, X) or not fsharded:
            u = resize_flow(u, fsize, (Z, Y, X), fsharded, True, fpz, pz_in)
            v = resize_flow(v, fsize, (Z, Y, X), fsharded, True, fpz, pz_in)
            w = resize_flow(w, fsize, (Z, Y, X), fsharded, True, fpz, pz_in)
        flow = jnp.stack([u, v, w], axis=-1)
        return flow, jnp.all(jax.lax.psum(valid.astype(jnp.int32),
                                          axis_name) == n_dev)

    return body


def _solve_sharded_local(J_entries, weight_r, ub, vb, wb, alpha, iterations,
                         update_lag, a_data, hx, hy, hz, axis_name, pz_l,
                         z_total, a_smooth=1.0):
    """Sharded SOR solve from inside the pyramid body.

    J_entries already carry local ghost rows ([own-1, own+pz+1)); u/v/w are
    local ringed blocks (pz+2 after add_boundary... add_boundary adds a
    ring on the LOCAL block; its z-ghost rows are refreshed by exchange).
    """
    from flowreg3d_tpu.parallel.spatial import (_exchange_halo,
                                                _local_halfsweep)

    dtype = ub.dtype
    idx = jax.lax.axis_index(axis_name)
    # base-flow z-ghost rows must hold NEIGHBOR edge rows (add_boundary
    # filled them with local copies); one exchange fixes interior shards
    # and applies the global Neumann copy at the faces. Rows past the true
    # z-extent (shard padding) must hold the edge copy too — the Neumann
    # clamp at the last real row reads its base zp-neighbor from there.
    def edge_fix(f):
        grow = jnp.arange(f.shape[0]) + idx * pz_l
        src = jnp.clip(jnp.where(grow > z_total, z_total, grow)
                       - idx * pz_l, 0, f.shape[0] - 1)
        return jnp.take(f, src, axis=0)

    ub = edge_fix(_exchange_halo(ub, axis_name))
    vb = edge_fix(_exchange_halo(vb, axis_name))
    wb = edge_fix(_exchange_halo(wb, axis_name))
    z_off = idx * pz_l
    p_int = z_total

    Jt = jnp.stack(J_entries)
    (J11, J22, J33, J44, J12, J13, J23, J14, J24, J34) = [
        Jt[i] for i in range(10)]
    C = J11.shape[-1]
    a_vec = jnp.asarray(a_data, dtype).reshape(1, 1, 1, C)
    ax = alpha[0] / (hx * hx)
    ay = alpha[1] / (hy * hy)
    az = alpha[2] / (hz * hz)

    du = ub * 0.0
    dv = ub * 0.0
    dw = ub * 0.0

    def tick(du, dv, dw):
        d_u = du[..., None]
        d_v = dv[..., None]
        d_w = dw[..., None]
        E = (J11 * d_u * d_u + J22 * d_v * d_v + J33 * d_w * d_w
             + 2 * J12 * d_u * d_v + 2 * J13 * d_u * d_w
             + 2 * J23 * d_v * d_w
             + 2 * J14 * d_u + 2 * J24 * d_v + 2 * J34 * d_w + J44)
        E = jnp.maximum(E, 0.0)
        psi = jnp.where(a_vec != 1.0,
                        a_vec * (E + 1e-6) ** (a_vec - 1.0),
                        jnp.ones_like(E))
        S = weight_r * psi
        return tuple(jnp.sum(S * Jxy, -1) for Jxy in
                     (J11, J22, J33, J12, J13, J23, J14, J24, J34))

    def exchange(a, b, c):
        return (_exchange_halo(a, axis_name), _exchange_halo(b, axis_name),
                _exchange_halo(c, axis_name))

    SJ0 = tick(du, dv, dw)

    from flowreg3d_tpu.parallel.spatial import _psi_sharded

    a_smooth_is_one = float(a_smooth) == 1.0

    def body(it, state):
        du, dv, dw, SJ = state
        SJ = jax.lax.cond(jnp.mod(it, update_lag) == 0,
                          lambda _: tick(du, dv, dw), lambda s: s, SJ)
        du, dv, dw = exchange(du, dv, dw)
        psi = (None if a_smooth_is_one else _psi_sharded(
            du, dv, dw, ub, vb, wb, a_smooth, hx, hy, hz, axis_name,
            z_off, p_int))
        du, dv, dw = _local_halfsweep(0, z_off, p_int, du, dv, dw,
                                      ub, vb, wb, SJ, ax, ay, az, psi)
        du, dv, dw = exchange(du, dv, dw)
        du, dv, dw = _local_halfsweep(1, z_off, p_int, du, dv, dw,
                                      ub, vb, wb, SJ, ax, ay, az, psi)
        return du, dv, dw, SJ

    du, dv, dw, _ = jax.lax.fori_loop(0, int(iterations), body,
                                      (du, dv, dw, SJ0))
    return (du[1:-1, 1:-1, 1:-1], dv[1:-1, 1:-1, 1:-1],
            dw[1:-1, 1:-1, 1:-1])


def _median_sharded(x, axis_name, z_total):
    """5^3 median of a local (pz, Y, X) slab; 'reflect' at global faces."""
    xe = _halo_exchange(x, axis_name, 2, "reflect", z_total)
    xp = jnp.pad(xe, ((0, 0), (2, 2), (2, 2)), mode="reflect")
    patches = jax.lax.conv_general_dilated_patches(
        xp[None, ..., None], (5, 5, 5), (1, 1, 1), "VALID",
        dimension_numbers=("NZYXC", "ZYXIO", "NZYXC"),
        precision=jax.lax.Precision.HIGHEST)[0]
    return jnp.median(patches.reshape(patches.shape[:3] + (125,)), axis=-1)


def get_displacement_sharded(fixed, moving, mesh=None, axis="z",
                             alpha=(2.0, 2.0, 2.0), update_lag=10,
                             iterations=20, min_level=0, levels=50, eta=0.8,
                             a_data=0.45, const_assumption="gc", uvw=None,
                             weight=None, halo=_DEF_HALO,
                             halo_w=_DEF_HALO_W, dtype=jnp.float32,
                             a_smooth=1.0):
    """Z-sharded drop-in for ``get_displacement`` (both a_smooth regimes).

    ``weight`` may be a per-channel vector (C,) or a full spatially-varying
    volume (Z, Y, X, C) — the latter is z-sharded with the inputs. Returns
    (flow (Z,Y,X,3), valid) where ``valid`` is False when any level warp
    needed z-samples beyond the ``halo_w`` window (fall back to the
    single-device path in that case).
    """
    from jax import shard_map

    mesh = mesh or spatial_mesh(axis=axis)
    n_dev = mesh.devices.size
    fixed = jnp.asarray(fixed, dtype)
    moving = jnp.asarray(moving, dtype)
    if fixed.ndim == 3:
        fixed = fixed[..., None]
        moving = moving[..., None]
    Z, Y, X, C = fixed.shape
    if uvw is None:
        uvw = jnp.zeros((Z, Y, X, 3), dtype)
    if weight is None:
        weight = jnp.ones((Z, Y, X, C), dtype) / C
    else:
        weight = jnp.asarray(weight, dtype)
        if weight.ndim == 1:
            weight = jnp.broadcast_to(
                weight.reshape(1, 1, 1, C), (Z, Y, X, C))

    pz_in = -(-Z // n_dev)
    padz = pz_in * n_dev - Z

    def padf(f):
        return jnp.pad(f, ((0, padz),) + ((0, 0),) * (f.ndim - 1),
                       mode="edge")

    body = _build_sharded_pyramid(
        (Z, Y, X), C, n_dev, axis, tuple(float(a) for a in alpha),
        int(update_lag), int(iterations), int(min_level), int(levels),
        float(eta), a_data, const_assumption, dtype, int(halo), int(halo_w),
        float(a_smooth))

    # jit is essential: an un-jitted shard_map executes the pyramid
    # op-by-op (one dispatch-compile per primitive per device — measured
    # 204 s vs 22 s jitted for one tiny level on the 8-device CPU mesh)
    fn = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P()),
    ))
    flow, valid = fn(padf(fixed), padf(moving), padf(uvw), padf(weight))
    return flow[:Z], valid
