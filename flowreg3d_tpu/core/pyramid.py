"""Coarse-to-fine pyramid driver for 3D variational optical flow.

Behavioral parity target: reference core/optical_flow_3d.py:319-542
(``get_displacement``): per-axis pyramid depth via ``warpingDepth`` (min-dim
shrunk by eta until round(min_dim) < 10), per-axis level caps and the global
``min(max_levels)*4`` cap, level sizes ``round(dim*eta^min(i,max_axis))``,
grid spacings ``h = orig_dim/level_dim`` feeding the stencils, flow stored in
original-resolution units and divided by h before warping, alpha scaled by
``eta^(-i/2)`` except at min_level, 5^3 median filtering of the increments
when min(level_size) > 5, and a final upsample when min_level > 0.

TPU-first design: the level schedule is computed on the host (pure Python,
static shapes per input shape), and the *entire* pyramid — every resize,
warp, motion tensor and the red-black SOR solver of every level — is traced
into ONE jittable function, cached per (shape, dtype, params). Frames of a
recording share shapes, so the compiled pyramid is reused across the whole
time series and can be vmapped over a batch axis / sharded over a mesh.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from flowreg3d_tpu.core.motion_tensor import MOTION_TENSORS
from flowreg3d_tpu.core.solver import compute_flow_level_cl
from flowreg3d_tpu.ops.filters import median_filter_5x5x5
from flowreg3d_tpu.ops.resize import resize_volume
from flowreg3d_tpu.ops.warp import imregister_wrapper


def _median_increments(du, dv, dw, use_pallas, median_pallas_ok=True):
    """5^3-median-filter the three increment volumes (interiors only).

    Pallas path: ONE batched kernel launch for all three components
    (ops/median_pallas.py:median_filter_5x5x5_pallas_batched) instead of
    three — the per-call fixed cost dominates at coarse level sizes.

    ``median_pallas_ok=False`` routes to the XLA median regardless: the
    XLA TPU fusion pass SIGABRTs when Pallas solver sweeps and the Pallas
    median coexist in a min_level<4 pyramid program (BENCH_JOBS.jsonl
    jobs 215/225/240, 2026-08-20) — the solver kernel is the
    perf-critical one, so it stays.
    """
    from flowreg3d_tpu.core.solver import (kernel_barrier, pallas_enabled,
                                           pallas_kernel_on)

    up = pallas_enabled() if use_pallas is None else use_pallas
    if up and median_pallas_ok and pallas_kernel_on("MEDIAN"):
        from flowreg3d_tpu.ops.median_pallas import (
            median_filter_5x5x5_pallas_batched)

        stacked = jnp.stack([du[1:-1, 1:-1, 1:-1], dv[1:-1, 1:-1, 1:-1],
                             dw[1:-1, 1:-1, 1:-1]])
        med = kernel_barrier(median_filter_5x5x5_pallas_batched(stacked))
        return (du.at[1:-1, 1:-1, 1:-1].set(med[0]),
                dv.at[1:-1, 1:-1, 1:-1].set(med[1]),
                dw.at[1:-1, 1:-1, 1:-1].set(med[2]))
    # when the policy gates the Pallas median OFF, the fallback must be
    # the XLA median unconditionally — passing use_pallas through would
    # re-enable the kernel via _median's own env check (the round-5 bug
    # behind jobs 264/270/274/278 re-crashing)
    mp = use_pallas if median_pallas_ok else False
    return (du.at[1:-1, 1:-1, 1:-1].set(_median(du[1:-1, 1:-1, 1:-1], mp)),
            dv.at[1:-1, 1:-1, 1:-1].set(_median(dv[1:-1, 1:-1, 1:-1], mp)),
            dw.at[1:-1, 1:-1, 1:-1].set(_median(dw[1:-1, 1:-1, 1:-1], mp)))


def _median(x, use_pallas):
    """5^3 median: Pallas selection network on TPU (28x the XLA sort and
    exact — the XLA path's conv-based patch extraction rounds taps to bf16
    on TPU), XLA path on CPU / under vmap (use_pallas=False)."""
    from flowreg3d_tpu.core.solver import pallas_enabled

    from flowreg3d_tpu.core.solver import pallas_kernel_on

    if use_pallas is None:
        use_pallas = pallas_enabled()
    if use_pallas and pallas_kernel_on("MEDIAN"):
        from flowreg3d_tpu.core.solver import kernel_barrier
        from flowreg3d_tpu.ops.median_pallas import median_filter_5x5x5_pallas

        return kernel_barrier(median_filter_5x5x5_pallas(x))
    return median_filter_5x5x5(x)


def warping_depth(eta, levels, p, m, n):
    """Pyramid depth: shrink min-dim by eta until round(.) < 10 (ref :77-85)."""
    min_dim = min(p, m, n)
    depth = 0
    for _ in range(levels):
        depth += 1
        min_dim *= eta
        if round(min_dim) < 10:
            break
    return depth


def add_boundary(f):
    """Pad a volume by one voxel on each side with edge values (ref :88-89)."""
    return jnp.pad(f, 1, mode="edge")


def level_schedule(shape_zyx, eta, levels, min_level):
    """Static (host-side) level plan: list of (level_index, level_size, h).

    Returns levels ordered coarse -> fine, plus the effective min_level.
    """
    p, m, n = shape_zyx
    mlz = warping_depth(eta, levels, p, m, n)
    mly = warping_depth(eta, levels, m, n, p)
    mlx = warping_depth(eta, levels, n, p, m)
    cap = min(mlx, mly, mlz) * 4
    mlz, mly, mlx = min(mlz, cap), min(mly, cap), min(mlx, cap)
    top = max(mlx, mly, mlz)
    if top <= min_level:
        min_level = top - 1
    if min_level < 0:
        min_level = 0
    plan = []
    for i in range(top, min_level - 1, -1):
        size = (
            int(round(p * eta ** min(i, mlz))),
            int(round(m * eta ** min(i, mly))),
            int(round(n * eta ** min(i, mlx))),
        )
        h = (p / size[0], m / size[1], n / size[2])
        plan.append((i, size, h))
    return plan, min_level, top


def _normalize_weight(weight, shape, n_channels, dtype):
    """Reference weight semantics (core/optical_flow_3d.py:351-381)."""
    p, m, n = shape
    if weight is None:
        return jnp.full((p, m, n, n_channels), 1.0 / n_channels, dtype)
    weight = jnp.asarray(weight, dtype)
    if weight.ndim == 1:
        wv = np.asarray(weight, dtype=np.float64)
        if len(wv) < n_channels:
            ww = np.full(n_channels, 1.0 / n_channels)
            ww[: len(wv)] = wv
            wv = ww
        elif len(wv) > n_channels:
            wv = wv[:n_channels]
        wv = wv / wv.sum()
        return jnp.broadcast_to(
            jnp.asarray(wv, dtype).reshape(1, 1, 1, -1), (p, m, n, n_channels))
    if weight.ndim == 3:
        return jnp.broadcast_to(weight[..., None], (p, m, n, n_channels)).astype(dtype)
    return jnp.broadcast_to(weight, (p, m, n, n_channels)).astype(dtype)


@lru_cache(maxsize=32)
def build_pyramid_raw(shape, n_channels, alpha, update_lag, iterations,
                      min_level, levels, eta, a_smooth, a_data,
                      const_assumption, dtype_name, use_pallas=None):
    """Build (and cache) the traced-once pyramid function for a static
    configuration. Returns the raw (un-jitted) function — composable under
    vmap/shard_map; ``_build_pyramid_fn`` wraps it in jit for the
    single-frame API."""
    dtype = jnp.dtype(dtype_name)
    p, m, n = shape
    plan, eff_min_level, top = level_schedule(shape, eta, levels, min_level)
    motion_tensor = MOTION_TENSORS[const_assumption]
    # fusion-crash workaround policy (see _median_increments): fine-level
    # pyramids get the XLA median unless explicitly forced back on
    import os as _os

    median_pallas_ok = (eff_min_level >= 4
                        or _os.environ.get("FLOWREG3D_PALLAS_MEDIAN") == "1")
    a_data_arr = np.asarray(
        a_data if isinstance(a_data, tuple) else (a_data,) * n_channels,
        dtype=np.float64)

    def pyramid(fixed, moving, uvw, weight):
        # fixed/moving: (Z,Y,X,C); uvw: (Z,Y,X,3); weight: (Z,Y,X,C)
        from flowreg3d_tpu.ops import warp_pallas

        # fusion-crash policy (see _median_increments): fine-level
        # pyramids keep the windowed warp only at >=2^21-voxel levels
        old_floor = warp_pallas.min_vox_floor(
            (1 << 21) if eff_min_level < 4 else 0)
        try:
            return _pyramid_body(fixed, moving, uvw, weight)
        finally:
            warp_pallas.min_vox_floor(old_floor)

    def _pyramid_body(fixed, moving, uvw, weight):
        u = v = w = None
        for step, (i, size, (hz, hy, hx)) in enumerate(plan):
            if step > 0:
                # false dependency: stops XLA's scheduler from hoisting
                # later levels' large temporaries (warp tap stacks) above
                # earlier levels, which would sum their HBM lifetimes
                fixed, moving, weight, u, v, w = jax.lax.optimization_barrier(
                    (fixed, moving, weight, u, v, w))
            # NOTE: batching these resizes (fixed+moving concat, flow
            # components as channels) measured perf-NEUTRAL on chip
            # (BENCH_JOBS job_262: 49.7 vs 49.1 ms) and reintroduced the
            # min_level=0 fusion-pass SIGABRT (job_274 quality-current vs
            # job_256) — keep them separate.
            f1_level = resize_volume(fixed, size, dtype=dtype)
            f2_level = resize_volume(moving, size, dtype=dtype)
            if step == 0:
                u = add_boundary(resize_volume(uvw[..., 0], size, dtype=dtype))
                v = add_boundary(resize_volume(uvw[..., 1], size, dtype=dtype))
                w = add_boundary(resize_volume(uvw[..., 2], size, dtype=dtype))
                # warp by the resized initialization so the solver sees the
                # RESIDUAL (reference core/optical_flow_3d.py:417-434 warps
                # at every level; for uvw == 0 this is exactly f2_level)
                tmp = imregister_wrapper(
                    f2_level,
                    u[1:-1, 1:-1, 1:-1] / hx,
                    v[1:-1, 1:-1, 1:-1] / hy,
                    w[1:-1, 1:-1, 1:-1] / hz,
                    f1_level,
                    use_pallas=use_pallas,
                )
            else:
                u = add_boundary(resize_volume(u[1:-1, 1:-1, 1:-1], size, dtype=dtype))
                v = add_boundary(resize_volume(v[1:-1, 1:-1, 1:-1], size, dtype=dtype))
                w = add_boundary(resize_volume(w[1:-1, 1:-1, 1:-1], size, dtype=dtype))
                tmp = imregister_wrapper(
                    f2_level,
                    u[1:-1, 1:-1, 1:-1] / hx,
                    v[1:-1, 1:-1, 1:-1] / hy,
                    w[1:-1, 1:-1, 1:-1] / hz,
                    f1_level,
                    use_pallas=use_pallas,
                )
            if tmp.ndim == 3:
                tmp = tmp[..., None]

            # channel-LEADING (C,p,m,n) J/weight stacks: a trailing C=1
            # axis would land minor-most and lane-pad 128x on TPU (see
            # core/solver.py:_solve)
            J_ch = [motion_tensor(f1_level[..., c], tmp[..., c], hz, hy, hx)
                    for c in range(n_channels)]
            J_entries = [jnp.stack([J_ch[c][k] for c in range(n_channels)],
                                   axis=0) for k in range(10)]

            weight_level = resize_volume(weight, size, dtype=dtype)
            weight_level = jnp.pad(
                jnp.moveaxis(weight_level, -1, 0),
                ((0, 0), (1, 1), (1, 1), (1, 1)), mode="constant")

            alpha_scaling = 1.0 if i == eff_min_level else eta ** (-0.5 * i)
            alpha_tmp = tuple(alpha_scaling * a for a in alpha)

            du, dv, dw = compute_flow_level_cl(
                J_entries, weight_level, u, v, w, alpha_tmp,
                iterations, update_lag, a_data_arr, a_smooth, hx, hy, hz,
                use_pallas=use_pallas)

            if min(size) > 5:
                du, dv, dw = _median_increments(du, dv, dw, use_pallas,
                                                median_pallas_ok)
            u = u + du
            v = v + dv
            w = w + dw

        flow = jnp.stack(
            [u[1:-1, 1:-1, 1:-1], v[1:-1, 1:-1, 1:-1], w[1:-1, 1:-1, 1:-1]],
            axis=-1)
        if eff_min_level > 0:
            flow = jnp.stack(
                [resize_volume(flow[..., k], (p, m, n), dtype=dtype)
                 for k in range(3)], axis=-1)
        return flow

    return pyramid


@lru_cache(maxsize=32)
def _build_pyramid_fn(*key):
    return jax.jit(build_pyramid_raw(*key))


def pyramid_config_key(shape, n_channels, alpha=(2.0, 2.0, 2.0),
                       update_lag=10, iterations=20, min_level=0, levels=50,
                       eta=0.8, a_smooth=0.5, a_data=0.45,
                       const_assumption="gc", dtype=jnp.float32,
                       use_pallas=None):
    """Hashable static-config tuple for ``build_pyramid_raw``.

    ``use_pallas``: None = auto (Pallas on TPU, any a_smooth); False
    forces the XLA solver — required when the pyramid is vmapped (Pallas
    ANY-memory-space kernels don't lower under a batch dimension)."""
    alpha = tuple(float(a) for a in np.broadcast_to(
        np.asarray(alpha, np.float64), (3,)))
    if isinstance(a_data, (list, tuple, np.ndarray)):
        a_data_key = tuple(float(a) for a in np.asarray(a_data).ravel())
        if len(a_data_key) == 1:
            a_data_key = a_data_key * n_channels
    else:
        a_data_key = (float(a_data),) * n_channels
    return (tuple(int(s) for s in shape), int(n_channels), alpha,
            int(update_lag), int(iterations), int(min_level), int(levels),
            float(eta), float(a_smooth), a_data_key, const_assumption,
            jnp.dtype(dtype).name, use_pallas)


def get_displacement(fixed, moving, alpha=(2.0, 2.0, 2.0), update_lag=10,
                     iterations=20, min_level=0, levels=50, eta=0.8,
                     a_smooth=0.5, a_data=0.45, const_assumption="gc",
                     uvw=None, weight=None, dtype=jnp.float32):
    """Estimate the dense 3D flow (Z,Y,X,3)=[dx,dy,dz] from fixed to moving.

    Drop-in equivalent of the reference's ``get_displacement``
    (core/optical_flow_3d.py:319); runs the full coarse-to-fine pyramid as a
    single compiled TPU program (cached per shape/params).
    """
    fixed = jnp.asarray(fixed, dtype)
    moving = jnp.asarray(moving, dtype)
    if fixed.ndim == 3:
        fixed = fixed[..., None]
        moving = moving[..., None]
    p, m, n, n_channels = fixed.shape

    if uvw is None:
        uvw = jnp.zeros((p, m, n, 3), dtype)
    else:
        uvw = jnp.asarray(uvw, dtype)
    weight = _normalize_weight(weight, (p, m, n), n_channels, dtype)

    key = pyramid_config_key(
        (p, m, n), n_channels, alpha, update_lag, iterations, min_level,
        levels, eta, a_smooth, a_data, const_assumption, dtype)
    fn = _build_pyramid_fn(*key)
    return fn(fixed, moving, uvw, weight)
