"""Backward warping of 3D volumes by dense displacement fields, TPU-native.

Behavioral parity target: the reference's ``imregister_wrapper``
(reference core/optical_flow_3d.py:22-74), which maps ``moving(x+u, y+v, z+w)``
via ``scipy.ndimage.map_coordinates`` (order 3 = cubic B-spline with
prefiltering, or order 1 = trilinear), ``mode='nearest'``, with coordinates
clipped to the valid range and out-of-bounds voxels filled from the *fixed*
volume.

TPU-first design:
- The cubic B-spline **prefilter** (scipy's spline_filter) is a per-axis
  tridiagonal solve; we precompute its dense inverse on the host per axis
  length (LRU-cached) and apply it as one matmul per axis on the MXU.
- **Evaluation**: TPU gathers cost ~10ns per *index row* regardless of slice
  width, so the 64 (tricubic) / 8 (trilinear) taps are restacked into ONE
  wide operand — 64 statically-shifted copies of the coefficient volume on
  the minor axis — and fetched with a single contiguous row-gather per
  output voxel (measured 29x faster than 64 single-element gathers on
  v5e; exact to 3e-7). Output is computed in z-slabs (lax.map) to bound the
  (N, 64) gather intermediate.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


_SPLINE_PAD = 12  # matches scipy's _prepad_for_spline_filter for mode='nearest'


@lru_cache(maxsize=64)
def _bspline_prefilter_mat_np(n: int) -> np.ndarray:
    """Combined edge-pad + cubic-B-spline prefilter matrix, shape (n+3, n).

    Reproduces scipy.ndimage.map_coordinates(order=3, mode='nearest')
    coefficient handling: scipy edge-pads the input by 12 samples
    (_prepad_for_spline_filter), spline-filters the padded signal, and
    evaluates taps in the padded array. Row r of the returned matrix yields
    the spline coefficient at original tap position r-1 (taps -1..n+1 are
    all a clipped coordinate's 4-tap window can touch), so evaluation needs
    no index clipping. Validated to ~2e-15 against scipy in 1D.
    """
    if n == 1:
        return np.ones((4, 1), dtype=np.float64)
    npad = n + 2 * _SPLINE_PAD
    B = np.zeros((npad, npad), dtype=np.float64)
    idx = np.arange(npad)
    for off, w in ((-1, 1.0 / 6.0), (0, 2.0 / 3.0), (1, 1.0 / 6.0)):
        j = np.clip(idx + off, 0, npad - 1)
        np.add.at(B, (idx, j), w)
    Binv = np.linalg.inv(B)
    pad = np.zeros((npad, n), dtype=np.float64)
    pad[np.arange(npad), np.clip(np.arange(npad) - _SPLINE_PAD, 0, n - 1)] = 1.0
    return (Binv @ pad)[_SPLINE_PAD - 1: _SPLINE_PAD + n + 2]


def bspline_prefilter(vol, dtype=None):
    """Extended spline coefficients of a (Z,Y,X) volume -> (Z+3, Y+3, X+3).

    Index [i+1] along each axis holds the coefficient for tap position i
    (taps -1..n+1 are covered).
    """
    dtype = dtype or vol.dtype
    Z, Y, X = vol.shape
    pz = jnp.asarray(_bspline_prefilter_mat_np(Z), dtype)
    py = jnp.asarray(_bspline_prefilter_mat_np(Y), dtype)
    px = jnp.asarray(_bspline_prefilter_mat_np(X), dtype)
    hp = jax.lax.Precision.HIGHEST
    # every contraction leaves the big operand's minor (x) axis alone and
    # consumes a non-minor axis via left-multiplication — the naive
    # "zyx,dz->dyx" einsum forces a major<->minor relayout that costs ~70ms
    # at 512^2x64 (~50x the matmuls themselves)
    a = jax.lax.dot_general(vol.astype(dtype).reshape(Z * Y, X), px,
                            (((1,), (1,)), ((), ())), precision=hp)
    a = a.reshape(Z, Y, X + 3)
    b = jax.lax.dot_general(py, a, (((1,), (1,)), ((), ())),
                            precision=hp)          # (Ye, Z, Xe)
    c = jax.lax.dot_general(pz, b, (((1,), (1,)), ((), ())),
                            precision=hp)          # (Ze, Ye, Xe)
    return c


def _bspline_weights(t):
    """Cubic B-spline basis weights at taps {-1, 0, 1, 2} for fraction t in [0,1)."""
    t2 = t * t
    t3 = t2 * t
    w0 = (1.0 - 3.0 * t + 3.0 * t2 - t3) / 6.0
    w1 = (4.0 - 6.0 * t2 + 3.0 * t3) / 6.0
    w2 = (1.0 + 3.0 * t + 3.0 * t2 - 3.0 * t3) / 6.0
    w3 = t3 / 6.0
    return (w0, w1, w2, w3)


def _w4(t):
    """(..., 4) cubic B-spline tap weights."""
    w0, w1, w2, w3 = _bspline_weights(t)
    return jnp.stack([w0, w1, w2, w3], axis=-1)


# gather intermediates are bounded to ~SLAB_ELEMS * taps * 4B per slab
_SLAB_ELEMS = 1 << 20


def _stacked_taps(ext, taps_zyx, out_shape):
    """(N, prod(taps)) operand: statically shifted copies on the minor axis.

    Memory-layout care (all measured on v5e):
    - stacking (N,) slices on a NEW MINOR axis lane-pads every (N, 1) temp
      to (N, 128) — 64 x 128-lane temps = ~18 GB at 512x512x64 scale;
    - conv_general_dilated_patches emits a lane-padded 5D output AND the
      gather relays it out — two full-size padded copies.
    So: stack on axis 0 ((taps, N), zero padding), then one explicit
    transpose to (N, taps) — a single padded buffer, which the row-gather
    consumes in place.
    """
    Z, Y, X = out_shape
    ta, tb, td = taps_zyx
    n_taps = ta * tb * td
    stacked = jnp.stack([
        ext[a:a + Z, b:b + Y, d:d + X].reshape(-1)
        for a in range(ta) for b in range(tb) for d in range(td)
    ], axis=0)
    # transpose via identity matmul: a plain transpose (or stacking on the
    # minor axis directly) lets XLA's layout assignment push the transposed
    # layout back through the concatenate, lane-padding every (1, N) input
    # to 128 lanes (128x memory). Dot operands/outputs have fixed standard
    # layouts, and HIGHEST precision keeps value*1.0 exact in f32.
    eye = jnp.eye(n_taps, dtype=stacked.dtype)
    return jax.lax.dot_general(
        stacked, eye, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)


def _row_gather_interp(taps, lin, fracs, weight_fns, tap_counts):
    """One row-gather of all taps per voxel + separable weight contraction.

    taps: (N, T) stacked operand; lin: (M,) int32 flat base indices;
    fracs: tuple of (M,) fractional coords; weight_fns: per-axis weight
    builders returning (M, k); tap_counts: (kz, ky, kx).
    """
    kz, ky, kx = tap_counts
    n_taps = kz * ky * kx
    M = lin.shape[0]
    nchunk = max(1, -(-M // _SLAB_ELEMS))
    pad = (-M) % nchunk
    if pad:
        lin = jnp.concatenate([lin, jnp.zeros(pad, lin.dtype)])
        fracs = tuple(jnp.concatenate([f, jnp.zeros(pad, f.dtype)])
                      for f in fracs)
    sz = lin.shape[0] // nchunk
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))

    def slab(args):
        lin_s, fz, fy, fx = args
        g = jax.lax.gather(
            taps, lin_s[:, None], dn, slice_sizes=(1, n_taps),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        g = g.reshape(-1, kz, ky, kx)
        g = jnp.einsum("nabd,na->nbd", g, weight_fns[0](fz))
        g = jnp.einsum("nbd,nb->nd", g, weight_fns[1](fy))
        return jnp.einsum("nd,nd->n", g, weight_fns[2](fx))

    r = lambda a: a.reshape(nchunk, sz)
    out = jax.lax.map(slab, (r(lin), r(fracs[0]), r(fracs[1]), r(fracs[2])))
    return out.reshape(-1)[:M]


def map_coordinates_cubic(vol, coord_z, coord_y, coord_x):
    """Tricubic B-spline sampling of vol (Z,Y,X) at the given coordinate grids.

    Equivalent to scipy.ndimage.map_coordinates(vol, [cz,cy,cx], order=3,
    mode='nearest') for in-range (clipped) coordinates.
    """
    Z, Y, X = vol.shape
    out_shape = coord_z.shape
    c = bspline_prefilter(vol)  # (Z+3, Y+3, X+3), tap i at index i+1

    z0 = jnp.floor(coord_z)
    y0 = jnp.floor(coord_y)
    x0 = jnp.floor(coord_x)
    fracs = ((coord_z - z0).reshape(-1), (coord_y - y0).reshape(-1),
             (coord_x - x0).reshape(-1))
    # tap o-1 (o=0..3) lives at ext index z0 + o; coords are pre-clipped so
    # base indices stay in range.
    lin = ((z0.astype(jnp.int32) * Y + y0.astype(jnp.int32)) * X
           + x0.astype(jnp.int32)).reshape(-1)

    taps = _stacked_taps(c, (4, 4, 4), (Z, Y, X))
    out = _row_gather_interp(taps, lin, fracs, (_w4, _w4, _w4), (4, 4, 4))
    return out.reshape(out_shape).astype(vol.dtype)


def _w2(t):
    return jnp.stack([1.0 - t, t], axis=-1)


def map_coordinates_linear(vol, coord_z, coord_y, coord_x):
    """Trilinear sampling of vol (Z,Y,X), mode='nearest' for clipped coords."""
    Z, Y, X = vol.shape
    out_shape = coord_z.shape
    z0 = jnp.clip(jnp.floor(coord_z), 0, Z - 1)
    y0 = jnp.clip(jnp.floor(coord_y), 0, Y - 1)
    x0 = jnp.clip(jnp.floor(coord_x), 0, X - 1)
    fracs = ((coord_z - z0).reshape(-1), (coord_y - y0).reshape(-1),
             (coord_x - x0).reshape(-1))
    lin = ((z0.astype(jnp.int32) * Y + y0.astype(jnp.int32)) * X
           + x0.astype(jnp.int32)).reshape(-1)

    # edge-pad by one so the +1 taps at the far faces stay in bounds (their
    # weight is 0 there, the value is irrelevant but must be finite)
    ext = jnp.pad(vol, ((0, 1), (0, 1), (0, 1)), mode="edge")
    taps = _stacked_taps(ext, (2, 2, 2), (Z, Y, X))
    out = _row_gather_interp(taps, lin, fracs, (_w2, _w2, _w2), (2, 2, 2))
    return out.reshape(out_shape).astype(vol.dtype)


def imregister_wrapper(f2_level, u, v, w, f1_level,
                       interpolation_method="cubic", use_pallas=None):
    """Backward-warp moving volume by (u,v,w); OOB voxels come from fixed.

    Parity: reference core/optical_flow_3d.py:22-74. Shapes (Z,Y,X) or
    (Z,Y,X,C); u/v/w are (Z,Y,X) displacements in x/y/z voxel units.
    ``use_pallas=False`` forces the XLA sampling path (required under a
    vmap batch dim, where the windowed Pallas kernel cannot lower).
    """
    f2 = jnp.asarray(f2_level)
    f1 = jnp.asarray(f1_level)
    squeeze = f2.ndim == 3
    if squeeze:
        f2 = f2[..., None]
        f1 = f1[..., None]
    Z, Y, X, C = f2.shape
    grid_z, grid_y, grid_x = jnp.meshgrid(
        jnp.arange(Z, dtype=u.dtype),
        jnp.arange(Y, dtype=u.dtype),
        jnp.arange(X, dtype=u.dtype),
        indexing="ij",
    )
    map_x = grid_x + u
    map_y = grid_y + v
    map_z = grid_z + w
    oob = (
        (map_x < 0) | (map_x >= X)
        | (map_y < 0) | (map_y >= Y)
        | (map_z < 0) | (map_z >= Z)
    )
    # OOB voxels are overwritten from ``fixed`` below, so their sample
    # coordinates are don't-cares; neutralize them to the identity grid so
    # clip artifacts don't inflate the windowed kernel's per-group sample
    # bands (they'd force its full-gather fallback path)
    cx = jnp.where(oob, grid_x, jnp.clip(map_x, 0, X - 1))
    cy = jnp.where(oob, grid_y, jnp.clip(map_y, 0, Y - 1))
    cz = jnp.where(oob, grid_z, jnp.clip(map_z, 0, Z - 1))

    method = interpolation_method.lower()
    if method == "cubic":
        order = 3
        sample = map_coordinates_cubic
    elif method == "linear":
        order = 1
        sample = map_coordinates_linear
    else:
        raise ValueError("Unsupported interpolation method. Use 'linear' or 'cubic'.")

    from flowreg3d_tpu.ops import warp_pallas

    from flowreg3d_tpu.core.solver import pallas_kernel_on

    if use_pallas is not False and pallas_kernel_on("WARP") \
            and warp_pallas.windowed_ok((Z, Y, X), order):
        def sample(vol, cz, cy, cx, _o=order):
            from flowreg3d_tpu.core.solver import kernel_barrier

            return kernel_barrier(
                warp_pallas.map_coordinates_windowed(vol, cz, cy, cx, _o))

    chans = [sample(f2[..., c], cz, cy, cx) for c in range(C)]
    warped = jnp.stack(chans, axis=-1)
    warped = jnp.where(oob[..., None], f1, warped)
    if squeeze:
        warped = warped[..., 0]
    return warped
