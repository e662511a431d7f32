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
- **Evaluation** is a 64-tap (tricubic) / 8-tap (trilinear) gather with
  per-voxel weights, expressed as flat ``jnp.take`` so XLA emits fused
  dynamic-gathers; everything stays in one jit region.
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
    c = jnp.einsum("zyx,wx->zyw", vol.astype(dtype), px, precision=hp)
    c = jnp.einsum("zyx,hy->zhx", c, py, precision=hp)
    c = jnp.einsum("zyx,dz->dyx", c, pz, precision=hp)
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


def _gather3d(flat, zi, yi, xi, Y, X):
    lin = (zi * Y + yi) * X + xi
    return jnp.take(flat, lin.reshape(-1), mode="clip").reshape(lin.shape)


def map_coordinates_cubic(vol, coord_z, coord_y, coord_x):
    """Tricubic B-spline sampling of vol (Z,Y,X) at the given coordinate grids.

    Equivalent to scipy.ndimage.map_coordinates(vol, [cz,cy,cx], order=3,
    mode='nearest') for in-range (clipped) coordinates.
    """
    Z, Y, X = vol.shape
    c = bspline_prefilter(vol)  # (Z+3, Y+3, X+3), tap i at index i+1
    flat = c.reshape(-1)

    z0 = jnp.floor(coord_z)
    y0 = jnp.floor(coord_y)
    x0 = jnp.floor(coord_x)
    tz = coord_z - z0
    ty = coord_y - y0
    tx = coord_x - x0
    z0 = z0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    wz = _bspline_weights(tz)
    wy = _bspline_weights(ty)
    wx = _bspline_weights(tx)

    # tap o-1 (o=0..3) lives at ext index z0 + o; coords are pre-clipped so
    # indices stay in range without clamping.
    out = jnp.zeros_like(coord_z, dtype=vol.dtype)
    for a in range(4):
        acc_y = jnp.zeros_like(out)
        for b in range(4):
            acc_x = jnp.zeros_like(out)
            for d in range(4):
                acc_x = acc_x + wx[d] * _gather3d(
                    flat, z0 + a, y0 + b, x0 + d, Y + 3, X + 3)
            acc_y = acc_y + wy[b] * acc_x
        out = out + wz[a] * acc_y
    return out


def map_coordinates_linear(vol, coord_z, coord_y, coord_x):
    """Trilinear sampling of vol (Z,Y,X), mode='nearest' for clipped coords."""
    Z, Y, X = vol.shape
    flat = vol.reshape(-1)
    z0 = jnp.clip(jnp.floor(coord_z), 0, Z - 1)
    y0 = jnp.clip(jnp.floor(coord_y), 0, Y - 1)
    x0 = jnp.clip(jnp.floor(coord_x), 0, X - 1)
    tz = coord_z - z0
    ty = coord_y - y0
    tx = coord_x - x0
    z0 = z0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    z1 = jnp.clip(z0 + 1, 0, Z - 1)
    y1 = jnp.clip(y0 + 1, 0, Y - 1)
    x1 = jnp.clip(x0 + 1, 0, X - 1)

    def g(zi, yi, xi):
        return _gather3d(flat, zi, yi, xi, Y, X)

    c000 = g(z0, y0, x0)
    c001 = g(z0, y0, x1)
    c010 = g(z0, y1, x0)
    c011 = g(z0, y1, x1)
    c100 = g(z1, y0, x0)
    c101 = g(z1, y0, x1)
    c110 = g(z1, y1, x0)
    c111 = g(z1, y1, x1)

    c00 = c000 * (1 - tx) + c001 * tx
    c01 = c010 * (1 - tx) + c011 * tx
    c10 = c100 * (1 - tx) + c101 * tx
    c11 = c110 * (1 - tx) + c111 * tx
    c0 = c00 * (1 - ty) + c01 * ty
    c1 = c10 * (1 - ty) + c11 * ty
    return c0 * (1 - tz) + c1 * tz


def imregister_wrapper(f2_level, u, v, w, f1_level, interpolation_method="cubic"):
    """Backward-warp moving volume by (u,v,w); OOB voxels come from fixed.

    Parity: reference core/optical_flow_3d.py:22-74. Shapes (Z,Y,X) or
    (Z,Y,X,C); u/v/w are (Z,Y,X) displacements in x/y/z voxel units.
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
    cx = jnp.clip(map_x, 0, X - 1)
    cy = jnp.clip(map_y, 0, Y - 1)
    cz = jnp.clip(map_z, 0, Z - 1)

    method = interpolation_method.lower()
    if method == "cubic":
        sample = map_coordinates_cubic
    elif method == "linear":
        sample = map_coordinates_linear
    else:
        raise ValueError("Unsupported interpolation method. Use 'linear' or 'cubic'.")

    chans = [sample(f2[..., c], cz, cy, cx) for c in range(C)]
    warped = jnp.stack(chans, axis=-1)
    warped = jnp.where(oob[..., None], f1, warped)
    if squeeze:
        warped = warped[..., 0]
    return warped
