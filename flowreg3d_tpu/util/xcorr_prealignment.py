"""Rigid (dx,dy,dz) prealignment from phase correlation of projections.

Parity target: reference util/xcorr_prealignment.py:15-99 — channel collapse
by weight, mean-projections XY and XZ, optional downscale to ``target_hw``
via the fused Gauss-cubic resize, mean subtraction + Hann window, subpixel
phase correlation with upsampling and disambiguation, returning
``-[dx, dy, dz]`` (the backward-warp initialization convention).

The estimator is fully traced (``estimate_rigid_xcorr_traced``) so the
whole cc-initialization pipeline — warp by w_init, rigid xcorr, combine,
warp again (reference parallelization/sequential_3d.py:89-150) — compiles
into ONE device program per frame instead of six host-synchronized
dispatches. ``estimate_rigid_xcorr_3d`` is the host-facing wrapper.
"""

import jax.numpy as jnp
import numpy as np

from flowreg3d_tpu.ops.resize import resize_volume
from flowreg3d_tpu.ops.xcorr import phase_xcorr_shift


def _collapse_channels_traced(vol, weight_vec):
    """(Z,Y,X[,C]) -> (Z,Y,X) by weighted channel mean (traced)."""
    if vol.ndim == 3:
        return vol
    if vol.shape[3] == 1:
        return vol[..., 0]
    if weight_vec is None:
        return vol.mean(axis=3)
    w = jnp.asarray(weight_vec, vol.dtype).reshape(-1)
    w = w / w.sum()
    return jnp.tensordot(vol, w, axes=([3], [0]))


def _windowed_traced(img):
    img = jnp.asarray(img, jnp.float32)
    img = img - img.mean()
    h0 = jnp.asarray(np.hanning(img.shape[0]), jnp.float32)
    h1 = jnp.asarray(np.hanning(img.shape[1]), jnp.float32)
    return img * (h0[:, None] * h1[None, :])


def _resize2d_traced(img, out_hw):
    return resize_volume(img[None, ...], (1, out_hw[0], out_hw[1]),
                         per_axis=True)[0]


def estimate_rigid_xcorr_traced(ref_vol, mov_vol, target_hw=(256, 256),
                                target_z=None, up=10, normalization="phase",
                                disambiguate=True, weight_vec=None):
    """Traced rigid-shift estimate; ref/mov are (Z,Y,X) or (Z,Y,X,C).

    ``target_hw``/``target_z``/``up``/``normalization``/``disambiguate``
    are static; ``weight_vec`` (channel collapse weights) may be a traced
    array. Returns ``-[dx, dy, dz]`` as a (3,) float32.
    """
    ref_vol = _collapse_channels_traced(jnp.asarray(ref_vol), weight_vec)
    mov_vol = _collapse_channels_traced(jnp.asarray(mov_vol), weight_vec)

    Z, H, W = ref_vol.shape
    Th = H if target_hw is None else min(H, int(target_hw[0]))
    Tw = W if target_hw is None else min(W, int(target_hw[1]))
    sy, sx = H / Th, W / Tw

    pxy_r = ref_vol.mean(axis=0)
    pxy_m = mov_vol.mean(axis=0)
    if (Th, Tw) != (H, W):
        pxy_r = _resize2d_traced(pxy_r, (Th, Tw))
        pxy_m = _resize2d_traced(pxy_m, (Th, Tw))
    s_xy = phase_xcorr_shift(
        _windowed_traced(pxy_r), _windowed_traced(pxy_m),
        upsample_factor=int(up), normalization=normalization,
        disambiguate=bool(disambiguate))
    dy = s_xy[0] * sy
    dx = s_xy[1] * sx

    Tz = Z if target_z is None else min(Z, int(target_z))
    sz = Z / Tz
    pxz_r = ref_vol.mean(axis=1)
    pxz_m = mov_vol.mean(axis=1)
    if Tz != Z or Tw != W:
        pxz_r = _resize2d_traced(pxz_r, (Tz, Tw))
        pxz_m = _resize2d_traced(pxz_m, (Tz, Tw))
    s_xz = phase_xcorr_shift(
        _windowed_traced(pxz_r), _windowed_traced(pxz_m),
        upsample_factor=int(up), normalization=normalization,
        disambiguate=bool(disambiguate))
    dz = s_xz[0] * sz

    return -jnp.stack([dx, dy, dz]).astype(jnp.float32)


def _collapse_channels(ref_vol, mov_vol, weight):
    if ref_vol.ndim == 4 and ref_vol.shape[3] > 1:
        if weight is not None:
            w = np.asarray(weight, np.float32).reshape(-1)
            w = w / w.sum()
            return (np.tensordot(ref_vol, w, axes=([3], [0])),
                    np.tensordot(mov_vol, w, axes=([3], [0])))
        return ref_vol.mean(axis=3), mov_vol.mean(axis=3)
    if ref_vol.ndim == 4:
        return ref_vol[..., 0], mov_vol[..., 0]
    return ref_vol, mov_vol


def _windowed(img):
    img = np.asarray(img, np.float32)
    img = img - img.mean()
    h0 = np.hanning(img.shape[0]).astype(np.float32)
    h1 = np.hanning(img.shape[1]).astype(np.float32)
    return img * (h0[:, None] * h1[None, :])


def estimate_rigid_xcorr_3d(ref_vol, mov_vol, target_hw=(256, 256),
                            target_z=None, up=10, normalization="phase",
                            disambiguate=True, weight=None):
    """Estimate the rigid shift of ``mov_vol`` relative to ``ref_vol``.

    Returns ``-[dx, dy, dz]`` (float32), i.e. the backward-warp displacement
    that maps moving onto reference — matching the reference's sign
    convention (util/xcorr_prealignment.py:99). Host wrapper around the
    traced estimator.
    """
    ref_vol = np.asarray(ref_vol)
    mov_vol = np.asarray(mov_vol)
    wvec = None
    if ref_vol.ndim == 4 and ref_vol.shape[3] > 1 and weight is not None:
        wvec = jnp.asarray(np.asarray(weight, np.float32).reshape(-1))
    if isinstance(target_hw, int):
        target_hw = (target_hw, target_hw)
    return np.asarray(estimate_rigid_xcorr_traced(
        ref_vol, mov_vol, target_hw=target_hw, target_z=target_z, up=up,
        normalization=normalization, disambiguate=disambiguate,
        weight_vec=wvec), np.float32)
