"""Rigid (dx,dy,dz) prealignment from phase correlation of projections.

Parity target: reference util/xcorr_prealignment.py:15-99 — channel collapse
by weight, mean-projections XY and XZ, optional downscale to ``target_hw``
via the fused Gauss-cubic resize, mean subtraction + Hann window, subpixel
phase correlation with upsampling and disambiguation, returning
``-[dx, dy, dz]`` (the backward-warp initialization convention).
"""

import numpy as np

from flowreg3d_tpu.ops.resize import imresize2d_gauss_cubic
from flowreg3d_tpu.ops.xcorr import phase_cross_correlation


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
    convention (util/xcorr_prealignment.py:99).
    """
    ref_vol = np.asarray(ref_vol)
    mov_vol = np.asarray(mov_vol)
    ref_vol, mov_vol = _collapse_channels(ref_vol, mov_vol, weight)

    Z, H, W = ref_vol.shape
    Th = H if target_hw is None else min(H, int(target_hw[0]))
    Tw = W if target_hw is None else min(W, int(target_hw[1]))
    sy, sx = H / Th, W / Tw

    pxy_r = ref_vol.mean(axis=0)
    pxy_m = mov_vol.mean(axis=0)
    if (Th, Tw) != (H, W):
        pxy_r = np.asarray(imresize2d_gauss_cubic(pxy_r, (Th, Tw)))
        pxy_m = np.asarray(imresize2d_gauss_cubic(pxy_m, (Th, Tw)))
    s_xy, _, _ = phase_cross_correlation(
        _windowed(pxy_r), _windowed(pxy_m), upsample_factor=up,
        normalization=normalization, disambiguate=disambiguate)
    dy = float(s_xy[0]) * sy
    dx = float(s_xy[1]) * sx

    Tz = Z if target_z is None else min(Z, int(target_z))
    sz = Z / Tz
    pxz_r = ref_vol.mean(axis=1)
    pxz_m = mov_vol.mean(axis=1)
    if Tz != Z or Tw != W:
        pxz_r = np.asarray(imresize2d_gauss_cubic(pxz_r, (Tz, Tw)))
        pxz_m = np.asarray(imresize2d_gauss_cubic(pxz_m, (Tz, Tw)))
    s_xz, _, _ = phase_cross_correlation(
        _windowed(pxz_r), _windowed(pxz_m), upsample_factor=up,
        normalization=normalization, disambiguate=disambiguate)
    dz = float(s_xz[0]) * sz

    return -np.array([dx, dy, dz], dtype=np.float32)
