"""Subpixel phase cross-correlation, TPU-native (jnp.fft + MXU matmul DFT).

Replaces skimage.registration.phase_cross_correlation for this framework
(the reference calls it in util/xcorr_prealignment.py:61,92). Algorithm:
cross-power spectrum (optionally phase-normalized), coarse peak from the
inverse FFT, then Guizar-Sicairos upsampled-DFT refinement expressed as two
small matrix multiplies (runs on the MXU). Optional real-space disambiguation
mirrors skimage's ``disambiguate=True`` (resolves the n-periodic ambiguity
that windowed/normalized spectra introduce).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _upsampled_dft_2d(data, region, up, offsets):
    """Upsampled inverse DFT of ``data`` (freq domain) over a small region.

    data: (H, W) complex spectrum; region: (rh, rw) static ints;
    offsets: (2,) floats. Returns (rh, rw) complex.
    """
    H, W = data.shape
    rh, rw = region

    def kernel(n, r, offset):
        freqs = jnp.fft.fftfreq(n) * n  # 0..n/2, -n/2..-1
        samples = jnp.arange(r) - offset
        return jnp.exp((-2j * jnp.pi / (n * up))
                       * samples[:, None] * freqs[None, :])

    kr = kernel(H, rh, offsets[0])
    kc = kernel(W, rw, offsets[1])
    return kr @ data @ kc.T


@partial(jax.jit, static_argnames=("upsample_factor", "normalization"))
def _phase_xcorr_core(ref, mov, upsample_factor=1, normalization="phase"):
    ref = jnp.asarray(ref, jnp.float32)
    mov = jnp.asarray(mov, jnp.float32)
    shape = jnp.asarray(ref.shape, jnp.float32)

    F1 = jnp.fft.fft2(ref)
    F2 = jnp.fft.fft2(mov)
    R = F1 * jnp.conj(F2)
    if normalization == "phase":
        R = R / jnp.maximum(jnp.abs(R), 1e-20)

    cc = jnp.fft.ifft2(R)
    flat = jnp.argmax(jnp.abs(cc))
    peak = jnp.stack(jnp.unravel_index(flat, cc.shape)).astype(jnp.float32)
    shift = jnp.where(peak > shape / 2.0, peak - shape, peak)

    if upsample_factor > 1:
        up = float(upsample_factor)
        shift = jnp.round(shift * up) / up
        region = int(np.ceil(up * 1.5))
        dftshift = float(np.fix(region / 2.0))
        offsets = dftshift - shift * up
        cc_up = jnp.conj(_upsampled_dft_2d(jnp.conj(R), (region, region), up,
                                           offsets))
        flat_up = jnp.argmax(jnp.abs(cc_up))
        peak_up = jnp.stack(
            jnp.unravel_index(flat_up, cc_up.shape)).astype(jnp.float32)
        shift = shift + (peak_up - dftshift) / up
    return shift


def _overlap_corr(ref, mov, shift_int):
    """Pearson correlation of ref with integer-shifted mov on the overlap."""
    sr, sc = int(shift_int[0]), int(shift_int[1])
    H, W = ref.shape
    r0, r1 = max(0, sr), min(H, H + sr)
    c0, c1 = max(0, sc), min(W, W + sc)
    if r1 - r0 < 2 or c1 - c0 < 2:
        return -np.inf
    a = ref[r0:r1, c0:c1]
    b = mov[r0 - sr:r1 - sr, c0 - sc:c1 - sc]
    a = a - a.mean()
    b = b - b.mean()
    denom = np.sqrt((a * a).sum() * (b * b).sum())
    return float((a * b).sum() / denom) if denom > 0 else -np.inf


def phase_cross_correlation(reference_image, moving_image, upsample_factor=1,
                            normalization="phase", disambiguate=False):
    """Shift (row, col) that registers moving_image onto reference_image.

    Matches skimage's convention: reference ≈ shift(moving, +shift).
    Returns (shift, error, phasediff) with error/phasediff as placeholders
    (the reference pipeline only uses the shift).
    """
    ref = np.asarray(reference_image, np.float32)
    mov = np.asarray(moving_image, np.float32)
    shift = np.asarray(_phase_xcorr_core(
        ref, mov, upsample_factor=int(upsample_factor),
        normalization=normalization))

    if disambiguate:
        H, W = ref.shape
        cands_r = {shift[0] % H, (shift[0] % H) - H}
        cands_c = {shift[1] % W, (shift[1] % W) - W}
        best, best_score = None, -np.inf
        for cr in cands_r:
            for cc in cands_c:
                score = _overlap_corr(ref, mov,
                                      (round(float(cr)), round(float(cc))))
                if score > best_score:
                    best_score, best = score, (cr, cc)
        shift = np.asarray(best, np.float32)

    return shift, 0.0, 0.0
