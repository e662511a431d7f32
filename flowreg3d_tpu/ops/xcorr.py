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


def _overlap_corr_traced(ref, mov, sr, sc):
    """Pearson correlation of ref with integer-shifted mov on the overlap.

    Traced equivalent of the slice-based host formulation: ``jnp.roll`` by
    the (dynamic) integer shift places mov[i-sr, j-sc] at (i, j); the
    overlap region is expressed as a validity mask and the correlation
    computed with masked means/sums.
    """
    H, W = ref.shape
    rows = jnp.arange(H, dtype=jnp.int32)[:, None]
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]
    mov_sh = jnp.roll(jnp.roll(mov, sr, axis=0), sc, axis=1)
    valid = ((rows >= jnp.maximum(sr, 0)) & (rows < H + jnp.minimum(sr, 0))
             & (cols >= jnp.maximum(sc, 0)) & (cols < W + jnp.minimum(sc, 0)))
    cnt = jnp.maximum(valid.sum(), 1).astype(ref.dtype)
    validf = valid.astype(ref.dtype)
    am = (ref * validf).sum() / cnt
    bm = (mov_sh * validf).sum() / cnt
    a = (ref - am) * validf
    b = (mov_sh - bm) * validf
    denom = jnp.sqrt((a * a).sum() * (b * b).sum())
    score = jnp.where(denom > 0, (a * b).sum() / denom, -jnp.inf)
    too_small = ((H - jnp.abs(sr)) < 2) | ((W - jnp.abs(sc)) < 2)
    return jnp.where(too_small, -jnp.inf, score)


def _disambiguate_traced(ref, mov, shift):
    """Resolve the n-periodic shift ambiguity by real-space correlation.

    Traced equivalent of skimage's ``disambiguate=True``: tests the four
    candidate shifts (s mod n, s mod n - n per axis) against the Pearson
    correlation of the overlapping regions and keeps the best.
    """
    H, W = ref.shape
    cr = jnp.stack([shift[0] % H, (shift[0] % H) - H])
    cc = jnp.stack([shift[1] % W, (shift[1] % W) - W])
    cand_r = jnp.stack([cr[0], cr[0], cr[1], cr[1]])
    cand_c = jnp.stack([cc[0], cc[1], cc[0], cc[1]])
    scores = jnp.stack([
        _overlap_corr_traced(ref, mov,
                             jnp.round(cand_r[k]).astype(jnp.int32),
                             jnp.round(cand_c[k]).astype(jnp.int32))
        for k in range(4)])
    best = jnp.argmax(scores)
    return jnp.stack([cand_r[best], cand_c[best]])


@partial(jax.jit, static_argnames=("upsample_factor", "normalization",
                                   "disambiguate"))
def phase_xcorr_shift(ref, mov, upsample_factor=1, normalization="phase",
                      disambiguate=False):
    """Fully-traced shift (row, col) registering mov onto ref.

    Jit-compatible core of ``phase_cross_correlation`` — composable into
    larger programs (the on-device cc prealignment pipeline)."""
    ref = jnp.asarray(ref, jnp.float32)
    mov = jnp.asarray(mov, jnp.float32)
    shift = _phase_xcorr_core(ref, mov, upsample_factor=int(upsample_factor),
                              normalization=normalization)
    if disambiguate:
        shift = _disambiguate_traced(ref, mov, shift)
    return shift


def phase_cross_correlation(reference_image, moving_image, upsample_factor=1,
                            normalization="phase", disambiguate=False):
    """Shift (row, col) that registers moving_image onto reference_image.

    Matches skimage's convention: reference ≈ shift(moving, +shift).
    Returns (shift, error, phasediff) with error/phasediff as placeholders
    (the reference pipeline only uses the shift).
    """
    ref = np.asarray(reference_image, np.float32)
    mov = np.asarray(moving_image, np.float32)
    shift = np.asarray(phase_xcorr_shift(
        ref, mov, upsample_factor=int(upsample_factor),
        normalization=normalization, disambiguate=bool(disambiguate)),
        np.float32)
    return shift, 0.0, 0.0
