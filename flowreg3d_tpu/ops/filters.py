"""Smoothing / normalization primitives, TPU-native.

Parity targets:
- ``normalize`` — reference util/image_processing_3D.py:12-92 (min-max to [0,1],
  global or per-channel, optionally using the reference volume's range).
- ``apply_gaussian_filter`` — reference util/image_processing_3D.py:95-162
  (MATLAB imgaussfilt3 semantics: per-channel separable Gaussian, sigma given
  as (sx,sy,sz[,st]) and applied reordered to (t,)z,y,x, boundary 'reflect'
  (== numpy 'symmetric'), truncate=4.0).
- ``median_filter_5x5x5`` — scipy.ndimage.median_filter(size=5, mode='mirror')
  as used on flow increments (reference core/optical_flow_3d.py:517-526).

TPU-first notes: Gaussians run as separable 1D convolutions that XLA fuses;
the 5^3 median builds the 125-tap neighborhood stack in z-slabs (bounded
memory) and reduces with jnp.median. The median is only exercised on pyramid
levels with min(size)>5 — at the default quality presets those levels are
small; a Pallas in-VMEM selection kernel is the planned upgrade for the
full-resolution path.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def normalize(arr, ref=None, channel_normalization="together", eps=1e-8):
    """Min-max normalize to [0,1]; ranges from ``ref`` when given.

    arr: (Z,Y,X,C) or (T,Z,Y,X,C) (or any rank for 'together').
    """
    arr = jnp.asarray(arr)
    if channel_normalization == "separate" and arr.ndim >= 4:
        src = arr if ref is None else jnp.asarray(ref)
        caxes = tuple(range(src.ndim - 1))
        min_val = src.min(axis=caxes)
        max_val = src.max(axis=caxes)
        rng = max_val - min_val
        safe = jnp.where(rng > 0, rng, 1.0)
        return (arr - min_val) / safe
    src = arr if ref is None else jnp.asarray(ref)
    min_val = src.min()
    max_val = src.max()
    if ref is None and channel_normalization == "separate":
        rng = max_val - min_val
        return jnp.where(rng > 0, (arr - min_val) / jnp.where(rng > 0, rng, 1.0),
                         arr - min_val)
    return (arr - min_val) / (max_val - min_val + eps)


@lru_cache(maxsize=128)
def _gauss_kernel_np(sigma: float, truncate: float) -> np.ndarray:
    """1D Gaussian taps matching scipy.ndimage.gaussian_filter1d."""
    if sigma <= 0:
        return np.ones(1, dtype=np.float64)
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _conv1d_axis(vol, kernel, axis, pad_mode="symmetric"):
    """1D convolution along ``axis`` with boundary padding (any-rank input)."""
    k = jnp.asarray(kernel, vol.dtype)
    taps = k.shape[0]
    if taps == 1:
        return vol * k[0]
    r = taps // 2
    pad = [(0, 0)] * vol.ndim
    pad[axis] = (r, r)
    xp = jnp.pad(vol, pad, mode=pad_mode)
    xm = jnp.moveaxis(xp, axis, -1)
    lead = xm.shape[:-1]
    n = xm.shape[-1]
    x2 = xm.reshape(int(np.prod(lead)) if lead else 1, 1, n)
    out = jax.lax.conv_general_dilated(
        x2, k[None, None, ::-1], window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    out = out.reshape(*lead, n - 2 * r)
    return jnp.moveaxis(out, -1, axis)


def gaussian_filter_3d(vol, sigma_zyx, truncate=4.0, pad_mode="symmetric"):
    """Separable Gaussian over the three leading axes of (Z,Y,X[,...])."""
    out = vol
    for axis, s in enumerate(sigma_zyx):
        if s and s > 0:
            out = _conv1d_axis(out, _gauss_kernel_np(float(s), float(truncate)),
                               axis, pad_mode)
    return out


def apply_gaussian_filter(arr, sigma, mode="symmetric", truncate=4.0):
    """MATLAB-imgaussfilt3-style filtering of (Z,Y,X,C) or (T,Z,Y,X,C).

    ``sigma``: (4,) = [sx,sy,sz,st] for all channels, or (C,4) per channel.
    Note scipy's mode 'reflect' equals numpy/jnp pad 'symmetric'.
    """
    arr = jnp.asarray(arr)
    sigma = np.asarray(sigma, dtype=np.float64)
    if arr.ndim == 4:  # (Z,Y,X,C)
        chans = []
        for c in range(arr.shape[3]):
            s = sigma[min(c, len(sigma) - 1), :3] if sigma.ndim == 2 else sigma[:3]
            s_zyx = (s[2], s[1], s[0]) if len(s) == 3 else tuple(s)
            chans.append(gaussian_filter_3d(arr[..., c], s_zyx, truncate, mode))
        return jnp.stack(chans, axis=-1)
    if arr.ndim == 5:  # (T,Z,Y,X,C)
        chans = []
        for c in range(arr.shape[4]):
            s = sigma[min(c, len(sigma) - 1)] if sigma.ndim == 2 else sigma
            s_tzyx = (s[3], s[2], s[1], s[0]) if len(s) == 4 else tuple(s)
            chans.append(gaussian_filter_3d(arr[..., c], s_tzyx, truncate, mode))
        return jnp.stack(chans, axis=-1)
    return gaussian_filter_3d(arr, tuple(np.atleast_1d(sigma)), truncate, mode)


class StreamingTemporalGaussian:
    """Causal (half-kernel) temporal Gaussian over a streamed batch axis.

    Parity: reference util/image_processing_3D.py:165-209
    (``gaussian_filter_1d_half_kernel``) — a deque of the last ``radius+1``
    frames convolved with the half Gaussian (current + past taps only,
    renormalized), so batch boundaries introduce no artifacts.
    """

    def __init__(self, sigma, truncate=4.0):
        from collections import deque

        self.sigma = float(sigma)
        if self.sigma <= 0:
            self.radius = 0
            self.kernel = np.ones(1, np.float64)
        else:
            self.radius = int(truncate * self.sigma + 0.5)
            x = np.arange(0, self.radius + 1, dtype=np.float64)
            k = np.exp(-0.5 * (x / self.sigma) ** 2)
            self.kernel = k / k.sum()  # taps: [now, -1, -2, ...]
        self._buffer = deque(maxlen=self.radius + 1)

    def reset(self):
        self._buffer.clear()

    def __call__(self, frame):
        """Filtered frame given the stream history (adds ``frame`` first)."""
        frame = np.asarray(frame, np.float64)
        self._buffer.appendleft(frame)
        taps = self.kernel[: len(self._buffer)]
        taps = taps / taps.sum()
        out = np.zeros_like(frame)
        for w, f in zip(taps, self._buffer):
            out += w * f
        return out

    def filter_batch(self, frames):
        """Apply to a (T, ...) batch, continuing the stream state."""
        return np.stack([self(frames[t]) for t in range(frames.shape[0])])


def gaussian_filter_1d_half_kernel(frames, sigma, truncate=4.0, state=None):
    """Functional wrapper: returns (filtered (T,...), state) for streaming."""
    state = state or StreamingTemporalGaussian(sigma, truncate)
    return state.filter_batch(np.asarray(frames)), state


def median_filter_5x5x5(x, slab=None):
    """Exact 5x5x5 median filter, boundary 'mirror' (jnp.pad 'reflect').

    The 125-tap neighborhood is materialized with ONE
    ``conv_general_dilated_patches`` op (cheap to trace/compile vs 125
    explicit slices) and reduced with ``jnp.median``; z-slabs bound the
    transient patch-stack memory.
    """
    x = jnp.asarray(x)
    Z, Y, X = x.shape
    xp = jnp.pad(x, 2, mode="reflect")
    if slab is None:
        # target <= ~256 MB transient patch stack in f32
        slab = max(1, min(Z, int(5e8 / (125 * Y * X * 4))))
    outs = []
    for z0 in range(0, Z, slab):
        zs = min(slab, Z - z0)
        part = jax.lax.dynamic_slice(xp, (z0, 0, 0), (zs + 4, Y + 4, X + 4))
        patches = jax.lax.conv_general_dilated_patches(
            part[None, None],  # (N=1, C=1, Z, Y, X)
            filter_shape=(5, 5, 5),
            window_strides=(1, 1, 1),
            padding="VALID",
            # HIGHEST: TPU convs default to bf16 passes, silently rounding
            # the extracted taps (~2e-3 median error)
            precision=jax.lax.Precision.HIGHEST,
        )  # (1, 125, zs, Y, X)
        outs.append(jnp.median(patches[0], axis=0))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
