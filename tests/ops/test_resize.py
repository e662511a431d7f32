"""Parity tests for the fused Gauss-cubic resize vs an independent numpy oracle."""

import numpy as np
import pytest

from flowreg3d_tpu.ops.resize import (
    imresize2d_gauss_cubic,
    imresize_fused_gauss_cubic3D,
    resize_volume,
)

A = -0.75


def _cubic(x):
    ax = abs(x)
    if ax < 1.0:
        return (A + 2.0) * ax**3 - (A + 3.0) * ax**2 + 1.0
    if ax < 2.0:
        return A * ax**3 - 5.0 * A * ax**2 + 8.0 * A * ax - 4.0 * A
    return 0.0


def _reflect(j, n):
    if n <= 1:
        return 0
    while j < 0 or j >= n:
        j = -j - 1 if j < 0 else 2 * n - 1 - j
    return j


def _oracle_tables(in_len, out_len, sigma):
    scale = out_len / in_len
    if sigma <= 0.0:
        R = 0
        g = np.array([1.0], dtype=np.float32)
    else:
        R = int(np.ceil(2.0 * sigma))
        x = np.arange(-R, R + 1, dtype=np.float32)
        g = np.exp(-0.5 * (x / sigma) ** 2).astype(np.float32)
        g /= g.sum()
    P = 2 * R + 4
    idx = np.empty((out_len, P), np.int64)
    wt = np.empty((out_len, P), np.float64)
    for i in range(out_len):
        x = (i + 0.5) / scale - 0.5
        left = int(np.floor(x - 2.0)) - R
        for p in range(P):
            j = left + p
            idx[i, p] = _reflect(j, in_len)
            d = x - j
            acc = 0.0
            for u in range(-R, R + 1):
                acc += g[u + R] * _cubic(d - u)
            wt[i, p] = acc
        wt[i] /= wt[i].sum()
    return idx, wt


def _oracle_resize_axis(src, out_len, sigma, axis):
    idx, wt = _oracle_tables(src.shape[axis], out_len, sigma)
    taken = np.take(src, idx, axis=axis)  # inserts a taps axis after `axis`
    wshape = [1] * taken.ndim
    wshape[axis] = out_len
    wshape[axis + 1] = wt.shape[1]
    return (taken * wt.reshape(wshape)).sum(axis=axis + 1)


def _oracle_resize(vol, size, sigma_coeff=0.6, per_axis=False):
    od, oh, ow = size
    sz = od / vol.shape[0]
    sy = oh / vol.shape[1]
    sx = ow / vol.shape[2]
    if per_axis:
        sigz = sigma_coeff / sz if sz < 1 else 0.0
        sigy = sigma_coeff / sy if sy < 1 else 0.0
        sigx = sigma_coeff / sx if sx < 1 else 0.0
    else:
        s = min(sx, sy, sz)
        sigz = sigy = sigx = (sigma_coeff / s) if s < 1 else 0.0
    x = _oracle_resize_axis(vol.astype(np.float64), ow, sigx, 2)
    x = _oracle_resize_axis(x, oh, sigy, 1)
    x = _oracle_resize_axis(x, od, sigz, 0)
    return x


@pytest.mark.parametrize("in_shape,out_shape", [
    ((16, 20, 24), (10, 13, 15)),   # downsample
    ((10, 12, 8), (16, 20, 24)),    # upsample
    ((12, 16, 16), (12, 16, 16)),   # same size
    ((15, 17, 19), (9, 21, 13)),    # mixed
])
def test_resize_parity(rng, in_shape, out_shape):
    vol = rng.normal(size=in_shape).astype(np.float32)
    got = np.asarray(resize_volume(vol, out_shape))
    want = _oracle_resize(vol, out_shape)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_resize_channels(rng):
    vol = rng.normal(size=(12, 14, 16, 2)).astype(np.float32)
    got = np.asarray(resize_volume(vol, (8, 9, 10)))
    for c in range(2):
        want = _oracle_resize(vol[..., c], (8, 9, 10))
        np.testing.assert_allclose(got[..., c], want, rtol=2e-4, atol=2e-4)


def test_resize_constant_preserved(rng):
    vol = np.full((12, 12, 12), 3.25, np.float32)
    out = np.asarray(resize_volume(vol, (7, 9, 5)))
    np.testing.assert_allclose(out, 3.25, rtol=1e-5)


def test_integer_dtype_round_clip(rng):
    vol = rng.integers(0, 255, size=(10, 12, 14)).astype(np.uint8)
    out = imresize_fused_gauss_cubic3D(vol, (6, 8, 9))
    assert np.asarray(out).dtype == np.uint8


def test_2d_wrapper(rng):
    img = rng.normal(size=(20, 24)).astype(np.float32)
    out = imresize2d_gauss_cubic(img, (10, 12))
    assert out.shape == (10, 12)
    want = _oracle_resize(img[None], (1, 10, 12), per_axis=True)[0]
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-4)
