"""Parity tests for Gaussian / median filters and normalize vs scipy."""

import numpy as np
from scipy.ndimage import gaussian_filter, median_filter

from flowreg3d_tpu.ops.filters import (
    apply_gaussian_filter,
    gaussian_filter_3d,
    median_filter_5x5x5,
    normalize,
)


def test_gaussian_parity_3d(rng):
    vol = rng.normal(size=(12, 16, 20)).astype(np.float64)
    want = gaussian_filter(vol, sigma=(1.5, 1.0, 2.0), mode="reflect",
                           truncate=4.0)
    got = np.asarray(gaussian_filter_3d(vol.astype(np.float32), (1.5, 1.0, 2.0)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_apply_gaussian_filter_4d_sigma_order(rng):
    # sigma given as (sx, sy, sz) must be applied as (sz, sy, sx) on (Z,Y,X)
    vol = rng.normal(size=(10, 12, 14, 2)).astype(np.float64)
    sigma = np.array([2.0, 1.0, 0.5])  # sx=2, sy=1, sz=0.5
    got = np.asarray(apply_gaussian_filter(vol.astype(np.float32), sigma))
    for c in range(2):
        want = gaussian_filter(vol[..., c], sigma=(0.5, 1.0, 2.0),
                               mode="reflect", truncate=4.0)
        np.testing.assert_allclose(got[..., c], want, rtol=1e-4, atol=1e-5)


def test_apply_gaussian_filter_per_channel(rng):
    vol = rng.normal(size=(8, 10, 12, 2)).astype(np.float64)
    sigma = np.array([[1.0, 1.0, 1.0, 0.0], [2.0, 0.5, 1.5, 0.0]])
    got = np.asarray(apply_gaussian_filter(vol.astype(np.float32), sigma))
    want0 = gaussian_filter(vol[..., 0], sigma=(1.0, 1.0, 1.0), mode="reflect")
    want1 = gaussian_filter(vol[..., 1], sigma=(1.5, 0.5, 2.0), mode="reflect")
    np.testing.assert_allclose(got[..., 0], want0, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got[..., 1], want1, rtol=1e-4, atol=1e-5)


def test_median_parity(rng):
    vol = rng.normal(size=(10, 12, 14)).astype(np.float32)
    want = median_filter(vol, size=(5, 5, 5), mode="mirror")
    got = np.asarray(median_filter_5x5x5(vol))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_median_slabbed(rng):
    vol = rng.normal(size=(13, 9, 11)).astype(np.float32)
    want = median_filter(vol, size=(5, 5, 5), mode="mirror")
    got = np.asarray(median_filter_5x5x5(vol, slab=3))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_normalize_together(rng):
    arr = rng.uniform(10, 50, size=(6, 8, 10, 2))
    out = np.asarray(normalize(arr))
    assert out.min() >= 0 and out.max() <= 1.0 + 1e-6
    np.testing.assert_allclose(
        out, (arr - arr.min()) / (arr.max() - arr.min() + 1e-8), rtol=1e-5)


def test_normalize_with_reference(rng):
    arr = rng.uniform(0, 1, size=(6, 8, 10, 1))
    ref = rng.uniform(-1, 2, size=(6, 8, 10, 1))
    out = np.asarray(normalize(arr, ref=ref))
    want = (arr - ref.min()) / (ref.max() - ref.min() + 1e-8)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)


def test_normalize_separate(rng):
    arr = rng.uniform(0, 1, size=(6, 8, 10, 2))
    arr[..., 1] *= 100
    out = np.asarray(normalize(arr, channel_normalization="separate"))
    for c in range(2):
        ch = arr[..., c]
        want = (ch - ch.min()) / (ch.max() - ch.min())
        np.testing.assert_allclose(out[..., c], want, rtol=1e-4, atol=1e-5)
