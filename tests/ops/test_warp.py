"""Parity tests for backward warping vs scipy.ndimage.map_coordinates."""

import numpy as np
import pytest
from scipy.ndimage import map_coordinates

from flowreg3d_tpu.ops.warp import (
    imregister_wrapper,
    map_coordinates_cubic,
    map_coordinates_linear,
)


def _grids(shape):
    return np.meshgrid(*[np.arange(s, dtype=np.float64) for s in shape],
                       indexing="ij")


def test_cubic_parity_interior(rng):
    vol = rng.normal(size=(12, 14, 16)).astype(np.float64)
    gz, gy, gx = _grids(vol.shape)
    dz = rng.uniform(-2, 2, vol.shape)
    dy = rng.uniform(-2, 2, vol.shape)
    dx = rng.uniform(-2, 2, vol.shape)
    cz = np.clip(gz + dz, 0, vol.shape[0] - 1)
    cy = np.clip(gy + dy, 0, vol.shape[1] - 1)
    cx = np.clip(gx + dx, 0, vol.shape[2] - 1)
    want = map_coordinates(vol, [cz, cy, cx], order=3, mode="nearest")
    got = np.asarray(map_coordinates_cubic(
        vol.astype(np.float32), cz.astype(np.float32),
        cy.astype(np.float32), cx.astype(np.float32)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_linear_parity(rng):
    vol = rng.normal(size=(10, 12, 14)).astype(np.float64)
    gz, gy, gx = _grids(vol.shape)
    cz = np.clip(gz + rng.uniform(-3, 3, vol.shape), 0, vol.shape[0] - 1)
    cy = np.clip(gy + rng.uniform(-3, 3, vol.shape), 0, vol.shape[1] - 1)
    cx = np.clip(gx + rng.uniform(-3, 3, vol.shape), 0, vol.shape[2] - 1)
    want = map_coordinates(vol, [cz, cy, cx], order=1, mode="nearest")
    got = np.asarray(map_coordinates_linear(
        vol.astype(np.float32), cz.astype(np.float32),
        cy.astype(np.float32), cx.astype(np.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_identity_warp(rng):
    vol = rng.normal(size=(8, 9, 10)).astype(np.float32)
    zero = np.zeros(vol.shape, np.float32)
    out = np.asarray(imregister_wrapper(vol, zero, zero, zero, vol, "cubic"))
    np.testing.assert_allclose(out, vol, rtol=1e-4, atol=1e-4)


def test_oob_filled_from_fixed(rng):
    moving = rng.normal(size=(8, 9, 10)).astype(np.float32)
    fixed = rng.normal(size=(8, 9, 10)).astype(np.float32)
    # displace everything out of bounds in +x
    u = np.full(moving.shape, 100.0, np.float32)
    zero = np.zeros(moving.shape, np.float32)
    out = np.asarray(imregister_wrapper(moving, u, zero, zero, fixed, "linear"))
    np.testing.assert_allclose(out, fixed)


def test_integer_shift_linear(rng):
    vol = rng.normal(size=(8, 16, 16)).astype(np.float32)
    fixed = np.zeros_like(vol)
    u = np.full(vol.shape, 2.0, np.float32)   # sample from x+2
    zero = np.zeros(vol.shape, np.float32)
    out = np.asarray(imregister_wrapper(vol, u, zero, zero, fixed, "linear"))
    np.testing.assert_allclose(out[:, :, :-2], vol[:, :, 2:], rtol=1e-6)


def test_multichannel(rng):
    moving = rng.normal(size=(6, 8, 10, 2)).astype(np.float32)
    fixed = rng.normal(size=(6, 8, 10, 2)).astype(np.float32)
    zero = np.zeros(moving.shape[:3], np.float32)
    out = np.asarray(imregister_wrapper(moving, zero, zero, zero, fixed, "linear"))
    np.testing.assert_allclose(out, moving, rtol=1e-5, atol=1e-6)
