"""Parity tests for the line-windowed Pallas warp (interpret mode on CPU).

Oracle: the row-gather XLA path (itself scipy-parity-tested in
tests/ops/test_warp.py) and scipy.ndimage.map_coordinates directly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from flowreg3d_tpu.ops import warp as W
from flowreg3d_tpu.ops.warp_pallas import (
    _windows_1d, map_coordinates_windowed, windowed_ok)

# heavy tier: interpret-mode Pallas kernels (minutes on 1 CPU)
pytestmark = pytest.mark.slow


def _grids(shape, u, v, w):
    Z, Y, X = shape
    zz, yy, xx = np.meshgrid(
        np.arange(Z), np.arange(Y), np.arange(X), indexing="ij")
    cz = jnp.asarray(np.clip(zz + w, 0, Z - 1), jnp.float32)
    cy = jnp.asarray(np.clip(yy + v, 0, Y - 1), jnp.float32)
    cx = jnp.asarray(np.clip(xx + u, 0, X - 1), jnp.float32)
    return cz, cy, cx


@pytest.mark.parametrize("order", [3, 1])
def test_smooth_flow_matches_row_gather(order):
    rng = np.random.default_rng(0)
    Z, Y, X = 6, 16, 20
    vol = jnp.asarray(rng.random((Z, Y, X)), jnp.float32)
    zz, yy, xx = np.meshgrid(
        np.arange(Z), np.arange(Y), np.arange(X), indexing="ij")
    cz, cy, cx = _grids((Z, Y, X), 1.3 + 0.01 * yy, -0.7 + 0.02 * zz,
                        0.4 + 0.015 * xx)
    got = map_coordinates_windowed(vol, cz, cy, cx, order=order,
                                   interpret=True)
    ref = (W.map_coordinates_cubic if order == 3
           else W.map_coordinates_linear)(vol, cz, cy, cx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_cubic_matches_scipy():
    scipy_nd = pytest.importorskip("scipy.ndimage")
    rng = np.random.default_rng(1)
    Z, Y, X = 5, 8, 24
    vol = rng.random((Z, Y, X)).astype(np.float32)
    cz, cy, cx = _grids((Z, Y, X), -1.1, 0.6, 0.9)
    got = map_coordinates_windowed(jnp.asarray(vol), cz, cy, cx, order=3,
                                   interpret=True)
    ref = scipy_nd.map_coordinates(
        vol.astype(np.float64),
        np.stack([np.asarray(cz), np.asarray(cy), np.asarray(cx)]),
        order=3, mode="nearest")
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("order", [3, 1])
def test_jagged_flow_falls_back_exactly(order, monkeypatch):
    """Window-violating flows must route to the row-gather fallback.

    Pinned to the bf16x3 contraction: the contract under test is the
    routing (fallback chunks bit-match the exact gather), and the 1e-5
    gate would conflate that with the int8 default's ~1e-4 quantization
    on the chunks that DO stay in-kernel."""
    monkeypatch.setenv("FLOWREG3D_WARP_INT8", "0")
    rng = np.random.default_rng(2)
    Z, Y, X = 6, 16, 20
    vol = jnp.asarray(rng.random((Z, Y, X)), jnp.float32)
    u = rng.random((Z, Y, X)) * 12 - 6
    v = rng.random((Z, Y, X)) * 12 - 6
    w = rng.random((Z, Y, X)) * 4 - 2
    cz, cy, cx = _grids((Z, Y, X), u, v, w)
    got = map_coordinates_windowed(vol, cz, cy, cx, order=order,
                                   interpret=True)
    ref = (W.map_coordinates_cubic if order == 3
           else W.map_coordinates_linear)(vol, cz, cy, cx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_x_subwindow_path():
    """X=512 with nsub=2 subwindows, including a large uniform shift."""
    rng = np.random.default_rng(3)
    Z, Y, X = 4, 8, 512
    vol = jnp.asarray(rng.random((Z, Y, X)), jnp.float32)
    zz, yy, xx = np.meshgrid(
        np.arange(Z), np.arange(Y), np.arange(X), indexing="ij")
    cz, cy, cx = _grids((Z, Y, X), 37.5 + 0.01 * xx, -1.2 + 0.02 * zz, 0.7)
    got = map_coordinates_windowed(vol, cz, cy, cx, order=3, interpret=True)
    ref = W.map_coordinates_cubic(vol, cz, cy, cx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("order", [3, 1])
def test_chunk_group_fallback_path(order):
    """A chunk whose z-span misses the small sub-window but fits the group
    window must take the in-kernel group-window path (vbit=0), not the
    row-gather fallback: group span stays within tier-2's (28, 48) envelope
    by construction while one line's span exceeds Dzl=16."""
    rng = np.random.default_rng(4)
    Z, Y, X = 32, 16, 20
    vol = jnp.asarray(rng.random((Z, Y, X)), jnp.float32)
    zz, yy, xx = np.meshgrid(
        np.arange(Z), np.arange(Y), np.arange(X), indexing="ij")
    # one rough line: z-coordinate swings 14 rows along x in lines y==3
    w = np.where(yy == 3, 14.0 * np.sin(np.pi * xx / (X - 1)), 0.2 * zz / Z)
    cz, cy, cx = _grids((Z, Y, X), 0.3, -0.6, w)
    got = map_coordinates_windowed(vol, cz, cy, cx, order=order,
                                   interpret=True)
    ref = (W.map_coordinates_cubic if order == 3
           else W.map_coordinates_linear)(vol, cz, cy, cx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_window_validity_flags():
    i0 = jnp.asarray(
        np.stack([np.full(40, 3), np.r_[np.full(20, 0), np.full(20, 30)]]),
        jnp.int32)
    w, valid = _windows_1d(i0, 4, 8, 64, 1)
    assert bool(valid[0]) and not bool(valid[1])
    assert int(w[0]) == 3


def test_windowed_ok_gates():
    assert not windowed_ok((4, 12, 64))          # Y % 8 != 0
    assert not windowed_ok((64, 512, 2048))      # X too wide for VMEM
    assert not windowed_ok((8, 16, 16))          # too small to pay off
    # scalar-prefetch SMEM budget: X=1024 at 64x512 lines needs a
    # (2 + 9*8)-row table over 4096 groups = 1.21 MB > ~1 MB SMEM
    assert not windowed_ok((64, 512, 1024))


def test_geometry_vmem_filter():
    """Tiers whose double-buffered window would blow VMEM at this Xp must
    be dropped from the lax.cond chain (every branch compiles)."""
    from flowreg3d_tpu.ops import warp_pallas as wp

    for Xp in (640, 1152, 1280):
        kept = [g for g in wp._GEOMS
                if 2 * 2 * g[0] * g[1] * Xp * 2 <= int(12.5 * 2 ** 20)]
        # the smallest tier always survives so wide-X volumes still get a
        # windowed fast path before the row-gather fallback
        assert kept and kept[0] == wp._GEOMS[0]
        if Xp <= 640:
            assert len(kept) == len(wp._GEOMS)


def test_fits_whole_plane_budgets_actual_scratch():
    from flowreg3d_tpu.core.solver_pallas import (
        _fits_whole_plane, _pick_slab2)

    # near-gate plane: whole-plane admitted => sz=1 scratch must fit 13MiB
    for m, n in [(176, 256), (344, 256), (256, 384)]:
        if _fits_whole_plane(m, n):
            sz = _pick_slab2(m - 2 if m > 2 else 1, m, n)
            assert m * n * 4 * (27 * sz + 12) <= 13 * 2 ** 20
    # the case from review: 416x256 planes must route to the y-tiled path
    assert not _fits_whole_plane(416, 256)
    assert not _fits_whole_plane(416, 256, planes=47)


@pytest.mark.parametrize("order", [3, 1])
def test_int8_fixed_point_path(order, monkeypatch):
    """int8 two-limb contraction stays within ~1e-3 of the exact warp.

    The int8 path trades the hi/lo bf16 3-pass contraction for three int8
    limb products (error ~1e-4 of the volume max); gated by env at trace
    time so one process can A/B it.
    """
    monkeypatch.setenv("FLOWREG3D_WARP_INT8", "1")
    rng = np.random.default_rng(1)
    Z, Y, X = 6, 16, 20
    vol = jnp.asarray(rng.random((Z, Y, X)), jnp.float32)
    zz, yy, xx = np.meshgrid(
        np.arange(Z), np.arange(Y), np.arange(X), indexing="ij")
    cz, cy, cx = _grids((Z, Y, X), 1.3 + 0.01 * yy, -0.7 + 0.02 * zz,
                        0.4 + 0.015 * xx)
    got = map_coordinates_windowed(vol, cz, cy, cx, order=order,
                                   interpret=True)
    ref = (W.map_coordinates_cubic if order == 3
           else W.map_coordinates_linear)(vol, cz, cy, cx)
    # on-chip A/B measured 5.0e-5 max abs vs bf16x3 (BENCH_JOBS job_103);
    # 4e-4 gives ~8x margin over the measured error while still failing
    # loudly if the limb split regresses toward bf16x2-class (1.4e-3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=4e-4, atol=4e-4)
