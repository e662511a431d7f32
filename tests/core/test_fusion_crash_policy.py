"""The min_level<4 fusion-crash policy (core/pyramid.py, round 5).

The XLA TPU fusion pass SIGABRTs when multiple Pallas kernel families
coexist in a fine-level pyramid program (BENCH_JOBS jobs 215/225/240).
The shipped policy keeps the Pallas solver, routes the 5^3 median to XLA,
and raises the windowed-warp threshold — these tests pin the POLICY logic
(which kernels are selected), not the compiler behavior itself.
"""

import numpy as np
import pytest

import flowreg3d_tpu.core.pyramid as pyr_mod
from flowreg3d_tpu.ops import warp_pallas


def test_median_gate_blocks_pallas_median(monkeypatch):
    """median_pallas_ok=False must route to the XLA median even when the
    Pallas path would otherwise engage — the round-5 regression was the
    fallback re-enabling the kernel through _median's own env check."""
    import jax.numpy as jnp

    calls = {"batched": 0, "single": 0}

    def fake_batched(x, interpret=False):
        calls["batched"] += 1
        return x

    monkeypatch.setattr(
        "flowreg3d_tpu.ops.median_pallas.median_filter_5x5x5_pallas_batched",
        fake_batched)
    monkeypatch.setattr(
        "flowreg3d_tpu.ops.median_pallas.median_filter_5x5x5_pallas",
        lambda x, interpret=False: (calls.__setitem__(
            "single", calls["single"] + 1) or x))

    du = jnp.zeros((8, 10, 10))
    dv = jnp.zeros((8, 10, 10))
    dw = jnp.zeros((8, 10, 10))

    # gated OFF: neither Pallas entry point may be touched
    pyr_mod._median_increments(du, dv, dw, use_pallas=True,
                               median_pallas_ok=False)
    assert calls == {"batched": 0, "single": 0}

    # gated ON with use_pallas: the batched kernel runs once
    pyr_mod._median_increments(du, dv, dw, use_pallas=True,
                               median_pallas_ok=True)
    assert calls["batched"] == 1


def test_min_level_policy_flag():
    """build_pyramid_raw computes median_pallas_ok >= 4 semantics; pin the
    level_schedule-derived effective min level driving it."""
    _, eff0, _ = pyr_mod.level_schedule((64, 512, 512), 0.8, 50, 0)
    _, eff5, _ = pyr_mod.level_schedule((64, 512, 512), 0.8, 50, 5)
    assert eff0 == 0 and eff5 == 5
    assert (eff0 >= 4) is False
    assert (eff5 >= 4) is True


def test_warp_min_vox_floor():
    """The trace-scoped floor must override the lowered default inside
    fine-level pyramid traces and restore afterwards."""
    level5 = (24, 168, 168)  # > 4e5 voxels, Y % 8 == 0
    assert level5[0] * level5[1] * level5[2] >= 400000
    old = warp_pallas.min_vox_floor(1 << 21)
    try:
        assert warp_pallas.windowed_ok(level5) is False
    finally:
        warp_pallas.min_vox_floor(old)
    # outside the floor, the gate falls back to the (lowered) default;
    # on the CPU test backend pallas_enabled() is False so windowed_ok
    # still returns False — check the floor variable restored instead
    assert warp_pallas._MIN_VOX_FLOOR == old


def test_pyramid_min0_runs_with_policy():
    """End-to-end sanity: a min_level=0 pyramid traces and runs under the
    policy (CPU backend, XLA kernels throughout)."""
    from flowreg3d_tpu.core.pyramid import get_displacement

    f = np.random.default_rng(0).random((8, 24, 24)).astype(np.float32)
    m = np.roll(f, 1, axis=1)
    flow = np.asarray(get_displacement(f, m, iterations=4, levels=4,
                                       min_level=0))
    assert flow.shape == (8, 24, 24, 3)
    assert np.isfinite(flow).all()
    # 4 iterations on noise won't converge; motion-recovery quality is
    # pinned elsewhere (test_pyramid.py) — here only that the min0 trace
    # produces a sane field
    assert np.abs(flow).max() < 24
