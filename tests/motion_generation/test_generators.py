"""Tests for synthetic motion generation (parity with reference presets)."""

import numpy as np
import pytest

from flowreg3d_tpu.motion_generation import (
    Expansion3DFlowAugmentor,
    FlowGenerator3D,
    Jitter3DFlowAugmentor,
    Random3DFlowAugmentor,
    Rotational3DFlowAugmentor,
    Shear3DFlowAugmentor,
    Translational3DFlowAugmentor,
    evaluate_flow_accuracy,
    get_default_3d_generator,
    get_high_disp_3d_generator,
    get_low_disp_3d_generator,
    get_test_3d_generator,
    warp_volume_backward,
    warp_volume_splat3d,
)


def test_determinism_with_seed():
    gen = get_default_3d_generator()
    f1, m1 = gen(16, 20, 20, rng=42)
    f2, m2 = gen(16, 20, 20, rng=42)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(m1, m2)
    f3, _ = gen(16, 20, 20, rng=43)
    assert not np.array_equal(f1, f3)


def test_translation_augmentor_constant_field():
    aug = Translational3DFlowAugmentor(max_disp=5, p=1.0)
    flow = aug(np.zeros((8, 8, 8, 3), np.float32), rng=0)
    for c in range(3):
        assert np.ptp(flow[..., c]) == 0.0
    assert np.any(flow != 0)


def test_rotation_augmentor_zero_at_center():
    aug = Rotational3DFlowAugmentor(max_rot_deg=10, p=1.0, center_jitter=0)
    flow = aug(np.zeros((9, 9, 9, 3), np.float32), rng=1)
    # rotation leaves the center voxel (≈ center of volume) nearly fixed
    c = np.linalg.norm(flow[4, 4, 4])
    edge = np.linalg.norm(flow[0, 0, 0])
    assert c < 1.0
    assert edge > c


def test_expansion_augmentor_radial():
    aug = Expansion3DFlowAugmentor(max_magnitude=0.1, min_magnitude=0.1,
                                   p=1.0, center_jitter=0, anisotropic=False)
    flow = aug(np.zeros((9, 9, 9, 3), np.float32), rng=3)
    # dx grows linearly with x distance from center
    assert flow[4, 4, 8, 0] > flow[4, 4, 5, 0] > 0
    assert flow[4, 4, 0, 0] < 0


def test_all_presets_produce_valid_fields():
    for factory in (get_default_3d_generator, get_low_disp_3d_generator,
                    get_test_3d_generator, get_high_disp_3d_generator):
        flow, invalid = factory()(12, 16, 16, rng=11)
        assert flow.shape == (12, 16, 16, 3)
        assert invalid.shape == (12, 16, 16)
        assert invalid.dtype == bool
        assert np.all(np.isfinite(flow))


def test_jitter_and_shear_and_random_apply():
    rng = np.random.default_rng(5)
    for aug in (Jitter3DFlowAugmentor(p=1.0), Shear3DFlowAugmentor(p=1.0),
                Random3DFlowAugmentor(p=1.0)):
        # probability-1 augmentors fire; per-axis coin flips may still skip,
        # so draw until the field is non-zero (bounded attempts)
        for _ in range(20):
            flow = aug(np.zeros((8, 10, 10, 3), np.float32), rng=rng)
            if np.any(flow != 0):
                break
        assert np.any(flow != 0)
        assert np.all(np.isfinite(flow))


def test_splat_forward_warp_translation():
    """Splatting by an integer translation must equal an array shift."""
    rng = np.random.default_rng(8)
    vol = rng.random((10, 12, 12)).astype(np.float32)
    flow = np.zeros(vol.shape + (3,), np.float32)
    flow[..., 0] = 2.0  # dx = +2
    warped = warp_volume_splat3d(vol, flow)
    np.testing.assert_allclose(warped[:, :, 2:], vol[:, :, :-2], atol=1e-5)


def test_splat_inverts_backward_warp():
    """forward-splat(flow) ≈ backward-warp(-flow) for smooth subvoxel flows."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(9)
    vol = gaussian_filter(rng.random((14, 18, 18)), 2.0).astype(np.float32)
    flow = np.zeros(vol.shape + (3,), np.float32)
    flow[..., 0] = 0.7
    flow[..., 1] = -0.4
    a = warp_volume_splat3d(vol, flow)
    b = warp_volume_backward(vol, -flow)
    interior = np.s_[2:-2, 2:-2, 2:-2]
    assert np.mean(np.abs(a[interior] - b[interior])) < 5e-3


def test_epe_metric():
    gt = np.zeros((40, 60, 60, 3), np.float32)
    est = gt + 1.0
    # |delta| = sqrt(3) everywhere
    assert abs(evaluate_flow_accuracy(est, gt, boundary=5) - np.sqrt(3)) < 1e-6
    assert evaluate_flow_accuracy(gt, gt, boundary=5) == 0.0
