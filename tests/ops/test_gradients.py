"""Parity tests for gradient stencils vs np.gradient."""

import numpy as np

from flowreg3d_tpu.ops.gradients import divergence, gradient_zyx, second_diff_zyx


def test_gradient_parity(rng):
    f = rng.normal(size=(9, 11, 13))
    for h in [(1.0, 1.0, 1.0), (2.0, 0.5, 1.5)]:
        want = np.gradient(f, *h)
        got = gradient_zyx(f.astype(np.float32), *h)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), w, rtol=1e-4, atol=1e-5)


def test_second_diff(rng):
    f = rng.normal(size=(8, 9, 10))
    fxx, fyy, fzz = second_diff_zyx(f.astype(np.float32), 2.0, 1.0, 0.5)
    want_xx = np.zeros_like(f)
    want_xx[:, :, 1:-1] = (f[:, :, :-2] - 2 * f[:, :, 1:-1] + f[:, :, 2:]) / 0.25
    np.testing.assert_allclose(np.asarray(fxx), want_xx, rtol=1e-4, atol=1e-4)
    assert np.all(np.asarray(fxx)[:, :, 0] == 0)
    assert np.all(np.asarray(fzz)[0] == 0)


def test_divergence_constant_flow_is_zero():
    flow = np.ones((6, 7, 8, 3), np.float32)
    div = np.asarray(divergence(flow))
    np.testing.assert_allclose(div, 0.0, atol=1e-6)
