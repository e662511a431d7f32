"""channel_idx, preproc_funct, and streaming temporal Gaussian."""

import numpy as np
import pytest
from scipy.ndimage import gaussian_filter1d

from flowreg3d_tpu.ops.filters import (
    StreamingTemporalGaussian,
    gaussian_filter_1d_half_kernel,
)
from flowreg3d_tpu.pipeline import compensate_arr

from tests.pipeline.conftest import fast_options

# heavy tier: interpret-mode Pallas / shard_map compiles (minutes on 1 CPU)
pytestmark = pytest.mark.slow


def test_channel_idx_selects_channels(video5d, base_volume):
    video2c = np.concatenate([video5d, video5d * 0.1], axis=-1)
    ref2c = np.concatenate([base_volume, base_volume * 0.1], axis=-1)
    opts = fast_options(channel_idx=[0])
    reg, w = compensate_arr(video2c, ref2c, options=opts)
    assert reg.shape[-1] == 1  # only the selected channel was processed


def test_preproc_funct_override(video5d, base_volume):
    calls = []

    def my_preproc(frames):
        calls.append(np.asarray(frames).shape)
        return np.asarray(frames, np.float64)

    opts = fast_options(preproc_funct=my_preproc)
    reg, _ = compensate_arr(video5d, base_volume, options=opts)
    assert calls, "custom preprocessing was not invoked"
    assert reg.shape == video5d.shape


def test_streaming_temporal_gaussian_half_kernel():
    rng = np.random.default_rng(0)
    frames = rng.random((12, 4, 5)).astype(np.float64)
    filt = StreamingTemporalGaussian(sigma=1.5)
    out = filt.filter_batch(frames)
    assert out.shape == frames.shape

    # steady state equals a causal (half-kernel) convolution
    radius = filt.radius
    k = filt.kernel
    t = 10
    expect = sum(k[i] * frames[t - i] for i in range(radius + 1))
    np.testing.assert_allclose(out[t], expect, rtol=1e-12)

    # early frames: renormalized partial kernels (no left padding artifacts)
    np.testing.assert_allclose(out[0], frames[0], rtol=1e-12)

    # streaming across batch boundaries == one continuous stream
    filt2 = StreamingTemporalGaussian(sigma=1.5)
    a, filt2 = gaussian_filter_1d_half_kernel(frames[:7], 1.5, state=filt2)
    b, _ = gaussian_filter_1d_half_kernel(frames[7:], 1.5, state=filt2)
    np.testing.assert_allclose(np.concatenate([a, b]), out, rtol=1e-12)
