"""Multiple progress callbacks + spatial weight volumes."""

import numpy as np

from flowreg3d_tpu.pipeline import compensate_arr

from tests.pipeline.conftest import fast_options
import pytest

# heavy tier: interpret-mode Pallas / shard_map compiles (minutes on 1 CPU)
pytestmark = pytest.mark.slow


def test_multiple_progress_callbacks(video5d, base_volume):
    a_calls, b_calls = [], []

    from flowreg3d_tpu.pipeline import BatchMotionCorrector, OFOptions
    from flowreg3d_tpu.pipeline.of_options import OutputFormat

    opts = fast_options()
    opts.input_file = video5d
    opts.reference_frames = base_volume
    opts.output_format = OutputFormat.ARRAY
    opts.save_w = True
    opts.save_meta_info = False
    corr = BatchMotionCorrector(opts)
    corr.register_progress_callback(lambda c, t: a_calls.append((c, t)))
    corr.register_progress_callback(lambda c, t: b_calls.append((c, t)))
    corr.run()
    assert a_calls and b_calls
    assert a_calls == b_calls
    assert a_calls[-1][0] == video5d.shape[0]


def test_spatial_weight_volume(video5d, base_volume):
    """3D spatial weight maps (reference get_weight_at supports them)."""
    Z, Y, X = base_volume.shape[:3]
    spatial = np.ones((Z, Y, X), np.float64)
    spatial[:, : Y // 2] = 0.25  # de-emphasize half the volume
    opts = fast_options(weight=spatial[np.newaxis])  # (1, Z, Y, X) channel 0
    reg, w = compensate_arr(video5d, base_volume, options=opts)
    assert reg.shape == video5d.shape
    assert np.all(np.isfinite(w))
