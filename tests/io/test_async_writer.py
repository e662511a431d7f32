"""Async writer: ordering, flush, error propagation."""

import numpy as np
import pytest

from flowreg3d_tpu.io.array import ArrayWriter3D
from flowreg3d_tpu.io.async_writer import AsyncWriter3D
from flowreg3d_tpu.io.factory import get_video_file_reader, get_video_file_writer


def test_ordered_writes_roundtrip(tmp_path):
    video = (np.random.default_rng(0).random((9, 4, 6, 8, 1)) * 100).astype(
        np.uint16)
    w = AsyncWriter3D(get_video_file_writer(str(tmp_path / "v.h5"), "HDF5"))
    for t0 in range(0, 9, 3):
        w.write_frames(video[t0:t0 + 3])
    w.close()
    r = get_video_file_reader(str(tmp_path / "v.h5"))
    np.testing.assert_array_equal(r[:], video)
    r.close()


def test_array_passthrough():
    video = np.zeros((4, 2, 3, 4, 1), np.float32)
    w = AsyncWriter3D(ArrayWriter3D())
    w.write_frames(video)
    w.flush()
    assert w.get_array().shape == video.shape
    w.close()


def test_error_propagates_on_close(tmp_path):
    class BoomWriter(ArrayWriter3D):
        def write_frames(self, frames):
            raise IOError("disk full")

    w = AsyncWriter3D(BoomWriter())
    w.write_frames(np.zeros((1, 2, 3, 4, 1), np.float32))
    with pytest.raises(IOError):
        w.flush()
        w.close()
