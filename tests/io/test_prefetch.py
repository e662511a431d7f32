"""Prefetching reader: identical stream, background thread, passthrough."""

import numpy as np

from flowreg3d_tpu.io.array import ArrayReader3D
from flowreg3d_tpu.io.prefetch import PrefetchReader3D


def _video(T=9):
    return np.arange(T * 2 * 3 * 4).reshape(T, 2, 3, 4, 1).astype(np.float32)


def test_stream_identical():
    video = _video()
    base = ArrayReader3D(video, buffer_size=2)
    pre = PrefetchReader3D(ArrayReader3D(video, buffer_size=2))
    got, want = [], []
    while pre.has_batch():
        got.append(pre.read_batch())
    while base.has_batch():
        want.append(base.read_batch())
    assert len(got) == len(want)
    np.testing.assert_array_equal(np.concatenate(got),
                                  np.concatenate(want))
    assert pre.read_batch() is None


def test_reset_and_random_access():
    video = _video()
    pre = PrefetchReader3D(ArrayReader3D(video, buffer_size=4))
    first = pre.read_batch()
    np.testing.assert_array_equal(first, video[:4])
    np.testing.assert_array_equal(pre[2], video[2])  # passthrough
    pre.reset()
    again = pre.read_batch()
    np.testing.assert_array_equal(again, video[:4])


def test_shape_properties():
    pre = PrefetchReader3D(ArrayReader3D(_video(), buffer_size=3))
    assert pre.shape == (9, 2, 3, 4, 1)
    assert len(pre) == 9


def test_binning_through_prefetch():
    video = _video(8)
    pre = PrefetchReader3D(ArrayReader3D(video, buffer_size=2, bin_size=2))
    batches = []
    while pre.has_batch():
        batches.append(pre.read_batch())
    got = np.concatenate(batches)
    want = video.reshape(4, 2, 2, 3, 4, 1).mean(axis=1).astype(video.dtype)
    np.testing.assert_array_equal(got, want)
