"""Multi-host helpers (single-process semantics + range math)."""

import numpy as np

from flowreg3d_tpu.io.array import ArrayReader3D
from flowreg3d_tpu.parallel.multihost import local_frame_range, local_reader


def test_local_frame_range_partition():
    ranges = [local_frame_range(10, pi, 4) for pi in range(4)]
    assert ranges == [(0, 3), (3, 6), (6, 9), (9, 10)]
    covered = [i for a, b in ranges for i in range(a, b)]
    assert covered == list(range(10))


def test_local_reader_subsets():
    video = np.arange(6 * 2 * 3 * 4).reshape(6, 2, 3, 4, 1).astype(np.float32)
    base = ArrayReader3D(video)
    r = local_reader(base, process_index=1, process_count=3)
    np.testing.assert_array_equal(r[:], video[2:4])


def test_single_process_is_identity():
    video = np.zeros((5, 2, 3, 4, 1), np.float32)
    r = local_reader(ArrayReader3D(video))
    assert r.shape[0] == 5
