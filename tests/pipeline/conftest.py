"""Shared fast pipeline fixtures: one volume shape + one flow config so the
compiled pyramid is reused across every test in this package."""

import numpy as np
import pytest
from scipy.ndimage import gaussian_filter

from flowreg3d_tpu.pipeline import OFOptions

SHAPE = (10, 20, 24)


def fast_options(**overrides):
    kw = dict(quality_setting="fast", min_level=0, levels=4, iterations=8,
              alpha=(1.5, 1.5, 1.5), weight=[1.0],
              sigma=[1.0, 1.0, 1.0, 0.1])
    kw.update(overrides)
    return OFOptions(**kw)


@pytest.fixture(scope="session")
def base_volume():
    rng = np.random.default_rng(0)
    vol = gaussian_filter(rng.random(SHAPE + (1,)), (1.5, 2, 2, 0))
    return vol.astype(np.float32)


@pytest.fixture(scope="session")
def video5d(base_volume):
    return np.stack([
        np.roll(base_volume, (0, s, -s, 0), axis=(0, 1, 2, 3))
        for s in range(4)
    ])
