"""Pallas 5^3 median selection network: exactness (interpret on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from flowreg3d_tpu.ops.filters import median_filter_5x5x5
from flowreg3d_tpu.ops.median_pallas import (_median_network,
                                             _oddeven_merge_sort_pairs,
                                             median_filter_5x5x5_pallas)



# heavy tier: interpret-mode Pallas / shard_map compiles (minutes on 1 CPU)
pytestmark = pytest.mark.slow

def test_network_sorts():
    rng = np.random.default_rng(0)
    v = rng.random(128)
    a = list(v)
    for i, j in _oddeven_merge_sort_pairs(128):
        if a[i] > a[j]:
            a[i], a[j] = a[j], a[i]
    assert np.array_equal(np.asarray(a), np.sort(v))


def test_pruned_network_selects_median():
    rng = np.random.default_rng(1)
    for _ in range(20):
        v = rng.random(125)
        a = list(v) + [np.inf] * 3
        for i, j in _median_network(128, 62):
            if a[i] > a[j]:
                a[i], a[j] = a[j], a[i]
        assert a[62] == np.median(v)


@pytest.mark.parametrize("shape", [(7, 40, 50), (6, 8, 9), (5, 33, 129)])
def test_median_kernel_exact(shape):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random(shape), jnp.float32)
    got = median_filter_5x5x5_pallas(x, interpret=True)
    ref = median_filter_5x5x5(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.slow
def test_batched_median_matches_single_and_scipy():
    """The batched (B,Z,Y,X) kernel — the default TPU median for every
    min_level>=4 pyramid — must equal the single-volume kernel AND scipy
    per component."""
    from scipy.ndimage import median_filter

    from flowreg3d_tpu.ops.median_pallas import (
        median_filter_5x5x5_pallas, median_filter_5x5x5_pallas_batched)

    rng = np.random.default_rng(3)
    x = rng.random((3, 9, 22, 130)).astype(np.float32)
    got = np.asarray(median_filter_5x5x5_pallas_batched(x, interpret=True))
    for i in range(3):
        single = np.asarray(median_filter_5x5x5_pallas(x[i], interpret=True))
        ref = median_filter_5x5x5(x[i], size=5, mode="mirror") \
            if False else median_filter(x[i], size=5, mode="mirror")
        np.testing.assert_array_equal(got[i], single)
        np.testing.assert_array_equal(got[i], ref)
