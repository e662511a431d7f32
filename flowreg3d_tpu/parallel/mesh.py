"""Device-mesh helpers for frame-level data parallelism.

The batch (T) axis is embarrassingly parallel (SURVEY.md §2.4/§5): frames are
sharded along a 1-D mesh axis ``'batch'``; reference volume, weight and
w_init are replicated in every chip's HBM. XLA inserts the (only) collectives
— the w_init running-mean reduction — over ICI automatically.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_mesh(devices=None):
    """1-D mesh over all (or the given) devices with axis 'batch'."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), ("batch",))


def shard_batch(arr, mesh):
    """Place (T, ...) array sharded along T over the mesh's batch axis."""
    spec = P("batch", *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate(arr, mesh):
    """Place an array fully replicated across the mesh."""
    return jax.device_put(arr, NamedSharding(mesh, P()))


def pad_to_multiple(arr, multiple, axis=0):
    """Edge-pad along ``axis`` to a multiple; returns (padded, original_len)."""
    n = arr.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return arr, n
    pad_width = [(0, 0)] * arr.ndim
    pad_width[axis] = (0, pad)
    return np.pad(arr, pad_width, mode="edge"), n
