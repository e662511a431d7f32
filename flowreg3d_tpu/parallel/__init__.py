"""Parallel execution tier: vmap within a chip, mesh sharding across chips.

TPU-native replacement for the reference's executor classes
(motion_correction/parallelization/, SURVEY.md §2.4): frame-level data
parallelism becomes ``vmap`` over the T axis plus ``jax.sharding`` over a 1-D
device mesh (ICI); the reference's shared-memory transport maps to XLA's
implicit collectives (reference/params replicated, frames sharded).
"""

from flowreg3d_tpu.parallel.executors import (
    BaseExecutor3D,
    BatchedExecutor3D,
    MeshExecutor3D,
    SequentialExecutor3D,
    get_executor,
    list_executors,
)
from flowreg3d_tpu.parallel.mesh import batch_mesh, replicate, shard_batch

__all__ = [
    "BaseExecutor3D",
    "SequentialExecutor3D",
    "BatchedExecutor3D",
    "MeshExecutor3D",
    "get_executor",
    "list_executors",
    "batch_mesh",
    "replicate",
    "shard_batch",
]
