"""Multi-host (DCN) scaling helpers.

The reference's multiprocessing executor is the intra-node scaling story
(SURVEY.md §2.4); across hosts the TPU-native analogue is
``jax.distributed`` + per-host frame ranges: each host streams its own
contiguous slice of the recording through the standard pipeline, devices on
each host form the local batch mesh, and the only cross-host state — the
w_init running mean — either stays host-local (each host seeds from its own
first batch; the reference's semantics for independent recordings) or is
averaged over a global mesh when one recording spans hosts.

Single-chip environments simply get process_index 0 / count 1, so the same
code runs unchanged.
"""

import jax

from flowreg3d_tpu.io.multifile import SUBSETFileReader3D


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed when run under a multi-host launcher.

    No-op when the runtime is already initialized or single-process args are
    absent (e.g. local runs)."""
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_frame_range(n_frames, process_index=None, process_count=None):
    """Contiguous [start, stop) frame range owned by this host."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = -(-n_frames // pc)
    start = min(pi * per, n_frames)
    stop = min(start + per, n_frames)
    return start, stop


def local_reader(reader, process_index=None, process_count=None):
    """Wrap a reader so this host streams only its own frame range."""
    reader._ensure_initialized()
    start, stop = local_frame_range(reader.binned_count, process_index,
                                    process_count)
    return SUBSETFileReader3D(reader, list(range(start, stop)))
