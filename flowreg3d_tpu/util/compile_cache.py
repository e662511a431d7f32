"""Persistent compilation cache + device claim warm-up.

Cold-start cost on the TPU runtime in this environment has two
independent components, both outside the measured compute path:

1. **Kernel compilation** — every (shape, params) configuration
   compiles one pyramid program (per-level Pallas solvers + medians +
   resizes) and one warp program. Through a remote-compile service
   each Mosaic kernel costs seconds; a full canonical config is
   minutes. JAX's persistent compilation cache (verified working
   through the axon PJRT plugin: writes and hits both function)
   eliminates this for repeated configurations across processes.
   ``enable_compile_cache`` turns it on, defaulting to a repo-local
   directory so a warmed cache can ship with the checkout.

2. **Device claim acquisition** — the first *execution* on the remote
   TPU blocks until the device claim is granted (measured 45-300+ s,
   depending on when the previous holder exited). Compilation does
   NOT need the claim: kernels compile while the claim is pending.
   ``start_claim_warmup`` dispatches a tiny computation and fetches
   it on a background thread, so claim acquisition overlaps with
   ahead-of-time compilation instead of serializing after it.

Reference counterpart: none — the reference's numba kernels cache via
``@njit(cache=True)`` on local disk (reference core/level_solver_3d.py),
which is the same concern solved for LLVM instead of XLA.
"""

import os
import threading

__all__ = ["enable_compile_cache", "start_claim_warmup"]

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache(path=None, min_compile_time_secs=0.0):
    """Enable JAX's persistent compilation cache (TPU programs only).

    path: cache directory (created if missing). Defaults to
        ``<repo>/.jax_cache`` so a pre-warmed cache travels with the
        checkout. When ``JAX_PLATFORMS`` selects the CPU backend and no
        explicit path is given, this is a NO-OP: XLA:CPU AOT cache
        entries embed tuning pseudo-features (``+prefer-no-scatter``)
        that host feature detection never reports, so every load fails
        the compatibility check, prints a huge mismatch warning, and
        falls back to a fresh compile anyway — measured 2026-08-18:
        12,718 warnings (22 MB of stderr) per dry run and warm == cold
        wall time. Persistent caching only pays off for the remote-TPU
        compiles.
    min_compile_time_secs: only cache compiles slower than this.
        0.0 caches everything (right for benchmark/driver runs where
        every saved compile counts).
    """
    import jax

    if path is None:
        plat = os.environ.get("JAX_PLATFORMS", "").lower()
        if plat.startswith("cpu"):
            return None
        path = _DEFAULT_DIR
    path = str(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path


def start_claim_warmup(device=None):
    """Begin acquiring the device claim on a background thread.

    Dispatches a trivial computation to ``device`` and blocks (in the
    thread) on fetching its result — the fetch is what forces real
    completion through remote runtimes where ``block_until_ready`` is
    enqueue-only. Returns the thread; ``join()`` it before timing
    anything on the device.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    if device is None:
        device = jax.devices()[0]

    def _warm():
        x = jax.device_put(np.ones((8, 128), np.float32), device)
        float(jnp.sum(x + 1.0))

    th = threading.Thread(target=_warm, daemon=True,
                          name="flowreg3d-claim-warmup")
    th.start()
    return th
