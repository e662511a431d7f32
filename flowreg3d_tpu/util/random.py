"""Deterministic seeding across python / numpy / JAX (and torch if present).

Parity target: reference util/random.py:47-213 (``fix_seed`` + generator
getters incl. ``get_jax_key``). JAX-first: the module keeps a PRNG key that
``get_jax_key`` splits on each call, so repeated consumers get independent
streams from one seed.
"""

import random as _py_random

import numpy as np

_state = {"jax_key": None, "np_rng": None, "seed": None}


def fix_seed(seed=0, deterministic=True):
    """Seed python, numpy (legacy + Generator), JAX, and torch when present."""
    seed = int(seed)
    _py_random.seed(seed)
    np.random.seed(seed)
    _state["np_rng"] = np.random.default_rng(seed)
    _state["seed"] = seed

    import jax

    _state["jax_key"] = jax.random.PRNGKey(seed)

    try:
        import torch

        torch.manual_seed(seed)
        if deterministic and hasattr(torch, "use_deterministic_algorithms"):
            try:
                torch.use_deterministic_algorithms(True, warn_only=True)
            except TypeError:
                pass
    except ImportError:
        pass
    return seed


def get_numpy_rng():
    if _state["np_rng"] is None:
        fix_seed(0)
    return _state["np_rng"]


def get_jax_key(split=True):
    """Current JAX PRNG key; with ``split`` (default) returns a fresh subkey
    and advances the stored key."""
    import jax

    if _state["jax_key"] is None:
        fix_seed(0)
    if not split:
        return _state["jax_key"]
    _state["jax_key"], sub = jax.random.split(_state["jax_key"])
    return sub


def get_seed():
    return _state["seed"]
