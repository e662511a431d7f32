"""Runtime context: capability detection, executor registry, scoped overrides.

Parity target: reference _runtime.py:16-535 (``RuntimeContext``): global
config dict + contextvar overrides + ``use()`` context manager, detection of
available backends/parallelization/features, a string-keyed executor
registry, and env-var snapshot transport (``FLOWREG3D_CONTEXT`` JSON) for
worker processes / multi-host jobs.

TPU-native: "available parallelization" enumerates the vmap/mesh executor
tier and the device topology (platform, device count, multi-host process
index) instead of thread/process pools.
"""

import contextvars
import json
import os
from contextlib import contextmanager

_ENV_KEY = "FLOWREG3D_CONTEXT"
_overrides = contextvars.ContextVar("flowreg3d_tpu_overrides", default=None)

# -- deep-flow backend registry ---------------------------------------------
# Plug-in point for external displacement estimators (volRAFT-style CNNs,
# raft-2p, ...): a backend is a factory returning a callable with the
# get_displacement protocol ``fn(fixed, moving, uvw=..., **params) ->
# (Z,Y,X,3)`` that replaces the variational solver inside the executors
# (reference _runtime.py:57-81 detection; parallelization/sequential_3d.py
# :148 call site).
_FLOW_BACKENDS = {}


def register_flow_backend(name, factory):
    """Register a displacement-backend factory under ``name``."""
    _FLOW_BACKENDS[str(name)] = factory


def get_flow_backend(name):
    """Instantiate a registered backend; raises KeyError with choices."""
    try:
        factory = _FLOW_BACKENDS[str(name)]
    except KeyError:
        raise KeyError(
            f"Unknown flow backend '{name}'. Registered: "
            f"{sorted(_FLOW_BACKENDS)}") from None
    return factory()


def list_flow_backends():
    return sorted(_FLOW_BACKENDS)


class RuntimeContext:
    """Process-global runtime configuration with contextvar overrides."""

    _config = {}
    _initialized = False

    # -- lifecycle ----------------------------------------------------------

    @classmethod
    def init(cls, force=False):
        if cls._initialized and not force:
            return cls._config
        cls._config = {
            "available_backends": cls._detect_backends(),
            "available_parallelization": cls._detect_parallelization(),
            "features": cls._detect_features(),
            "devices": cls._detect_devices(),
        }
        env = os.environ.get(_ENV_KEY)
        if env:
            try:
                cls._config.update(json.loads(env))
            except json.JSONDecodeError:
                pass
        cls._initialized = True
        return cls._config

    # -- detection ----------------------------------------------------------

    @staticmethod
    def _detect_backends():
        # parity: reference _runtime.py:57-81 — the variational solver is
        # always available; optional deep-flow packages register by import
        backends = {"variational"}
        for name, module in (("torch", "torch"),
                             ("raft-2p", "raft2p"),
                             ("flownet2", "flownet2"),
                             ("pwcnet", "pwcnet"),
                             ("deepflow", "deepflow")):
            try:
                __import__(module)
                backends.add(name)
            except ImportError:
                pass
        backends.update(_FLOW_BACKENDS)
        return sorted(backends)

    @staticmethod
    def _detect_parallelization():
        # registry executors plus the reference's optional distributed
        # schedulers when importable (parity: reference _runtime.py:102-114
        # detects dask/ray; on TPU they would only orchestrate host-side
        # I/O around the mesh executors)
        from flowreg3d_tpu.parallel.executors import list_executors

        modes = list(list_executors())
        for name in ("dask", "ray"):
            try:
                __import__(name)
                modes.append(name)
            except ImportError:
                pass
        return modes

    @staticmethod
    def _detect_features():
        feats = {}
        try:
            import jax

            feats["jax"] = jax.__version__
            try:
                from jax.experimental import pallas  # noqa: F401

                feats["pallas"] = True
            except ImportError:
                feats["pallas"] = False
        except ImportError:
            feats["jax"] = None
        return feats

    @staticmethod
    def _detect_devices():
        try:
            import jax

            devs = jax.devices()
            return {
                "platform": devs[0].platform if devs else None,
                "n_devices": len(devs),
                "process_index": jax.process_index(),
                "n_processes": jax.process_count(),
            }
        except Exception:
            return {"platform": None, "n_devices": 0,
                    "process_index": 0, "n_processes": 1}

    # -- access -------------------------------------------------------------

    @classmethod
    def get(cls, key, default=None):
        cls.init()
        ov = _overrides.get()
        if ov and key in ov:
            return ov[key]
        return cls._config.get(key, default)

    @classmethod
    def set(cls, key, value):
        cls.init()
        cls._config[key] = value

    @classmethod
    @contextmanager
    def use(cls, **kwargs):
        """Scoped overrides: ``with RuntimeContext.use(executor='mesh'): ...``"""
        cls.init()
        prev = _overrides.get()
        merged = dict(prev or {})
        merged.update(kwargs)
        token = _overrides.set(merged)
        try:
            yield cls
        finally:
            _overrides.reset(token)

    # -- executor registry (delegates to the parallel tier) -----------------

    @classmethod
    def get_parallelization_executor(cls, name):
        from flowreg3d_tpu.parallel.executors import _EXECUTORS

        return _EXECUTORS.get(name) or _EXECUTORS.get(
            {"sequential3d": "sequential", "threading3d": "batched",
             "multiprocessing3d": "mesh"}.get(name, name))

    # -- transport ----------------------------------------------------------

    @classmethod
    def snapshot(cls):
        cls.init()
        ov = _overrides.get() or {}
        snap = dict(cls._config)
        snap.update(ov)
        return snap

    @classmethod
    def to_env(cls):
        """Serialize the context into the child-process environment."""
        os.environ[_ENV_KEY] = json.dumps(cls.snapshot(), default=str)

    @classmethod
    def from_env(cls):
        cls.init(force=True)
        return cls._config


def get_optimal_parallelization(n_frames=None, volume_voxels=None):
    """Heuristic executor choice (parity: reference _runtime.py:357-391).

    mesh when >1 device; batched for many small frames on one device;
    sequential for single huge volumes (bounded HBM)."""
    devices = RuntimeContext.get("devices", {})
    if devices.get("n_devices", 1) > 1:
        return "mesh"
    if volume_voxels is not None and volume_voxels > 3e8:
        return "sequential"
    return "batched"
