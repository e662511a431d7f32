"""RuntimeContext tests (parity scope: reference _runtime.py behaviors)."""

import json
import os

from flowreg3d_tpu.runtime import RuntimeContext, get_optimal_parallelization


def test_init_and_detection():
    cfg = RuntimeContext.init(force=True)
    assert "variational" in cfg["available_backends"]
    assert set(cfg["available_parallelization"]) >= {"sequential", "batched",
                                                     "mesh"}
    assert cfg["devices"]["n_devices"] >= 1
    assert cfg["features"]["jax"]


def test_overrides_scoped():
    RuntimeContext.init(force=True)
    assert RuntimeContext.get("executor") is None
    with RuntimeContext.use(executor="mesh"):
        assert RuntimeContext.get("executor") == "mesh"
        with RuntimeContext.use(executor="sequential"):
            assert RuntimeContext.get("executor") == "sequential"
        assert RuntimeContext.get("executor") == "mesh"
    assert RuntimeContext.get("executor") is None


def test_executor_registry_lookup():
    from flowreg3d_tpu.parallel.executors import (
        BatchedExecutor3D,
        MeshExecutor3D,
        SequentialExecutor3D,
    )

    assert RuntimeContext.get_parallelization_executor("sequential") \
        is SequentialExecutor3D
    # reference names are accepted as aliases
    assert RuntimeContext.get_parallelization_executor("sequential3d") \
        is SequentialExecutor3D
    assert RuntimeContext.get_parallelization_executor("threading3d") \
        is BatchedExecutor3D
    assert RuntimeContext.get_parallelization_executor("multiprocessing3d") \
        is MeshExecutor3D
    assert RuntimeContext.get_parallelization_executor("nope") is None


def test_env_snapshot_roundtrip():
    RuntimeContext.init(force=True)
    with RuntimeContext.use(custom_key="hello"):
        RuntimeContext.to_env()
    raw = os.environ.get("FLOWREG3D_CONTEXT")
    assert raw and json.loads(raw)["custom_key"] == "hello"
    cfg = RuntimeContext.from_env()
    assert cfg["custom_key"] == "hello"
    del os.environ["FLOWREG3D_CONTEXT"]
    RuntimeContext.init(force=True)


def test_optimal_parallelization():
    RuntimeContext.init(force=True)
    n = RuntimeContext.get("devices")["n_devices"]
    choice = get_optimal_parallelization()
    assert choice == ("mesh" if n > 1 else "batched")
    assert get_optimal_parallelization(volume_voxels=1e9) in ("mesh",
                                                              "sequential")
