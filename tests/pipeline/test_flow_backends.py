"""Deep-flow backend plug-in: custom callables through the full pipeline.

Parity target: the reference's ``get_displacement_func`` executor protocol
(parallelization/base_3d.py:38, sequential_3d.py:148) and deep-backend
detection/registry (_runtime.py:57-81); BASELINE config 5 (volRAFT-style
backend) becomes runnable with the mock backend.
"""

import numpy as np
import pytest
from scipy.ndimage import gaussian_filter, shift as ndshift

from flowreg3d_tpu.backends import PatchRigidFlowBackend, load_volraft
from flowreg3d_tpu.pipeline import compensate_arr_3D
from flowreg3d_tpu.pipeline.corrector import RegistrationConfig
from flowreg3d_tpu.runtime import (RuntimeContext, get_flow_backend,
                                   list_flow_backends)


# heavy tier: full-pipeline jit compiles (minutes on 1 CPU)
pytestmark = pytest.mark.slow


@pytest.fixture
def pair():
    rng = np.random.default_rng(0)
    ref = gaussian_filter(rng.random((12, 48, 48)).astype(np.float32), 1.2)
    mov = ndshift(ref, (0.8, 1.6, -1.2), order=3, mode="nearest")
    return ref, mov


def test_custom_callable_through_pipeline(pair):
    ref, mov = pair
    calls = {"n": 0}

    def custom(fixed, moving, uvw=None, **params):
        calls["n"] += 1
        flow = np.zeros(np.asarray(fixed).shape[:3] + (3,), np.float32)
        flow[..., 0] = -1.2
        flow[..., 1] = 1.6
        flow[..., 2] = 0.8
        return flow

    reg, flow = compensate_arr_3D(
        mov[None, ..., None], ref[..., None],
        config=RegistrationConfig(get_displacement_func=custom))
    assert calls["n"] >= 1, "custom backend was never invoked"
    np.testing.assert_allclose(flow[0, 4, 4, 4], [-1.2, 1.6, 0.8],
                               atol=1e-5)
    inner = (slice(2, -2), slice(4, -4), slice(4, -4))
    assert (np.abs(reg[0, ..., 0] - ref)[inner].mean()
            < 0.5 * np.abs(mov - ref)[inner].mean())


def test_patch_rigid_backend_registers_translation(pair):
    ref, mov = pair
    backend = PatchRigidFlowBackend(patch_size=(12, 24, 24))
    reg, flow = compensate_arr_3D(
        mov[None, ..., None], ref[..., None],
        config=RegistrationConfig(get_displacement_func=backend))
    mean = flow.reshape(-1, 3).mean(0)
    np.testing.assert_allclose(mean, [-1.2, 1.6, 0.8], atol=0.4)
    inner = (slice(2, -2), slice(4, -4), slice(4, -4))
    assert (np.abs(reg[0, ..., 0] - ref)[inner].mean()
            < 0.35 * np.abs(mov - ref)[inner].mean())


def test_backend_registry_and_detection(pair):
    assert "volraft" in list_flow_backends()
    assert "volraft-mock" in list_flow_backends()
    backend = get_flow_backend("volraft-mock")
    assert isinstance(backend, PatchRigidFlowBackend)
    with pytest.raises(KeyError, match="Registered"):
        get_flow_backend("nope")
    # load_volraft without a checkpoint falls back to the mock
    assert isinstance(load_volraft(), PatchRigidFlowBackend)
    # registry names surface in the runtime's backend detection
    RuntimeContext.init(force=True)
    backends = RuntimeContext.get("available_backends", [])
    assert "variational" in backends and "volraft" in backends


def test_flow_backend_by_name_in_config(pair):
    ref, mov = pair
    reg, flow = compensate_arr_3D(
        mov[None, ..., None], ref[..., None],
        config=RegistrationConfig(flow_backend="volraft-mock"))
    assert np.isfinite(flow).all()
    inner = (slice(2, -2), slice(4, -4), slice(4, -4))
    assert (np.abs(reg[0, ..., 0] - ref)[inner].mean()
            < 0.5 * np.abs(mov - ref)[inner].mean())
