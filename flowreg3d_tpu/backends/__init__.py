"""Optional deep-flow displacement backends (plug-in tier).

Backends implement the ``get_displacement`` protocol
``fn(fixed, moving, uvw=..., **params) -> (Z, Y, X, 3)`` and plug into the
pipeline via ``RegistrationConfig(get_displacement_func=...)`` or the
``runtime.register_flow_backend`` registry (reference _runtime.py:57-81,
examples/motion_correct_3d_volraft_test.py).
"""

from flowreg3d_tpu.backends.volraft import (PatchRigidFlowBackend,
                                            VolRAFTBackend, load_volraft)

__all__ = ["PatchRigidFlowBackend", "VolRAFTBackend", "load_volraft"]
