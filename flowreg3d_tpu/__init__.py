"""flowreg3d_tpu — TPU-native 3D variational optical-flow motion correction.

A ground-up JAX/XLA/Pallas re-design of the capabilities of FlowRegSuite/flowreg3D
(reference: /root/reference/src/flowreg3d): dense 3D variational optical flow
(coarse-to-fine pyramid + nonlinear red-black SOR solver), backward warping,
streaming batch motion correction with HDF5/TIFF/MAT I/O, synthetic motion
generation, and data-parallel scaling over TPU meshes.

Canonical data layout matches the reference (util/io/_base_3d.py:1-13):
  time series    (T, Z, Y, X, C)
  single volume  (Z, Y, X, C)
  flow field     (Z, Y, X, 3) with last axis [dx(u), dy(v), dz(w)]

Top-level API mirrors the reference's ``flowreg3d.__init__`` (get_displacement)
plus the batch pipeline entry points.
"""

from flowreg3d_tpu.core.pyramid import get_displacement
from flowreg3d_tpu.ops.warp import imregister_wrapper


def __getattr__(name):
    # pipeline symbols are lazy so `import flowreg3d_tpu` stays light
    _pipeline_names = {
        "OFOptions", "OutputFormat", "QualitySetting", "RegistrationConfig",
        "BatchMotionCorrector", "compensate_recording", "compensate_arr",
        "compensate_arr_3D", "compensate_inplace",
    }
    if name in _pipeline_names:
        import flowreg3d_tpu.pipeline as _p

        return getattr(_p, name)
    raise AttributeError(f"module 'flowreg3d_tpu' has no attribute {name!r}")


__version__ = "0.1.0"

__all__ = [
    "get_displacement", "imregister_wrapper", "OFOptions",
    "compensate_recording", "compensate_arr", "__version__",
]
