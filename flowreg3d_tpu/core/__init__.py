"""Variational optical-flow core: motion tensors, level solver, pyramid driver."""

from flowreg3d_tpu.core.pyramid import get_displacement
from flowreg3d_tpu.core.solver2d import compute_flow

__all__ = ["get_displacement", "compute_flow"]
