"""Variational optical-flow core: motion tensors, level solver, pyramid driver."""

from flowreg3d_tpu.core.pyramid import get_displacement

__all__ = ["get_displacement"]
