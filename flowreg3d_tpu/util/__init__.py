"""Host-side utilities: rigid prealignment, seeding, image processing re-exports."""

from flowreg3d_tpu.util.xcorr_prealignment import estimate_rigid_xcorr_3d
from flowreg3d_tpu.util.random import fix_seed, get_jax_key

__all__ = ["estimate_rigid_xcorr_3d", "fix_seed", "get_jax_key"]
