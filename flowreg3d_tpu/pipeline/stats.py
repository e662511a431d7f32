"""Per-frame flow statistics, computed on device in one jitted pass.

Parity target: reference compensate_recording_3D.py:487-508 — mean/max
displacement magnitude, mean divergence (du/dx + dv/dy + dw/dz via
np.gradient semantics), and mean-translation magnitude per frame.
"""

import jax
import jax.numpy as jnp
import numpy as np

from flowreg3d_tpu.ops.gradients import divergence


@jax.jit
def _flow_stats(flows):
    mag = jnp.linalg.norm(flows, axis=-1)  # (T,Z,Y,X)
    mean_disp = mag.mean(axis=(1, 2, 3))
    max_disp = mag.max(axis=(1, 2, 3))
    div = jax.vmap(divergence)(flows).mean(axis=(1, 2, 3))
    t_mean = flows.mean(axis=(1, 2, 3))  # (T,3)
    mean_translation = jnp.linalg.norm(t_mean, axis=-1)
    return mean_disp, max_disp, div, mean_translation


def flow_statistics(flows):
    """dict of per-frame lists for a (T,Z,Y,X,3) flow stack."""
    md, xd, dv, mt = _flow_stats(jnp.asarray(flows, jnp.float32))
    return {
        "mean_disp": np.asarray(md).tolist(),
        "max_disp": np.asarray(xd).tolist(),
        "mean_div": np.asarray(dv).tolist(),
        "mean_translation": np.asarray(mt).tolist(),
    }
