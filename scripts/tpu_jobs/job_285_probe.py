# HBM health probe after the OOM wedge: try a 2 GB allocation.
import numpy as np
try:
    import jax.numpy as _jnp
    x = _jnp.zeros((512, 1024, 1024), _jnp.float32)
    x.block_until_ready()
    del x
    print("2GB probe OK — device clean", flush=True)
except Exception as e:  # noqa: BLE001
    print("probe failed:", str(e)[:150], flush=True)
