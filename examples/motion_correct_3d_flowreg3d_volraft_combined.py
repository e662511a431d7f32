"""Side-by-side flowreg3D (variational) vs volRAFT-style backend comparison
(parity: reference examples/motion_correct_3d_flowreg3d_volRAFT_combined.py;
BASELINE config 5).

Both estimators run through the SAME pipeline on the same synthetic
displaced volume; the script reports EPE / MAE-improvement for each and for
the combined mode (deep backend as initializer, variational refinement via
cc-free ``uvw`` chaining). Configure via env vars:

  FLOWREG3D_MODE = variational | volraft | both   (default: both)
  VOLRAFT_CHECKPOINT_DIR = <dir with TorchScript volraft.pt>  (optional)

Run: python examples/motion_correct_3d_flowreg3d_volraft_combined.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from scipy.ndimage import gaussian_filter

from flowreg3d_tpu.backends import load_volraft
from flowreg3d_tpu.motion_generation import (
    evaluate_flow_accuracy,
    get_low_disp_3d_generator,
    improvement_ratio,
    warp_volume_splat3d,
)
from flowreg3d_tpu.pipeline import OFOptions, compensate_arr_3D
from flowreg3d_tpu.pipeline.corrector import RegistrationConfig
from flowreg3d_tpu.util.random import fix_seed


def make_volume(shape, rng):
    blobs = np.zeros(shape, np.float32)
    n = max(200, int(np.prod(shape) // 500))
    idx = tuple(rng.integers(2, s - 2, n) for s in shape)
    blobs[idx] = rng.random(n).astype(np.float32) + 0.5
    vol = gaussian_filter(blobs, (1.0, 1.5, 1.5)).astype(np.float32)
    return vol / vol.max()


def run(name, displaced, fixed, flow_gt, config=None, options=None):
    t0 = time.perf_counter()
    registered, flow = compensate_arr_3D(
        displaced[None, ..., None], fixed[..., None], options=options,
        config=config)
    dt = time.perf_counter() - t0
    epe = evaluate_flow_accuracy(flow[0], flow_gt, boundary=4)
    ratio = improvement_ratio(fixed, displaced, registered[0, ..., 0],
                              boundary=4)
    print(f"{name:<28s} {dt:7.2f}s  EPE {epe:6.3f}  improvement "
          f"{ratio:6.2f}x")
    return flow[0]


def main():
    mode = os.environ.get("FLOWREG3D_MODE", "both").lower()
    shape = (16, 96, 96)
    fix_seed(1)
    rng = np.random.default_rng(1)
    fixed = make_volume(shape, rng)
    flow_gt, _ = get_low_disp_3d_generator()(
        depth=shape[0], height=shape[1], width=shape[2])
    displaced = warp_volume_splat3d(fixed, flow_gt)

    opts = OFOptions(quality_setting="balanced")
    print(f"{'estimator':<28s} {'time':>8s}  {'EPE':>10s}  improvement")

    if mode in ("variational", "both"):
        run("flowreg3D variational", displaced, fixed, flow_gt,
            options=opts)

    if mode in ("volraft", "both"):
        backend = load_volraft()
        run(f"volRAFT ({type(backend).__name__})", displaced, fixed,
            flow_gt, config=RegistrationConfig(
                get_displacement_func=backend))

    if mode == "both":
        # combined: deep backend provides the initialization, the
        # variational solver refines (uvw chaining through OFOptions)
        backend = load_volraft()
        init = backend(fixed, displaced)

        from flowreg3d_tpu.core.pyramid import get_displacement
        from flowreg3d_tpu.ops.warp import imregister_wrapper

        t0 = time.perf_counter()
        flow = np.asarray(get_displacement(
            fixed, displaced, uvw=init, **opts.to_dict()))
        reg = np.asarray(imregister_wrapper(
            displaced, flow[..., 0], flow[..., 1], flow[..., 2], fixed,
            interpolation_method="cubic"))
        dt = time.perf_counter() - t0
        epe = evaluate_flow_accuracy(flow, flow_gt, boundary=4)
        ratio = improvement_ratio(fixed, displaced, reg, boundary=4)
        print(f"{'combined (init+refine)':<28s} {dt:7.2f}s  EPE "
              f"{epe:6.3f}  improvement {ratio:6.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
