"""Synthetic EPE benchmark (parity: reference examples/motion_correct_3d_test.py).

Generates a ground-truth displacement field with the motion generators,
forward-warps a synthetic 2P-like volume, estimates the flow with the full
pyramid, and scores End-Point Error + MAE improvement — the reference's
canonical correctness harness (:620-745), self-contained (no dataset needed).

Run: python examples/motion_correct_3d_test.py [generator] [zdim ydim xdim]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import time

import numpy as np
from scipy.ndimage import gaussian_filter

from flowreg3d_tpu import get_displacement, imregister_wrapper
from flowreg3d_tpu.motion_generation import (
    evaluate_flow_accuracy,
    get_default_3d_generator,
    get_high_disp_3d_generator,
    get_low_disp_3d_generator,
    get_test_3d_generator,
    improvement_ratio,
    warp_volume_splat3d,
)
from flowreg3d_tpu.util.random import fix_seed

GENERATORS = {
    "default": get_default_3d_generator,
    "low_disp": get_low_disp_3d_generator,
    "test": get_test_3d_generator,
    "high_disp": get_high_disp_3d_generator,
}

# canonical params (reference examples/motion_correct_3d_test.py:692-706)
FLOW_PARAMS = dict(alpha=(0.25, 0.25, 0.25), iterations=100, a_data=0.45,
                   a_smooth=1.0, levels=50, eta=0.8, update_lag=5,
                   min_level=5, const_assumption="gc")


def synthetic_stack(shape, rng, n_blobs=3000):
    vol = np.zeros(shape, np.float32)
    idx = tuple(rng.integers(2, s - 2, n_blobs) for s in shape)
    vol[idx] = rng.random(n_blobs).astype(np.float32) + 0.5
    vol = gaussian_filter(vol, (1.0, 2.0, 2.0))
    return (vol / vol.max()).astype(np.float32)


def preprocess(f1, f2):
    """sigma-0.5 Gaussian + normalize by f1 range (reference :316-332)."""
    f1 = gaussian_filter(f1, 0.5)
    f2 = gaussian_filter(f2, 0.5)
    lo, hi = f1.min(), f1.max()
    rng_ = hi - lo if hi > lo else 1.0
    return (f1 - lo) / rng_, (f2 - lo) / rng_


def main():
    gen_name = sys.argv[1] if len(sys.argv) > 1 else "low_disp"
    shape = (tuple(int(a) for a in sys.argv[2:5]) if len(sys.argv) >= 5
             else (32, 128, 128))
    fix_seed(1)
    rng = np.random.default_rng(1)

    print(f"Generator: {gen_name}, volume {shape}")
    original = synthetic_stack(shape, rng)
    flow_gt, _ = GENERATORS[gen_name]()(depth=shape[0], height=shape[1],
                                        width=shape[2], rng=rng)
    displaced = warp_volume_splat3d(original, flow_gt)

    boundary = 10
    sl = np.s_[boundary:-boundary, boundary:-boundary, boundary:-boundary]
    original_c, displaced_c, flow_gt_c = original[sl], displaced[sl], flow_gt[sl]

    f1, f2 = preprocess(original_c, displaced_c)
    t0 = time.perf_counter()
    flow_est = np.asarray(get_displacement(f1, f2, **FLOW_PARAMS))
    print(f"Flow computation: {time.perf_counter() - t0:.2f}s "
          "(includes compile on first run)")

    corrected = np.asarray(imregister_wrapper(
        displaced_c, flow_est[..., 0], flow_est[..., 1], flow_est[..., 2],
        original_c, interpolation_method="cubic"))

    eval_boundary = min(8, min(flow_est.shape[:3]) // 4)
    epe = evaluate_flow_accuracy(flow_est, flow_gt_c, boundary=eval_boundary)
    ratio = improvement_ratio(original_c, displaced_c, corrected)
    print(f"End-Point Error (EPE): {epe:.3f} px")
    print(f"MAE improvement ratio: {ratio:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
