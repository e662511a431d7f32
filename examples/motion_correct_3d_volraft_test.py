"""volRAFT deep-flow backend example (parity: reference
examples/motion_correct_3d_volraft_test.py).

Runs a sliding-window patch-inference displacement backend through the
full pipeline (reader -> executor -> backend -> warp -> writer) on a
synthetic displaced volume and scores EPE + MAE improvement. With
``VOLRAFT_CHECKPOINT_DIR`` set to a directory containing a TorchScript
``volraft.pt`` the real network runs; otherwise the dependency-free
patch-rigid mock is used (same harness, same integration point).

Run: python examples/motion_correct_3d_volraft_test.py [zdim ydim xdim]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import time

import numpy as np
from scipy.ndimage import gaussian_filter

from flowreg3d_tpu.backends import load_volraft
from flowreg3d_tpu.motion_generation import (
    evaluate_flow_accuracy,
    get_low_disp_3d_generator,
    improvement_ratio,
    warp_volume_splat3d,
)
from flowreg3d_tpu.pipeline import compensate_arr_3D
from flowreg3d_tpu.pipeline.corrector import RegistrationConfig
from flowreg3d_tpu.util.random import fix_seed


def make_volume(shape, rng):
    blobs = np.zeros(shape, np.float32)
    n = max(200, int(np.prod(shape) // 500))
    idx = tuple(rng.integers(2, s - 2, n) for s in shape)
    blobs[idx] = rng.random(n).astype(np.float32) + 0.5
    vol = gaussian_filter(blobs, (1.0, 1.5, 1.5)).astype(np.float32)
    return vol / vol.max()


def main():
    shape = tuple(int(a) for a in sys.argv[1:4]) or (16, 96, 96)
    fix_seed(1)
    rng = np.random.default_rng(1)

    fixed = make_volume(shape, rng)
    flow_gt, _ = get_low_disp_3d_generator()(
        depth=shape[0], height=shape[1], width=shape[2])
    displaced = warp_volume_splat3d(fixed, flow_gt)

    backend = load_volraft()
    print(f"backend: {type(backend).__name__}")

    t0 = time.perf_counter()
    registered, flow_est = compensate_arr_3D(
        displaced[None, ..., None], fixed[..., None],
        config=RegistrationConfig(get_displacement_func=backend))
    dt = time.perf_counter() - t0

    epe = evaluate_flow_accuracy(flow_est[0], flow_gt, boundary=4)
    ratio = improvement_ratio(fixed, displaced, registered[0, ..., 0],
                              boundary=4)
    print(f"inference: {dt:.2f} s")
    print(f"EPE vs ground truth: {epe:.3f} voxels")
    print(f"MAE improvement ratio: {ratio:.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
