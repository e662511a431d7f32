"""Canonical accuracy benchmark (BASELINE.md north star, config 4).

Pins the numbers the north star asks for, at the canonical benchmark
configuration (512x512x64, canonical solver params — reference
examples/motion_correct_3d_test.py:692-706):

  * **EPE(TPU f32 pyramid, CPU f64 oracle)** — "flow EPE within 1e-3 of
    the CPU solver". The oracle is the same algorithm run in float64 on
    the XLA CPU backend (the reference's own CPU path is float64,
    core/optical_flow_3d.py:334-335).
  * **EPE vs synthetic ground truth** (boundary=25) for both paths, plus
    the MAE improvement ratio — the reference's own quality harness
    (examples/motion_correct_3d_test.py:474-501, 736-745).

Ground-truth motion comes from the motion_generation tier (high_disp
preset: rotation + translation + scan jitter + expansion), forward-applied
with the backward warper on the inverse field the same way the reference
harness displaces its input.

Phases (each standalone, results merged into --out):
  --phase cpu     f64 oracle on the CPU backend (hours-scale at full res;
                  run once, cached by config hash)
  --phase tpu     f32 pyramid on the accelerator
  --phase report  merge + print the accuracy table

Full-res f64 on one CPU is slow; --shape lets CI-scale runs pin the same
contract at smaller sizes.
"""

import argparse
import hashlib
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flowreg3d_tpu.util.compile_cache import enable_compile_cache

enable_compile_cache()

import os  # noqa: E402

if os.environ.get("JAX_PLATFORMS", "").lower().startswith("cpu"):
    import jax

    jax.config.update("jax_platforms", "cpu")

FLOW_PARAMS = dict(alpha=(0.25, 0.25, 0.25), update_lag=5, iterations=100,
                   min_level=5, levels=50, eta=0.8, a_smooth=1.0,
                   a_data=0.45, const_assumption="gc")
BOUNDARY = 25


def _log(msg, _t0=[None]):
    if _t0[0] is None:
        _t0[0] = time.perf_counter()
    print(f"[accuracy {time.perf_counter() - _t0[0]:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def make_case(shape, seed=1):
    """(fixed, moving, flow_gt): blob volume + generated GT displacement.

    The moving volume is produced by BACKWARD-warping the fixed volume
    with flow_gt, so the flow that maps moving back onto fixed — what
    get_displacement estimates — is exactly flow_gt.
    """
    from scipy.ndimage import gaussian_filter

    from flowreg3d_tpu.motion_generation import (get_high_disp_3d_generator,
                                                 warp_volume_backward)

    rng = np.random.default_rng(seed)
    blobs = np.zeros(shape, np.float32)
    n = max(2000, (shape[0] * shape[1] * shape[2]) // 4000)
    idx = tuple(rng.integers(2, s - 2, n) for s in shape)
    blobs[idx] = rng.random(n).astype(np.float32) + 0.5
    fixed = gaussian_filter(blobs, (1.0, 2.0, 2.0)).astype(np.float32)
    fixed /= fixed.max()

    gen = get_high_disp_3d_generator()
    flow_gt, _ = gen(*shape, rng=np.random.default_rng(seed + 1))
    flow_gt = np.asarray(flow_gt, np.float32)
    # repo/tests convention (tests/core/test_pyramid.py): displacing by
    # -flow_gt makes get_displacement(fixed, moving) recover +flow_gt
    moving = np.asarray(
        warp_volume_backward(fixed, -flow_gt, "cubic"), np.float32)
    return fixed, moving, flow_gt


def _config_hash(shape):
    blob = json.dumps({"shape": list(shape), "params": {
        k: (list(v) if isinstance(v, tuple) else v)
        for k, v in FLOW_PARAMS.items()}, "boundary": BOUNDARY},
        sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def run_flow(fixed, moving, device_kind, dtype_name):
    import jax

    from flowreg3d_tpu.core.pyramid import (build_pyramid_raw,
                                            pyramid_config_key)

    if dtype_name == "float64":
        jax.config.update("jax_enable_x64", True)

    if device_kind == "cpu":
        device = jax.devices("cpu")[0]
    else:
        device = None
        for plat in ("tpu", "axon"):
            try:
                device = jax.devices(plat)[0]
                break
            except RuntimeError:
                continue
        if device is None:
            device = jax.devices()[0]
    _log(f"running {dtype_name} pyramid on {device}")

    shape = fixed.shape
    key = pyramid_config_key(shape, 1, dtype=np.dtype(dtype_name),
                             **FLOW_PARAMS)
    pyramid = jax.jit(build_pyramid_raw(*key), device=device)
    fx = jax.device_put(np.asarray(fixed, dtype_name)[..., None], device)
    mv = jax.device_put(np.asarray(moving, dtype_name)[..., None], device)
    uvw = jax.device_put(np.zeros(shape + (3,), dtype_name), device)
    wt = jax.device_put(np.ones(shape + (1,), dtype_name), device)
    t0 = time.perf_counter()
    flow = np.asarray(jax.block_until_ready(pyramid(fx, mv, uvw, wt)))
    _log(f"{dtype_name} flow done in {time.perf_counter() - t0:.1f}s")
    return flow


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", required=True,
                    choices=["cpu", "tpu", "report"])
    ap.add_argument("--shape", default="64,512,512")
    ap.add_argument("--out", default="/tmp/accuracy_results")
    args = ap.parse_args()
    shape = tuple(int(s) for s in args.shape.split(","))
    h = _config_hash(shape)
    outdir = Path(args.out)
    outdir.mkdir(parents=True, exist_ok=True)

    if args.phase in ("cpu", "tpu"):
        fixed, moving, flow_gt = make_case(shape)
        np.save(outdir / f"flow_gt_{h}.npy", flow_gt)
        if args.phase == "cpu":
            flow = run_flow(fixed, moving, "cpu", "float64")
        else:
            flow = run_flow(fixed, moving, "accel", "float32")
        np.save(outdir / f"flow_{args.phase}_{h}.npy", flow)
        _log(f"saved flow_{args.phase}_{h}.npy")
        return

    # report
    from flowreg3d_tpu.motion_generation.evaluation import (
        evaluate_flow_accuracy)

    gt = np.load(outdir / f"flow_gt_{h}.npy")
    # the canonical protocol uses boundary=25; small CI shapes shrink it
    # so the evaluated interior stays non-empty
    b = min(BOUNDARY, max(1, min(shape) // 4))
    rows = {}
    flows = {}
    for phase in ("cpu", "tpu"):
        p = outdir / f"flow_{phase}_{h}.npy"
        if p.exists():
            flows[phase] = np.load(p)
            rows[f"epe_{phase}_vs_gt"] = float(
                evaluate_flow_accuracy(flows[phase], gt, b))
    if "cpu" in flows and "tpu" in flows:
        rows["epe_tpu_vs_cpu_oracle"] = float(
            evaluate_flow_accuracy(flows["tpu"], flows["cpu"], b))
        rows["max_abs_tpu_vs_cpu_oracle"] = float(
            np.abs(flows["tpu"] - flows["cpu"])[b:-b, b:-b, b:-b].max())
    rows["shape"] = list(shape)
    rows["boundary"] = b
    rows["config_hash"] = h
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
