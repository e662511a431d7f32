"""Run the REFERENCE implementation (its torch path) for baselines/parity.

The reference at /root/reference ships two numeric backends: numba (CPU)
and torch (GPU-capable, runs on CPU too). numba is not installable here
(no egress — BASELINE.md), but torch IS in the image, so the reference's
own `core/torch/optical_flow_3d.get_displacement` can be executed
directly — giving (a) a REAL reference denominator for the throughput
table and (b) a cross-implementation flow oracle for accuracy rows,
replacing the same-algorithm XLA-CPU stand-in used through round 3.

The numba package import is stubbed (identity @njit) because
`flowreg3d.core.__init__` imports the numba solver at package import;
the stubbed kernels are never called on the torch path.

Usage:
  python scripts/run_reference_torch.py bench          # canonical 512x512x64 s/volume
  python scripts/run_reference_torch.py flow --params convergent \
      --inputs case.npz --out flow_ref.npy             # flow on a saved case
"""

import argparse
import os
import sys
import time
import types

# numba import stub (see module docstring)
_numba = types.ModuleType("numba")


def _njit(*a, **k):
    if len(a) == 1 and callable(a[0]):
        return a[0]
    return lambda f: f


_numba.njit = _njit
_numba.prange = range
sys.modules.setdefault("numba", _numba)

REFERENCE_SRC = "/root/reference/src"
sys.path.insert(0, REFERENCE_SRC)

import numpy as np  # noqa: E402
import torch  # noqa: E402

PARAM_SETS = {
    # reference examples/motion_correct_3d_test.py:692-706
    "canonical": dict(alpha=(0.25, 0.25, 0.25), update_lag=5,
                      iterations=100, min_level=5, levels=50, eta=0.8,
                      a_smooth=1.0, a_data=0.45),
    "convergent": dict(alpha=(1.5, 1.5, 1.5), update_lag=5, iterations=50,
                       min_level=0, levels=50, eta=0.8, a_smooth=1.0,
                       a_data=0.45),
}


def _ref_get_displacement():
    from flowreg3d.core.torch.optical_flow_3d import get_displacement

    return get_displacement


def cmd_bench(args):
    from scipy.ndimage import gaussian_filter

    torch.set_num_threads(os.cpu_count())
    rng = np.random.default_rng(0)
    shape = tuple(int(s) for s in args.shape.split(","))
    blobs = np.zeros(shape, np.float32)
    idx = tuple(rng.integers(2, s - 2, 4000) for s in shape)
    blobs[idx] = rng.random(4000).astype(np.float32) + 0.5
    fixed = gaussian_filter(blobs, (1.0, 2.0, 2.0)).astype(np.float32)
    fixed /= fixed.max()
    moving = np.roll(fixed, (1, 5, -4), axis=(0, 1, 2))
    gd = _ref_get_displacement()
    from flowreg3d.core.torch.optical_flow_3d import imregister_wrapper

    params = PARAM_SETS[args.params]
    t0 = time.time()
    flow = gd(torch.from_numpy(fixed.copy()), torch.from_numpy(moving.copy()),
              **params)
    # apples-to-apples with bench.py's step: flow + the output warp.
    # The reference's torch get_displacement returns float64 flow; its
    # grid_sampler requires matching dtypes, so warp in float64 (the
    # reference's own compensate path also upcasts, OF_options dtype).
    mv64 = torch.from_numpy(moving.copy()).double()
    imregister_wrapper(mv64, flow[..., 0], flow[..., 1], flow[..., 2],
                       torch.from_numpy(fixed.copy()).double())
    dt = time.time() - t0
    rate = 1.0 / dt
    print(f"reference torch CPU {args.params} {shape}: {dt:.1f} s/volume "
          f"= {rate:.5f} volumes/sec "
          f"({torch.get_num_threads()} torch threads)")
    if args.json_out:
        import hashlib
        import json

        blob = json.dumps({"shape": list(shape), "params": {
            k: (list(v) if isinstance(v, tuple) else v)
            for k, v in params.items()}}, sort_keys=True)
        h = hashlib.sha256(blob.encode()).hexdigest()[:16]
        with open(args.json_out, "w") as fh:
            json.dump({"hash_params": h, "volumes_per_sec": rate,
                       "note": "REFERENCE implementation (torch backend) "
                               "on host CPU, flow + output warp"}, fh)


def cmd_flow(args):
    gd = _ref_get_displacement()
    data = np.load(args.inputs)
    params = PARAM_SETS[args.params]
    t0 = time.time()
    flow = gd(torch.from_numpy(np.ascontiguousarray(data["fixed"])),
              torch.from_numpy(np.ascontiguousarray(data["moving"])),
              **params)
    print(f"reference torch flow in {time.time() - t0:.1f}s",
          file=sys.stderr)
    np.save(args.out, np.asarray(flow))
    print(args.out)


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("bench")
    b.add_argument("--shape", default="64,512,512")
    b.add_argument("--params", default="canonical", choices=PARAM_SETS)
    b.add_argument("--json-out", default=None,
                   help="write {hash_params, volumes_per_sec} JSON here")
    b.set_defaults(fn=cmd_bench)
    f = sub.add_parser("flow")
    f.add_argument("--inputs", required=True, help=".npz with fixed/moving")
    f.add_argument("--out", required=True)
    f.add_argument("--params", default="canonical", choices=PARAM_SETS)
    f.set_defaults(fn=cmd_flow)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
