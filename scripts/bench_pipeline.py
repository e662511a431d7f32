"""End-to-end production-pipeline benchmark (BASELINE.md configs 2-3).

Measures the full streamed ``compensate_recording`` path exactly as a user
runs it — HDF5 series in → preprocess (normalize vs reference + Gaussian)
→ register (executor tier with prefetch + async write + deferred
downloads) → HDF5 out — and reports volumes/sec INCLUDING all I/O, next
to two decompositions measured in the same process/claim:

  * device-only rate: the bench.py-style chained flow+warp stream on
    resident arrays (no host I/O at all);
  * host-I/O-only rate: reading batches from the input HDF5 and writing
    them back unmodified (no device work).

The overlap conclusion is drawn from the three: with perfect overlap the
e2e rate approaches min(device-only, host-I/O-only); with no overlap it
degrades toward the serial harmonic combination.

Reference counterpart: the reference streams via its executor pool
(compensate_recording_3D.py:431-557) and prints per-batch fps; it
publishes no numbers (BASELINE.md).

Environment caveat (recorded with every result): through the remote-TPU
tunnel in this environment host<->device moves ~16 MB/s, so at the
canonical 512x512x64 shape e2e is TRANSFER-bound, not compute- or
file-I/O-bound; on directly-attached TPU hosts (GB/s DMA) the device-only
rate is the binding term. Use --shape to pick sizes; the default keeps
the canonical benchmark shape for comparability with bench.py.

Usage:  python scripts/bench_pipeline.py [--shape Z,Y,X] [--frames N]
            [--config organoid|2p] [--out results.json]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flowreg3d_tpu.util.compile_cache import enable_compile_cache

enable_compile_cache()

# the axon sitecustomize pins jax_platforms at interpreter start; honor an
# explicit JAX_PLATFORMS=cpu request by re-asserting it post-import
import os  # noqa: E402

if os.environ.get("JAX_PLATFORMS", "").lower().startswith("cpu"):
    import jax

    jax.config.update("jax_platforms", "cpu")


def _log(msg, _t0=[None]):
    if _t0[0] is None:
        _t0[0] = time.perf_counter()
    print(f"[pipe-bench {time.perf_counter() - _t0[0]:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def make_series(path, shape, n_frames, seed=0):
    """Synthetic 2P-like series: smoothed blob volume drifting over time,
    written as a MATLAB-layout HDF5 (one ch1 dataset)."""
    from scipy.ndimage import gaussian_filter

    from flowreg3d_tpu.io.hdf5 import HDF5FileWriter3D

    rng = np.random.default_rng(seed)
    Z, Y, X = shape
    blobs = np.zeros(shape, np.float32)
    n = max(1000, (Z * Y * X) // 4000)
    idx = tuple(rng.integers(2, s - 2, n) for s in shape)
    blobs[idx] = rng.random(n).astype(np.float32) + 0.5
    base = gaussian_filter(blobs, (1.0, 2.0, 2.0))
    base = (base / base.max() * 4000.0).astype(np.float32)

    writer = HDF5FileWriter3D(str(path))
    shifts = []
    for t in range(n_frames):
        dz = int(rng.integers(-1, 2))
        dy = int(rng.integers(-6, 7))
        dx = int(rng.integers(-6, 7))
        shifts.append((dz, dy, dx))
        vol = np.roll(base, (dz, dy, dx), axis=(0, 1, 2))
        vol = vol + rng.normal(0.0, 40.0, size=shape).astype(np.float32)
        frame = np.clip(vol, 0, 65535).astype(np.uint16)[None, ..., None]
        writer.write_frames(frame)
    writer.close()
    return shifts


CONFIGS = {
    # BASELINE config 3: canonical 2P time-series params (reference
    # examples/motion_correct_3d_test.py:692-706 solver params + streaming
    # pipeline defaults)
    "2p": dict(alpha=(0.25, 0.25, 0.25), iterations=100, levels=50,
               eta=0.8, min_level=5, update_lag=5, a_data=0.45,
               a_smooth=1.0, quality="custom"),
    # BASELINE config 2: the organoid example's settings
    # (examples/correct_organoid.py: balanced quality, alpha 1.5)
    "organoid": dict(alpha=(1.5, 1.5, 1.5), iterations=50, levels=100,
                     eta=0.8, min_level=-1, update_lag=5, a_data=0.45,
                     a_smooth=1.0, quality="balanced"),
}


def _effective_min_level(cfg):
    """One source of truth: OFOptions' preset mapping (of_options.py),
    not a local hardcode that can drift from it."""
    from flowreg3d_tpu.pipeline import OFOptions

    return OFOptions(quality_setting=cfg["quality"],
                     min_level=cfg["min_level"]).effective_min_level


def run_pipeline(tmp, shape, n_frames, cfg_name, batch_size):
    from flowreg3d_tpu.pipeline import (OFOptions, RegistrationConfig,
                                        compensate_recording)

    cfg = CONFIGS[cfg_name]
    inp = Path(tmp) / "series.h5"
    out = Path(tmp) / "out"
    _log(f"writing synthetic series {shape} x {n_frames} frames")
    make_series(inp, shape, n_frames)

    kw = dict(alpha=cfg["alpha"], iterations=cfg["iterations"],
              levels=cfg["levels"], eta=cfg["eta"],
              update_lag=cfg["update_lag"], a_data=cfg["a_data"],
              a_smooth=cfg["a_smooth"],
              input_file=str(inp), output_path=str(out),
              output_format="HDF5", save_w=False, save_meta_info=True,
              reference_frames=list(range(min(5, n_frames))),
              buffer_size=batch_size)
    if cfg["quality"] == "custom":
        kw["min_level"] = cfg["min_level"]
        kw["quality_setting"] = "custom"
    else:
        kw["quality_setting"] = cfg["quality"]
        kw["min_level"] = cfg["min_level"]
    options = OFOptions(**kw)
    config = RegistrationConfig(batch_size=batch_size, verbose=True,
                                prefetch=2, async_write=True)

    _log(f"running compensate_recording ({cfg_name})")
    t0 = time.perf_counter()
    compensate_recording(options, config=config)
    dt = time.perf_counter() - t0
    _log(f"e2e done: {dt:.1f}s for {n_frames} frames")
    return n_frames / dt


def run_io_only(tmp, shape, n_frames, batch_size):
    """Read every batch from the input and write it straight back out."""
    from flowreg3d_tpu.io.factory import (get_video_file_reader,
                                          get_video_file_writer)

    inp = Path(tmp) / "series.h5"
    outp = Path(tmp) / "io_only.h5"
    reader = get_video_file_reader(str(inp), buffer_size=batch_size)
    writer = get_video_file_writer(str(outp), "HDF5")
    t0 = time.perf_counter()
    n = 0
    while reader.has_batch():
        batch = reader.read_batch()
        writer.write_frames(batch.astype(np.float32))
        n += batch.shape[0]
    writer.close()
    reader.close()
    dt = time.perf_counter() - t0
    _log(f"host-I/O-only: {dt:.1f}s for {n} frames")
    return n / dt


def run_device_only(shape, n_steps, cfg_name):
    """bench.py-style chained stream on resident arrays."""
    import jax

    from flowreg3d_tpu.core.pyramid import (build_pyramid_raw,
                                            pyramid_config_key)
    from flowreg3d_tpu.ops.warp import imregister_wrapper

    cfg = CONFIGS[cfg_name]
    min_level = _effective_min_level(cfg)
    key = pyramid_config_key(
        shape, 1, alpha=cfg["alpha"], update_lag=cfg["update_lag"],
        iterations=cfg["iterations"], min_level=min_level,
        levels=cfg["levels"], eta=cfg["eta"], a_smooth=cfg["a_smooth"],
        a_data=cfg["a_data"])
    pyramid = jax.jit(build_pyramid_raw(*key))
    warp = jax.jit(lambda moving, flow, fixed: imregister_wrapper(
        moving, flow[..., 0], flow[..., 1], flow[..., 2], fixed,
        interpolation_method="cubic"))

    rng = np.random.default_rng(0)
    import jax.numpy as jnp
    fx = jnp.asarray(rng.random(shape + (1,)), jnp.float32)
    mv = jnp.roll(fx, (1, 5, -4), axis=(0, 1, 2))
    uvw = jnp.zeros(shape + (3,), jnp.float32)
    wt = jnp.ones(shape + (1,), jnp.float32)

    def stream(n):
        u = uvw
        last = None
        for _ in range(n):
            flow = pyramid(fx, mv, u, wt)
            last = warp(mv, flow, fx)
            u = flow
        return float(jnp.sum(last[0, 0, 0]) + jnp.sum(u[0, 0, 0]))

    stream(2)  # warm
    t0 = time.perf_counter()
    stream(n_steps)
    dt = (time.perf_counter() - t0) / n_steps
    _log(f"device-only: {dt:.3f}s/volume")
    return 1.0 / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="64,512,512",
                    help="Z,Y,X (default canonical 64,512,512)")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=5)
    ap.add_argument("--config", default="2p", choices=sorted(CONFIGS))
    ap.add_argument("--skip-device-only", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--tmp", default=None,
                    help="work dir (default: a fresh TemporaryDirectory)")
    args = ap.parse_args()
    shape = tuple(int(s) for s in args.shape.split(","))

    import tempfile
    ctx = (tempfile.TemporaryDirectory() if args.tmp is None else None)
    tmp = args.tmp if args.tmp is not None else ctx.name
    try:
        e2e = run_pipeline(tmp, shape, args.frames, args.config,
                           args.batch_size)
        io_rate = run_io_only(tmp, shape, args.frames, args.batch_size)
        dev_rate = (None if args.skip_device_only
                    else run_device_only(shape, 4, args.config))
    finally:
        if ctx is not None:
            ctx.cleanup()

    serial = (1.0 / (1.0 / e2e) if dev_rate is None else
              1.0 / (1.0 / dev_rate + 1.0 / io_rate))
    result = {
        "metric": f"e2e compensate_recording volumes/sec "
                  f"({args.config}, {shape}, HDF5 in/out)",
        "value": round(e2e, 4),
        "unit": "volumes/sec",
        "device_only": None if dev_rate is None else round(dev_rate, 4),
        "host_io_only": round(io_rate, 4),
        "no_overlap_bound": round(serial, 4),
        "frames": args.frames,
    }
    print(json.dumps(result))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
