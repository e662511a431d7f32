"""The accuracy north-star gate (BASELINE.md, restated round 5).

Convergent regime (alpha=1.5, min_level=0): f32-vs-f64 of the same solver
must satisfy flow EPE <= 0.25, corrected-volume PSNR >= 40 dB, and
improvement ratios within 2% — the committed round-4 protocol numbers were
0.190 / 41.8 dB / 17.67x vs 17.70x at 32x128x128. The canonical regime is
chaotic under fp perturbation (BASELINE.md methodology finding) and is
gated on corrected-volume agreement in the benchmark harness, not here.

Each precision leg runs in its own subprocess: the f64 leg flips
jax_enable_x64, which must not leak into the test process.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[2]

_LEG = """
import os, sys
import numpy as np
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
sys.path.insert(0, {scripts!r})
import jax
jax.config.update("jax_platforms", "cpu")
import bench_accuracy as ba
ba.FLOW_PARAMS = ba.PARAM_SETS["convergent"]
fixed, moving, gt = ba.make_case((32, 128, 128))
flow = ba.run_flow(fixed, moving, "cpu", {dtype!r})
np.savez({out!r}, flow=flow, fixed=fixed, moving=moving, gt=gt)
"""


def _run_leg(tmp_path, dtype):
    out = str(tmp_path / f"leg_{dtype}.npz")
    code = _LEG.format(repo=str(REPO), scripts=str(REPO / "scripts"),
                       dtype=dtype, out=out)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=3000)
    assert r.returncode == 0, f"{dtype} leg failed:\n{r.stderr[-2000:]}"
    return np.load(out)


@pytest.mark.slow
def test_convergent_regime_gate(tmp_path):
    from flowreg3d_tpu.motion_generation.evaluation import (
        evaluate_flow_accuracy, improvement_ratio, psnr)
    from flowreg3d_tpu.ops.warp import imregister_wrapper

    f32 = _run_leg(tmp_path, "float32")
    f64 = _run_leg(tmp_path, "float64")
    # boundary crop per the harness protocol: full 25 would empty the
    # Z=32 interior (bench_accuracy.py report phase uses the same rule)
    b = min(25, 32 // 4)
    fixed, moving = f32["fixed"], f32["moving"]
    np.testing.assert_array_equal(fixed, f64["fixed"])

    epe = float(evaluate_flow_accuracy(f32["flow"],
                                       f64["flow"].astype(np.float32), b))
    assert epe <= 0.25, f"convergent f32-vs-f64 flow EPE {epe} > 0.25"

    corr = {}
    for tag, leg in (("f32", f32), ("f64", f64)):
        fl = np.asarray(leg["flow"], np.float32)
        corr[tag] = np.asarray(imregister_wrapper(
            moving, fl[..., 0], fl[..., 1], fl[..., 2], fixed,
            interpolation_method="cubic"))
    agree = float(psnr(corr["f32"][b:-b, b:-b, b:-b],
                       corr["f64"][b:-b, b:-b, b:-b], data_range=1.0))
    assert agree >= 40.0, f"corrected-volume agreement {agree} dB < 40"

    imp32 = improvement_ratio(fixed, moving, corr["f32"], boundary=b)
    imp64 = improvement_ratio(fixed, moving, corr["f64"], boundary=b)
    assert abs(imp32 - imp64) / imp64 <= 0.02, (
        f"improvement ratios diverge: {imp32} vs {imp64}")
    # and the correction must actually help, materially
    assert imp32 > 5.0
