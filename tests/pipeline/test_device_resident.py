"""Device-resident pipeline: equivalence with the legacy host-staged path.

The resident engine (pipeline/device_pipeline.py) must produce the same
registered frames, statistics, flows, and valid masks as the legacy path —
the same compiled per-frame programs run either way; only the staging of
data between them differs.
"""

import numpy as np
import pytest

from flowreg3d_tpu.pipeline.corrector import (
    BatchMotionCorrector,
    RegistrationConfig,
    compensate_recording,
)
from flowreg3d_tpu.pipeline.of_options import OFOptions


def _make_movie(rng, T=5, Z=8, Y=24, X=24, dtype=np.uint16):
    base = rng.uniform(0, 1, (Z + 4, Y + 8, X + 8))
    from scipy.ndimage import gaussian_filter, shift

    base = gaussian_filter(base, 1.5)
    frames = []
    for t in range(T):
        s = shift(base, (0.3 * t % 1.5, 0.7 * t % 2.0, -0.5 * t % 2.0),
                  order=1, mode="nearest")
        frames.append(s[2:2 + Z, 4:4 + Y, 4:4 + X])
    arr = np.stack(frames)
    arr = (arr - arr.min()) / (arr.max() - arr.min() + 1e-9)
    if np.issubdtype(np.dtype(dtype), np.integer):
        return (arr * 10000).astype(dtype)
    return arr.astype(dtype)


def _options(tmp_path, inp, name, **kw):
    defaults = dict(
        input_file=inp, output_path=str(tmp_path / name),
        output_format="HDF5", quality_setting="fast",
        alpha=(1.5, 1.5, 1.5), iterations=8, levels=8, min_level=2,
        buffer_size=3, save_w=False, save_meta_info=True,
        reference_frames=[0, 1],
    )
    defaults.update(kw)
    return OFOptions(**defaults)


def _run_both(tmp_path, movie, rng, **opt_kw):
    import h5py

    inp = str(tmp_path / "in.h5")
    with h5py.File(inp, "w") as f:
        f.create_dataset("mov", data=movie)

    out = {}
    for mode, resident in (("res", None), ("leg", False)):
        opts = _options(tmp_path, inp, f"out_{mode}", **opt_kw)
        cfg = RegistrationConfig(parallelization="sequential",
                                 device_resident=resident,
                                 prefetch=0, async_write=False)
        corr = BatchMotionCorrector(opts, cfg)
        corr.run()
        if resident is None:
            assert corr.used_device_resident, \
                "resident path should have engaged"
        else:
            assert not corr.used_device_resident
        comp = next((tmp_path / f"out_{mode}").glob("compensated.*"))
        with h5py.File(str(comp), "r") as f:
            key = list(f.keys())[0]
            out[mode] = {"reg": np.asarray(f[key])}
        stats = np.load(str(tmp_path / f"out_{mode}" / "statistics.npz"))
        out[mode]["stats"] = {k: stats[k] for k in stats.files}
        out[mode]["corr"] = corr
    return out


@pytest.fixture(scope="module")
def movie(rng):
    return _make_movie(np.random.default_rng(7))


@pytest.fixture(scope="module")
def default_run(tmp_path_factory, movie):
    tmp = tmp_path_factory.mktemp("resident_default")
    return _run_both(tmp, movie, None)


def test_resident_matches_legacy_registered(default_run):
    out = default_run
    reg_r = out["res"]["reg"].astype(np.float64)
    reg_l = out["leg"]["reg"].astype(np.float64)
    assert reg_r.shape == reg_l.shape
    scale = float(np.abs(reg_l).max()) or 1.0
    # same programs modulo f32-vs-f64 preprocess staging; integers round
    assert np.max(np.abs(reg_r - reg_l)) / scale < 5e-3
    # the overwhelming majority of voxels must agree to the last integer bit
    frac_exact = np.mean(reg_r == reg_l)
    assert frac_exact > 0.95


def test_resident_matches_legacy_stats(default_run):
    out = default_run
    for k in ("mean_disp", "max_disp", "mean_div", "mean_translation"):
        a = out["res"]["stats"][k]
        b = out["leg"]["stats"][k]
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-3)


def test_resident_save_w_and_valid_idx(tmp_path, movie, rng):
    import h5py

    inp = str(tmp_path / "in.h5")
    with h5py.File(inp, "w") as f:
        f.create_dataset("mov", data=movie)
    flows = {}
    vidx = {}
    for mode, resident in (("res", None), ("leg", False)):
        opts = _options(tmp_path, inp, f"w_{mode}", save_w=True)
        opts.save_valid_idx = True
        cfg = RegistrationConfig(parallelization="sequential",
                                 device_resident=resident,
                                 prefetch=0, async_write=False)
        corr = BatchMotionCorrector(opts, cfg)
        corr.run()
        with h5py.File(str(tmp_path / f"w_{mode}" / "w.h5"), "r") as f:
            flows[mode] = np.stack(
                [np.asarray(f[k]) for k in ("u", "v", "w")], axis=-1)
        vidx[mode] = np.load(str(tmp_path / f"w_{mode}" / "valid_idx.npy"))
    assert flows["res"].shape == flows["leg"].shape
    np.testing.assert_allclose(flows["res"], flows["leg"],
                               rtol=5e-2, atol=5e-3)
    np.testing.assert_array_equal(vidx["res"], vidx["leg"])


@pytest.mark.slow
def test_resident_update_reference(tmp_path, movie, rng):
    out = _run_both(tmp_path, movie, rng, update_reference=True,
                    min_level=1)
    reg_r = out["res"]["reg"].astype(np.float64)
    reg_l = out["leg"]["reg"].astype(np.float64)
    scale = float(np.abs(reg_l).max()) or 1.0
    assert np.max(np.abs(reg_r - reg_l)) / scale < 5e-3


@pytest.mark.slow
def test_resident_checkpoint_resume(tmp_path, movie):
    import h5py

    inp = str(tmp_path / "in.h5")
    with h5py.File(inp, "w") as f:
        f.create_dataset("mov", data=movie)

    # uninterrupted run
    opts = _options(tmp_path, inp, "full")
    cfg = RegistrationConfig(parallelization="sequential", checkpoint=True,
                             prefetch=0, async_write=False)
    compensate_recording(opts, config=cfg)

    # interrupted after batch 1, then resumed
    opts2 = _options(tmp_path, inp, "resumed")
    corr = BatchMotionCorrector(opts2, RegistrationConfig(
        parallelization="sequential", checkpoint=True, prefetch=0,
        async_write=False))

    class Stop(Exception):
        pass

    calls = {"n": 0}
    orig = corr._process_batch_resident

    def boom(batch):
        calls["n"] += 1
        if calls["n"] == 2:
            raise Stop()
        return orig(batch)

    corr._process_batch_resident = boom
    with pytest.raises(Stop):
        corr.run()
    assert (tmp_path / "resumed" / "checkpoint.npz").exists()

    corr2 = BatchMotionCorrector(
        _options(tmp_path, inp, "resumed"),
        RegistrationConfig(parallelization="sequential", checkpoint=True,
                           prefetch=0, async_write=False))
    corr2.run()

    with h5py.File(str(next((tmp_path / "full").glob("compensated.*"))),
                   "r") as f:
        full = np.asarray(f[list(f.keys())[0]])
    with h5py.File(str(next((tmp_path / "resumed").glob("compensated.*"))),
                   "r") as f:
        resumed = np.asarray(f[list(f.keys())[0]])
    # resume semantics (pinned by test_checkpoint_resume): the resumed
    # run's output holds only the frames processed after the checkpoint
    done = 3  # batch 1 of buffer_size=3
    assert resumed.shape[0] == full.shape[0] - done
    scale = float(np.abs(full).max()) or 1.0
    assert np.max(np.abs(full[done:].astype(np.float64)
                         - resumed.astype(np.float64))) / scale < 5e-3


@pytest.mark.slow
def test_resident_float_input_roundtrip(tmp_path, rng):
    movie = _make_movie(np.random.default_rng(3), dtype=np.float32)
    out = _run_both(tmp_path, movie, rng)
    assert out["res"]["reg"].dtype == np.float32
    np.testing.assert_allclose(out["res"]["reg"], out["leg"]["reg"],
                               rtol=5e-3, atol=5e-3)


def test_resident_mesh_matches_single(tmp_path, movie, rng):
    import h5py

    inp = str(tmp_path / "in.h5")
    with h5py.File(inp, "w") as f:
        f.create_dataset("mov", data=movie)
    regs = {}
    for mode, par in (("seq", "sequential"), ("mesh", "mesh")):
        opts = _options(tmp_path, inp, f"m_{mode}")
        cfg = RegistrationConfig(parallelization=par, prefetch=0,
                                 async_write=False, device_resident=True)
        corr = BatchMotionCorrector(opts, cfg)
        corr.run()
        assert corr.used_device_resident
        comp = next((tmp_path / f"m_{mode}").glob("compensated.*"))
        with h5py.File(str(comp), "r") as f:
            regs[mode] = np.asarray(f[list(f.keys())[0]])
    np.testing.assert_array_equal(regs["seq"], regs["mesh"])


@pytest.mark.slow
def test_resident_mesh_update_reference_matches_single(tmp_path, movie):
    """update_reference under the mesh executor exercises the psum'd
    compensated-frame accumulator — must match the single-device path."""
    import h5py

    inp = str(tmp_path / "in.h5")
    with h5py.File(inp, "w") as f:
        f.create_dataset("mov", data=movie)
    regs = {}
    for mode, par in (("seq", "sequential"), ("mesh", "mesh")):
        opts = _options(tmp_path, inp, f"mu_{mode}", update_reference=True,
                        min_level=1)
        cfg = RegistrationConfig(parallelization=par, prefetch=0,
                                 async_write=False, device_resident=True)
        corr = BatchMotionCorrector(opts, cfg)
        corr.run()
        assert corr.used_device_resident
        comp = next((tmp_path / f"mu_{mode}").glob("compensated.*"))
        with h5py.File(str(comp), "r") as f:
            regs[mode] = np.asarray(f[list(f.keys())[0]])
    # psum reduction order may differ from the sequential sum at the last
    # bit; the registered outputs must agree to integer rounding
    diff = np.abs(regs["seq"].astype(np.int64)
                  - regs["mesh"].astype(np.int64))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


def test_resident_refuses_unsupported_when_required(tmp_path, movie):
    import h5py

    inp = str(tmp_path / "in.h5")
    with h5py.File(inp, "w") as f:
        f.create_dataset("mov", data=movie)
    opts = _options(tmp_path, inp, "bad")
    opts.preproc_funct = lambda x: x
    cfg = RegistrationConfig(parallelization="sequential",
                             device_resident=True, prefetch=0,
                             async_write=False)
    corr = BatchMotionCorrector(opts, cfg)
    with pytest.raises(ValueError, match="device_resident"):
        corr.run()
