"""End-to-end pipeline tests: in-memory + file-based, executor consistency,
progress callbacks, flow statistics. Mirrors the coverage of reference
tests/motion_correction/test_compensate_arr_3D.py,
test_compensate_recording_3D.py and test_parallelization.py at fast configs.
"""

import numpy as np
import pytest

from flowreg3d_tpu.pipeline import (
    RegistrationConfig,
    compensate_arr,
    compensate_recording,
    flow_statistics,
)

from tests.pipeline.conftest import fast_options


def test_compensate_arr_5d(video5d, base_volume):
    reg, w = compensate_arr(video5d, base_volume, options=fast_options())
    assert reg.shape == video5d.shape
    assert w.shape == video5d.shape[:4] + (3,)
    err_before = np.abs(video5d - base_volume[None]).mean()
    err_after = np.abs(reg - base_volume[None]).mean()
    assert err_after < err_before * 0.5


@pytest.mark.slow
def test_compensate_arr_shape_matrix(video5d, base_volume):
    # 4D input (T,Z,Y,X) + 3D reference
    reg, w = compensate_arr(video5d[..., 0], base_volume[..., 0],
                            options=fast_options())
    assert reg.shape == video5d.shape[:4]
    assert w.shape == video5d.shape[:4] + (3,)
    # 3D single volume
    reg, w = compensate_arr(video5d[1, ..., 0], base_volume[..., 0],
                            options=fast_options())
    assert reg.shape == video5d.shape[1:4]
    assert w.shape == video5d.shape[1:4] + (3,)


@pytest.mark.slow
def test_output_typename_casting(video5d, base_volume):
    reg, _ = compensate_arr(video5d, base_volume,
                            options=fast_options(output_typename="single"))
    assert reg.dtype == np.float32
    reg, _ = compensate_arr(video5d, base_volume,
                            options=fast_options(output_typename="uint16"))
    assert reg.dtype == np.uint16


@pytest.mark.slow
def test_executor_consistency(video5d, base_volume):
    """All executors must agree — the reference's cross-executor invariant
    (rtol 1e-5); ours are bit-identical by construction."""
    results = {}
    for name in ("sequential", "batched"):
        cfg = RegistrationConfig(parallelization=name)
        results[name] = compensate_arr(video5d, base_volume,
                                       options=fast_options(), config=cfg)
    r0, w0 = results["sequential"]
    r1, w1 = results["batched"]
    np.testing.assert_allclose(r0, r1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(w0, w1, rtol=1e-5, atol=1e-6)


def test_mesh_executor_on_virtual_devices(video5d, base_volume):
    import jax

    assert len(jax.devices()) == 8, "conftest must create 8 virtual devices"
    cfg = RegistrationConfig(parallelization="mesh")
    reg, w = compensate_arr(video5d, base_volume, options=fast_options(),
                            config=cfg)
    ref_reg, ref_w = compensate_arr(
        video5d, base_volume, options=fast_options(),
        config=RegistrationConfig(parallelization="sequential"))
    np.testing.assert_allclose(reg, ref_reg, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(w, ref_w, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_progress_callbacks(video5d, base_volume):
    calls = []
    compensate_arr(video5d, base_volume, options=fast_options(),
                   progress_callback=lambda cur, tot: calls.append((cur, tot)))
    assert calls, "progress callback never fired"
    assert calls[-1][0] == video5d.shape[0]

    # a throwing callback must not break the pipeline
    def bad(cur, tot):
        raise RuntimeError("boom")

    reg, _ = compensate_arr(video5d, base_volume, options=fast_options(),
                            progress_callback=bad)
    assert reg.shape == video5d.shape


@pytest.mark.slow
def test_compensate_recording_hdf5(tmp_path, video5d, base_volume):
    from flowreg3d_tpu.io.factory import (
        get_video_file_reader,
        get_video_file_writer,
    )

    src = tmp_path / "in.h5"
    w = get_video_file_writer(str(src), "HDF5")
    w.write_frames((video5d * 1000).astype(np.uint16))
    w.close()

    opts = fast_options(
        input_file=str(src), output_path=tmp_path / "out",
        output_format="HDF5", save_w=True, reference_frames=[0, 1],
        buffer_size=3)
    compensate_recording(opts)

    out = tmp_path / "out" / "compensated.HDF5"
    assert out.exists()
    r = get_video_file_reader(str(out))
    assert r.shape[0] == video5d.shape[0]
    r.close()

    assert (tmp_path / "out" / "w.h5").exists()
    assert (tmp_path / "out" / "statistics.npz").exists()
    stats = np.load(tmp_path / "out" / "statistics.npz")
    assert len(stats["mean_disp"]) == video5d.shape[0]
    assert (tmp_path / "out" / "reference_frame.npy").exists()


def test_flow_statistics_values():
    T, Z, Y, X = 2, 6, 8, 8
    flows = np.zeros((T, Z, Y, X, 3), np.float32)
    flows[1, ..., 0] = 2.0  # uniform dx=2 on frame 1
    stats = flow_statistics(flows)
    assert stats["mean_disp"][0] == pytest.approx(0.0)
    assert stats["mean_disp"][1] == pytest.approx(2.0)
    assert stats["max_disp"][1] == pytest.approx(2.0)
    assert stats["mean_div"][1] == pytest.approx(0.0, abs=1e-6)
    assert stats["mean_translation"][1] == pytest.approx(2.0)


@pytest.mark.slow
def test_update_initialization_w_disabled(video5d, base_volume):
    reg, w = compensate_arr(
        video5d, base_volume,
        options=fast_options(update_initialization_w=False))
    assert reg.shape == video5d.shape


def test_empty_input_raises(base_volume):
    with pytest.raises(ValueError):
        compensate_arr(np.empty((0, 2, 2, 2, 1)), base_volume)


@pytest.mark.slow
def test_options_not_mutated(video5d, base_volume):
    opts = fast_options()
    fmt_before = opts.output_format
    save_w_before = opts.save_w
    compensate_arr(video5d, base_volume, options=opts)
    assert opts.output_format == fmt_before
    assert opts.save_w == save_w_before
    assert not isinstance(opts.input_file, np.ndarray)
