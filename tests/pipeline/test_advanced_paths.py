"""Pipeline paths beyond the happy path: cc-initialization, reference
updating, checkpoint/resume, compensate_inplace, multifile output."""

import numpy as np
import pytest

from flowreg3d_tpu.pipeline import (
    BatchMotionCorrector,
    RegistrationConfig,
    compensate_arr,
    compensate_inplace,
    compensate_recording,
)

from tests.pipeline.conftest import fast_options

# heavy tier: interpret-mode Pallas / shard_map compiles (minutes on 1 CPU)
pytestmark = pytest.mark.slow


def test_cc_initialization_path(video5d, base_volume):
    """The 6-step rigid-prealignment pipeline (reference
    sequential_3d.py:89-150) must run and still register the batch."""
    opts = fast_options(cc_initialization=True, cc_hw=16, cc_up=5)
    reg, w = compensate_arr(video5d, base_volume, options=opts)
    assert reg.shape == video5d.shape
    assert np.all(np.isfinite(w))
    err_before = np.abs(video5d - base_volume[None]).mean()
    err_after = np.abs(reg - base_volume[None]).mean()
    assert err_after < err_before


def test_update_reference_path(video5d, base_volume):
    opts = fast_options(update_reference=True)
    reg, w = compensate_arr(video5d, base_volume, options=opts)
    assert reg.shape == video5d.shape
    assert np.all(np.isfinite(reg))


def test_compensate_inplace(video5d, base_volume):
    reg, w = compensate_inplace(video5d, base_volume,
                                options=fast_options())
    assert reg.shape == video5d.shape
    assert w.shape == video5d.shape[:4] + (3,)


def test_multifile_output(tmp_path, video5d, base_volume):
    from flowreg3d_tpu.io.factory import get_video_file_writer

    video2c = np.concatenate([video5d, video5d * 0.5], axis=-1)
    src = tmp_path / "in.h5"
    wtr = get_video_file_writer(str(src), "HDF5")
    wtr.write_frames(video2c.astype(np.float32))
    wtr.close()

    opts = fast_options(
        input_file=str(src), output_path=tmp_path / "out",
        output_format="MULTIFILE_HDF5", reference_frames=[0],
        weight=[0.5, 0.5],
        sigma=[[1.0, 1.0, 1.0, 0.1], [1.0, 1.0, 1.0, 0.1]])
    compensate_recording(opts)
    assert (tmp_path / "out" / "compensated_ch1.HDF5").exists()
    assert (tmp_path / "out" / "compensated_ch2.HDF5").exists()


def test_caiman_hdf5_output(tmp_path, video5d, base_volume):
    import h5py

    from flowreg3d_tpu.io.factory import get_video_file_writer

    src = tmp_path / "in.h5"
    wtr = get_video_file_writer(str(src), "HDF5")
    wtr.write_frames(video5d.astype(np.float32))
    wtr.close()

    opts = fast_options(
        input_file=str(src), output_path=tmp_path / "out",
        output_format="CAIMAN_HDF5", reference_frames=[0])
    compensate_recording(opts)
    out = tmp_path / "out" / "compensated.HDF5"
    assert out.exists()
    with h5py.File(out) as f:
        assert "mov" in f
        assert f["mov"].shape[0] == video5d.shape[0]  # time-major


def test_checkpoint_resume(tmp_path, video5d, base_volume):
    from flowreg3d_tpu.io.factory import get_video_file_writer
    from flowreg3d_tpu.pipeline import OFOptions

    src = tmp_path / "in.h5"
    wtr = get_video_file_writer(str(src), "HDF5")
    wtr.write_frames((video5d * 1000).astype(np.uint16))
    wtr.close()

    def mk_opts():
        return fast_options(
            input_file=str(src), output_path=tmp_path / "out",
            output_format="HDF5", reference_frames=[0], buffer_size=2)

    cfg = RegistrationConfig(checkpoint=True)

    # run once fully: the checkpoint must be cleaned up afterwards
    compensate_recording(mk_opts(), config=cfg)
    assert not (tmp_path / "out" / "checkpoint.npz").exists()

    # simulate an interrupted run: pre-seed a checkpoint claiming the first
    # 2 frames are done, then resume
    corr = BatchMotionCorrector(mk_opts(), cfg)
    corr._setup_io()
    corr._setup_reference()
    corr._cleanup()  # cleanup first: it removes any checkpoint file
    np.savez(tmp_path / "out" / "checkpoint.npz", frames_done=2,
             w_init=np.zeros(video5d.shape[1:4] + (3,), np.float32),
             reference_raw=corr.reference_raw,
             reference_proc=corr.reference_proc)

    compensate_recording(mk_opts(), config=cfg)
    from flowreg3d_tpu.io.factory import get_video_file_reader

    r = get_video_file_reader(str(tmp_path / "out" / "compensated.HDF5"))
    # resumed run skipped the first batch (2 frames): output holds the rest
    assert r.shape[0] == video5d.shape[0] - 2
    r.close()


def test_checkpoint_resume_statistics_complete(tmp_path, video5d):
    """statistics.npz after interrupt+resume == uninterrupted run."""
    from flowreg3d_tpu.io.factory import get_video_file_writer

    src = tmp_path / "in.h5"
    wtr = get_video_file_writer(str(src), "HDF5")
    wtr.write_frames((video5d * 1000).astype(np.uint16))
    wtr.close()

    def mk_opts(out):
        return fast_options(
            input_file=str(src), output_path=tmp_path / out,
            output_format="HDF5", reference_frames=[0], buffer_size=2)

    cfg = RegistrationConfig(checkpoint=True)
    compensate_recording(mk_opts("full"), config=cfg)
    full = np.load(tmp_path / "full" / "statistics.npz")

    # interrupted run: process one batch, snapshot the checkpoint, abort
    corr = BatchMotionCorrector(mk_opts("resumed"), cfg)

    calls = {"n": 0}
    orig = BatchMotionCorrector._save_checkpoint

    def boom(self, frames_done):
        orig(self, frames_done)
        calls["n"] += 1
        if calls["n"] == 1:
            raise KeyboardInterrupt

    BatchMotionCorrector._save_checkpoint = boom
    try:
        with np.testing.assert_raises(KeyboardInterrupt):
            corr.run()
    finally:
        BatchMotionCorrector._save_checkpoint = orig

    assert (tmp_path / "resumed" / "checkpoint.npz").exists()
    compensate_recording(mk_opts("resumed"), config=cfg)
    res = np.load(tmp_path / "resumed" / "statistics.npz")
    for key in ("mean_disp", "max_disp", "mean_div", "mean_translation"):
        assert res[key].shape == full[key].shape, key
        np.testing.assert_allclose(res[key], full[key], rtol=1e-4,
                                   atol=1e-5, err_msg=key)


def test_save_valid_mask_and_idx(tmp_path, video5d):
    """save_valid_mask/save_valid_idx actually produce outputs (the
    reference carries these fields inertly, OF_options_3D.py:200-201)."""
    from flowreg3d_tpu.io.factory import (get_video_file_reader,
                                          get_video_file_writer)

    src = tmp_path / "in.h5"
    wtr = get_video_file_writer(str(src), "HDF5")
    wtr.write_frames((video5d * 1000).astype(np.uint16))
    wtr.close()

    opts = fast_options(
        input_file=str(src), output_path=tmp_path / "out",
        output_format="HDF5", reference_frames=[0],
        save_valid_mask=True, save_valid_idx=True)
    compensate_recording(opts)

    r = get_video_file_reader(str(tmp_path / "out" / "valid_mask.h5"))
    mask = r[:]
    r.close()
    assert mask.shape[:4] == video5d.shape[:4]
    assert mask.dtype == np.uint8
    assert set(np.unique(mask)).issubset({0, 1})

    idx = np.load(tmp_path / "out" / "valid_idx.npy")
    assert idx.shape == (video5d.shape[0],)
    assert idx.dtype == bool
