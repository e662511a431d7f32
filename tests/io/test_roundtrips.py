"""Round-trip and protocol tests for the I/O subsystem."""

import numpy as np
import pytest

from flowreg3d_tpu.io import (
    ArrayReader3D,
    ArrayWriter3D,
    get_video_file_reader,
    get_video_file_writer,
)
from flowreg3d_tpu.io.multifile import (
    MULTICHANNELFileReader3D,
    SUBSETFileReader3D,
)


@pytest.fixture
def video(rng):
    return (np.random.default_rng(3).random((7, 6, 10, 12, 2)) * 1000).astype(
        np.uint16)


def _roundtrip(video, path, fmt, **kw):
    w = get_video_file_writer(str(path), fmt, **kw)
    w.write_frames(video[:4])
    w.write_frames(video[4:])
    w.close()
    r = get_video_file_reader(str(path))
    data = r[:]
    r.close()
    return data


def test_array_reader_writer(video):
    r = ArrayReader3D(video, buffer_size=3)
    assert r.shape == video.shape
    batches = [b for b in r]
    assert sum(b.shape[0] for b in batches) == 7
    np.testing.assert_array_equal(np.concatenate(batches), video)

    w = ArrayWriter3D()
    w.write_frames(video[:2])
    w.write_frames(video[2])  # single volume
    out = w.get_array()
    assert out.shape == (3,) + video.shape[1:]


def test_array_binning(video):
    r = ArrayReader3D(video, buffer_size=10, bin_size=2)
    assert len(r) == 4
    b0 = r[0]
    np.testing.assert_array_equal(
        b0, video[:2].mean(axis=0).astype(video.dtype))
    # last bin is a lone frame
    np.testing.assert_array_equal(r[3], video[6])
    allb = r[:]
    assert allb.shape == (4,) + video.shape[1:]


def test_reader_fancy_indexing(video):
    r = ArrayReader3D(video)
    np.testing.assert_array_equal(r[3], video[3])
    np.testing.assert_array_equal(r[-1], video[-1])
    np.testing.assert_array_equal(r[[0, 2, 5]], video[[0, 2, 5]])
    np.testing.assert_array_equal(r[1:4], video[1:4])
    # protocol detail: int frame key in a tuple keeps the T axis
    # (reference util/io/_base_3d.py:205-222)
    np.testing.assert_array_equal(r[2, 1:3], video[2:3, 1:3])
    with pytest.raises(IndexError):
        r[7]


def test_hdf5_roundtrip(tmp_path, video):
    data = _roundtrip(video, tmp_path / "v.h5", "HDF5")
    np.testing.assert_array_equal(data, video)


def test_hdf5_compression_and_names(tmp_path, video):
    path = tmp_path / "v.h5"
    w = get_video_file_writer(str(path), "HDF5", compression="gzip",
                              dataset_names="mych*")
    w.write_frames(video)
    w.close()
    import h5py

    with h5py.File(path) as f:
        assert set(f.keys()) == {"mych1", "mych2"}
    r = get_video_file_reader(str(path))
    np.testing.assert_array_equal(r[:], video)
    r.close()


def test_tiff_roundtrip(tmp_path, video):
    data = _roundtrip(video, tmp_path / "v.tif", "TIFF")
    np.testing.assert_array_equal(data, video)


def test_tiff_float_single_channel(tmp_path):
    video = np.random.default_rng(0).random((3, 4, 8, 9, 1)).astype(np.float32)
    data = _roundtrip(video, "%s/v.tif" % tmp_path, "TIFF")
    np.testing.assert_array_equal(data, video)


def test_mat73_roundtrip(tmp_path, video):
    data = _roundtrip(video, tmp_path / "v.mat", "MAT")
    np.testing.assert_array_equal(data, video)
    from flowreg3d_tpu.io.mat import is_mat73

    assert is_mat73(tmp_path / "v.mat")


def test_mat73_matlab_interop(tmp_path):
    """A genuine MATLAB-written v7.3 file (variable (Z,Y,X,T) in MATLAB,
    reversed to (T,X,Y,Z) by HDF5's C-order view) must map to (T,Z,Y,X,C)
    without any kwargs (reference mat_3d.py:38-40,225-247)."""
    import h5py

    from flowreg3d_tpu.io.mat import _write_mat73_userblock

    rng = np.random.default_rng(2)
    tzyx = (rng.random((4, 5, 6, 7)) * 50).astype(np.float64)
    path = tmp_path / "matlab.mat"
    with h5py.File(path, "w", userblock_size=512) as f:
        # what hdf5storage/MATLAB produce for a (Z,Y,X,T) variable
        ds = f.create_dataset("mov", data=np.transpose(tzyx, (0, 3, 2, 1)))
        ds.attrs["MATLAB_class"] = np.bytes_("double")
    _write_mat73_userblock(path)

    r = get_video_file_reader(str(path))
    data = r[:]
    r.close()
    assert data.shape == (4, 5, 6, 7, 1)
    np.testing.assert_array_equal(data[..., 0], tzyx)


def test_mat73_dimension_ordering_kwarg(tmp_path):
    """Explicit dimension_ordering overrides the default interpretation."""
    import h5py

    from flowreg3d_tpu.io.mat import MATFileReader3D, _write_mat73_userblock

    rng = np.random.default_rng(3)
    tzyx = (rng.random((3, 4, 5, 6)) * 10).astype(np.float32)
    path = tmp_path / "o.mat"
    with h5py.File(path, "w", userblock_size=512) as f:
        f.create_dataset("mov", data=tzyx)  # stored plainly as (T,Z,Y,X)
    _write_mat73_userblock(path)

    r = MATFileReader3D(str(path), dimension_ordering=(1, 2, 3, 0))
    data = r[:]
    r.close()
    np.testing.assert_array_equal(data[..., 0], tzyx)


def test_mat5_roundtrip(tmp_path, video):
    data = _roundtrip(video, tmp_path / "v5.mat", "MAT", version="5")
    np.testing.assert_array_equal(data, video)


def test_mat5_scipy_interop(tmp_path):
    """Files written by plain scipy (MATLAB layout) must read correctly."""
    from scipy.io import savemat

    vol = (np.random.default_rng(1).random((5, 6, 7, 4)) * 100).astype(
        np.float64)  # MATLAB (Z,Y,X,T)
    savemat(tmp_path / "m.mat", {"mov": vol})
    r = get_video_file_reader(str(tmp_path / "m.mat"))
    data = r[:]
    r.close()
    assert data.shape == (4, 5, 6, 7, 1)
    np.testing.assert_array_equal(data[..., 0],
                                  np.transpose(vol, (3, 0, 1, 2)))


def test_multifile_writer_and_multichannel_reader(tmp_path, video):
    path = tmp_path / "out.h5"
    w = get_video_file_writer(str(path), "MULTIFILE_HDF5")
    w.write_frames(video)
    w.close()
    p1 = tmp_path / "out_ch1.h5"
    p2 = tmp_path / "out_ch2.h5"
    assert p1.exists() and p2.exists()

    r = MULTICHANNELFileReader3D([str(p1), str(p2)])
    data = r[:]
    r.close()
    np.testing.assert_array_equal(data, video)

    # factory accepts a list of paths
    r = get_video_file_reader([str(p1), str(p2)])
    np.testing.assert_array_equal(r[:], video)
    r.close()


def test_folder_reader(tmp_path, video):
    """A directory of per-timepoint files reads as one natural-sorted series.

    Goes beyond the reference, which raises NotImplementedError for folder
    input (factory.py:61-65).
    """
    folder = tmp_path / "vols"
    folder.mkdir()
    # write 7 timepoints across 3 files with names that would mis-sort
    # lexicographically (vol_10 < vol_2): natural order must win
    splits = [(0, 2, "vol_2.h5"), (2, 5, "vol_10.h5"), (5, 7, "vol_100.h5")]
    for a, b, name in splits:
        w = get_video_file_writer(str(folder / name), "HDF5")
        w.write_frames(video[a:b])
        w.close()
    (folder / "notes.txt").write_text("ignored")

    r = get_video_file_reader(str(folder), buffer_size=3, bin_size=1)
    assert r.shape == video.shape
    np.testing.assert_array_equal(r[:], video)
    # random access crossing file boundaries, grouped per source file
    np.testing.assert_array_equal(r[[1, 4, 6]], video[[1, 4, 6]])
    r.close()

    # mixed formats in one folder are rejected
    (folder / "stray.tif").write_bytes(b"II*\x00")
    with pytest.raises(ValueError, match="Mixed"):
        get_video_file_reader(str(folder))


def test_subset_reader(video):
    base = ArrayReader3D(video)
    sub = SUBSETFileReader3D(base, [1, 3, 5])
    assert sub.shape[0] == 3
    np.testing.assert_array_equal(sub[:], video[[1, 3, 5]])


def test_factory_passthrough_and_array(video):
    r = get_video_file_reader(video)
    assert isinstance(r, ArrayReader3D)
    assert get_video_file_reader(r) is r
    w = get_video_file_writer(None, "ARRAY")
    assert isinstance(w, ArrayWriter3D)
    with pytest.raises(ValueError):
        get_video_file_writer(None, "HDF5")


def test_ds_discovery():
    from flowreg3d_tpu.io.ds import dataset_name_for_channel, find_datasets

    # channel group wins
    sel = find_datasets([("ch1", (4, 5, 6, 7)), ("ch2", (4, 5, 6, 7)),
                         ("meta", (3,))])
    assert sel == ["ch1", "ch2"]
    # inconsistent shapes break the group; generic name wins
    sel = find_datasets([("ch1", (4, 5, 6, 7)), ("ch2", (9, 5, 6, 7)),
                         ("mov", (4, 5, 6, 7))])
    assert sel == ["mov"]
    # fallback: largest 4D/5D
    sel = find_datasets([("a", (2, 3, 4, 5)), ("b", (4, 5, 6, 7, 2))])
    assert sel == ["b"]

    assert dataset_name_for_channel(None, 2, 3) == "ch2"
    assert dataset_name_for_channel("ch*_reg", 1, 2) == "ch1_reg"
    assert dataset_name_for_channel(["a", "b"], 2, 2) == "b"
    assert dataset_name_for_channel("mov", 1, 1) == "mov"


def test_fresh_reader_streams_without_prior_init(tmp_path, video):
    """has_batch() on a freshly-constructed file reader must self-initialize.

    Regression: frame_count is 0 before lazy init, so an uninitialized
    has_batch() returned False and a fresh streaming loop read nothing.
    """
    path = tmp_path / "fresh.h5"
    w = get_video_file_writer(str(path), "HDF5")
    w.write_frames(video)
    w.close()
    r = get_video_file_reader(str(path), buffer_size=3)
    # no .shape / __getitem__ access before the streaming protocol
    assert r.has_batch()
    n = 0
    while r.has_batch():
        n += r.read_batch().shape[0]
    r.close()
    assert n == video.shape[0]
