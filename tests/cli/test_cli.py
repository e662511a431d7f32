"""CLI tests (parity scope: reference tests/cli/)."""

import numpy as np
import pytest

from flowreg3d_tpu.cli.main import build_parser, main
from flowreg3d_tpu.io._tiff_format import (
    TiffReader,
    TiffWriter,
    build_imagej_description,
)
from flowreg3d_tpu.io.tiff3d import TIFFFileReader3D, TIFFFileWriter3D


def _write_flat_tiff(path, n_pages, h=16, w=18, dtype=np.uint16, desc=None):
    rng = np.random.default_rng(0)
    pages = (rng.random((n_pages, h, w)) * 500).astype(dtype)
    with TiffWriter(str(path)) as tw:
        if desc:
            tw.set_description(desc)
        for p in pages:
            tw.write_page(p)
    return pages


def test_parser_and_version(capsys):
    parser = build_parser()
    with pytest.raises(SystemExit):
        parser.parse_args(["--version"])
    out = capsys.readouterr().out
    assert "flowreg3d" in out


def test_no_command_prints_help(capsys):
    assert main([]) == 1
    assert "tiff-reshape" in capsys.readouterr().out


def test_unknown_command_errors():
    with pytest.raises(SystemExit):
        main(["frobnicate"])


def test_reshape_manual_slices(tmp_path):
    src = tmp_path / "flat.tif"
    dst = tmp_path / "vol.tif"
    pages = _write_flat_tiff(src, n_pages=12)
    rc = main(["tiff-reshape", str(src), str(dst),
               "--slices-per-volume", "3"])
    assert rc == 0
    r = TIFFFileReader3D(str(dst))
    data = r[:]
    r.close()
    assert data.shape == (4, 3, 16, 18, 1)
    np.testing.assert_array_equal(data[0, :, :, :, 0], pages[:3])


def test_reshape_selection_and_stride(tmp_path):
    src = tmp_path / "flat.tif"
    dst = tmp_path / "vol.tif"
    pages = _write_flat_tiff(src, n_pages=20)
    rc = main(["tiff-reshape", str(src), str(dst), "-z", "2",
               "--start-volume", "2", "--end-volume", "9",
               "--volume-stride", "2"])
    assert rc == 0
    r = TIFFFileReader3D(str(dst))
    data = r[:]
    r.close()
    assert data.shape[0] == 4  # volumes 2,4,6,8
    np.testing.assert_array_equal(data[0, :, :, :, 0], pages[4:6])


def test_reshape_dry_run_writes_nothing(tmp_path, capsys):
    src = tmp_path / "flat.tif"
    dst = tmp_path / "vol.tif"
    _write_flat_tiff(src, n_pages=6)
    rc = main(["tiff-reshape", str(src), str(dst), "-z", "3", "--dry-run"])
    assert rc == 0
    assert not dst.exists()
    assert "Would write" in capsys.readouterr().out


def test_reshape_overwrite_guard(tmp_path, capsys):
    src = tmp_path / "flat.tif"
    dst = tmp_path / "vol.tif"
    _write_flat_tiff(src, n_pages=6)
    dst.write_bytes(b"existing")
    rc = main(["tiff-reshape", str(src), str(dst), "-z", "3"])
    assert rc == 1
    assert "exists" in capsys.readouterr().err


def test_reshape_scale(tmp_path):
    src = tmp_path / "flat.tif"
    dst = tmp_path / "vol.tif"
    _write_flat_tiff(src, n_pages=8, h=20, w=24)
    rc = main(["tiff-reshape", str(src), str(dst), "-z", "4",
               "--scale", "0.5", "0.5", "1.0"])
    assert rc == 0
    r = TIFFFileReader3D(str(dst))
    assert r.shape[1:4] == (4, 10, 12)
    r.close()


def test_reshape_scanimage_autodetect(tmp_path):
    desc = ("SI.hStackManager.numSlices = 3\n"
            "SI.hStackManager.framesPerSlice = 1\n"
            "SI.hChannels.channelSave = 1\n")
    src = tmp_path / "si.tif"
    dst = tmp_path / "vol.tif"
    _write_flat_tiff(src, n_pages=9, desc=desc)
    rc = main(["tiff-reshape", str(src), str(dst)])
    assert rc == 0
    r = TIFFFileReader3D(str(dst))
    assert r.shape == (3, 3, 16, 18, 1)
    r.close()


def test_concat_tiffs(tmp_path):
    folder = tmp_path / "frames"
    folder.mkdir()
    rng = np.random.default_rng(1)
    vols = (rng.random((5, 4, 10, 12)) * 100).astype(np.uint16)
    for i, v in enumerate(vols):
        with TIFFFileWriter3D(str(folder / f"frame_{i:03d}.tif")) as w:
            w.write_frames(v[np.newaxis, ..., np.newaxis])
    dst = tmp_path / "movie.tif"
    rc = main(["concat-tiffs", str(folder), str(dst)])
    assert rc == 0
    r = TIFFFileReader3D(str(dst))
    data = r[:]
    r.close()
    assert data.shape == (5, 4, 10, 12, 1)
    np.testing.assert_array_equal(data[..., 0], vols)


def test_concat_channel_suffixes(tmp_path):
    folder = tmp_path / "frames"
    folder.mkdir()
    rng = np.random.default_rng(2)
    for i in range(3):
        for ch in ("_ch1.tif", "_ch2.tif"):
            v = (rng.random((2, 6, 8)) * 50).astype(np.uint16)
            with TIFFFileWriter3D(str(folder / f"t{i}{ch}")) as w:
                w.write_frames(v[np.newaxis, ..., np.newaxis])
    dst = tmp_path / "movie.tif"
    rc = main(["concat-tiffs", str(folder), str(dst),
               "--channel-suffixes", "_ch1.tif", "_ch2.tif"])
    assert rc == 0
    r = TIFFFileReader3D(str(dst))
    assert r.shape == (3, 2, 6, 8, 2)
    r.close()


def test_concat_mismatched_suffix_groups(tmp_path, capsys):
    folder = tmp_path / "frames"
    folder.mkdir()
    v = np.zeros((2, 4, 4), np.uint16)
    for name in ("a_ch1.tif", "b_ch1.tif", "a_ch2.tif"):
        with TIFFFileWriter3D(str(folder / name)) as w:
            w.write_frames(v[np.newaxis, ..., np.newaxis])
    rc = main(["concat-tiffs", str(folder), str(tmp_path / "m.tif"),
               "--channel-suffixes", "_ch1.tif", "_ch2.tif"])
    assert rc == 1


def test_scanimage_parsing():
    from flowreg3d_tpu.io.scanimage import (
        format_scanimage_report,
        interpret_scanimage_dimensions,
        parse_scanimage_metadata,
    )

    text = ("SI.hChannels.channelSave = [1;2]\n"
            "SI.hStackManager.numSlices = 30\n"
            "SI.hStackManager.framesPerSlice = 2\n"
            "SI.hStackManager.stackZStepSize = 5\n"
            "SI.hRoiManager.scanFrameRate = 30.0\n")
    meta = parse_scanimage_metadata(text)
    assert meta["channels"] == 2
    assert meta["slices_per_volume"] == 30
    assert meta["frames_per_slice"] == 2
    vols, sl, ch = interpret_scanimage_dimensions(meta, n_pages=1200)
    assert (vols, sl, ch) == (10, 30, 2)
    assert "ScanImage" in format_scanimage_report(meta)
    assert parse_scanimage_metadata("no metadata here") is None
