"""ScanImage metadata: header fields, FastZ, ROI groups (Artist tag).

Parity targets: reference util/io/_scanimage.py:25-222 (header + hFastZ +
roi_data) and :293-398 (dimension interpretation).
"""

import json

import numpy as np

from flowreg3d_tpu.io._tiff_format import TiffReader, TiffWriter
from flowreg3d_tpu.io.scanimage import (format_scanimage_report,
                                        interpret_scanimage_dimensions,
                                        parse_roi_groups,
                                        parse_scanimage_metadata)

_HEADER = """
SI.VERSION_MAJOR = 2023
SI.hChannels.channelSave = [1;2]
SI.hStackManager.numSlices = 5
SI.hStackManager.framesPerSlice = 1
SI.hStackManager.numVolumes = 7
SI.hStackManager.stackZStepSize = 2.5
SI.hRoiManager.scanFrameRate = 30.2
"""

_ROI_JSON = {
    "RoiGroups": {
        "imagingRoiGroup": {
            "rois": [
                {"name": "roiA", "enable": True, "zs": [0, 10, 20],
                 "scanfields": {
                     "pixelResolutionXY": [256, 128],
                     "centerXY": [0.1, -0.2],
                     "sizeXY": [2.0, 1.0]}},
                {"name": "roiB", "enable": True, "zs": [0],
                 "scanfields": [{
                     "pixelResolutionXY": [256, 64],
                     "centerXY": [0.0, 0.8],
                     "sizeXY": [2.0, 0.5]}]},
            ]
        }
    }
}


def test_header_and_fastz():
    meta = parse_scanimage_metadata(_HEADER)
    assert meta["channels"] == 2
    assert meta["slices_per_volume"] == 5
    assert meta["num_volumes"] == 7
    assert meta["z_step"] == 2.5

    fastz = _HEADER + """
SI.hFastZ.enable = true
SI.hFastZ.numFramesPerVolume = 12
SI.hFastZ.numVolumes = 40
"""
    meta = parse_scanimage_metadata(fastz)
    assert meta["slices_per_volume"] == 12
    assert meta["num_volumes"] == 40


def test_roi_groups_parse():
    roi = parse_roi_groups(json.dumps(_ROI_JSON))
    assert roi["n_rois"] == 2
    a, b = roi["rois"]
    assert a["name"] == "roiA" and a["zs"] == [0, 10, 20]
    assert a["scanfields"][0]["pixel_resolution"] == (256, 128)
    assert b["scanfields"][0]["size_xy"] == (2.0, 0.5)
    assert parse_roi_groups("not json") is None
    assert parse_roi_groups("") is None


def test_roi_groups_from_tiff_artist_tag(tmp_path):
    """Fixture TIFF with SI header + Artist ROI JSON parses end-to-end."""
    path = tmp_path / "si.tif"
    page = (np.arange(48, dtype=np.uint16).reshape(6, 8))
    with TiffWriter(str(path)) as w:
        w.set_description(_HEADER.replace("\n", "\r"))
        w.set_artist(json.dumps(_ROI_JSON))
        for _ in range(10):
            w.write_page(page)

    with TiffReader(str(path)) as tr:
        assert "RoiGroups" in tr.pages[0].artist

    meta = parse_scanimage_metadata(str(path))
    assert meta is not None and meta["roi_data"]["n_rois"] == 2
    report = format_scanimage_report(meta)
    assert "roiA" in report and "ROIs" in report


def test_interpret_discrete_plane_rois():
    """Flat stack + multi-z ROI list -> slices from the ROI z planes."""
    meta = parse_scanimage_metadata(
        "SI.hChannels.channelSave = 1\nSI.hStackManager.numSlices = 1\n")
    meta["roi_data"] = parse_roi_groups(json.dumps(_ROI_JSON))
    volumes, slices, channels = interpret_scanimage_dimensions(
        meta, n_pages=30)
    assert slices == 3      # zs {0, 10, 20}
    assert volumes == 10


def test_description_embedded_extraction():
    """Fields buried mid-line (older ScanImage: MATLAB-evaluable strings,
    semicolon-separated) are recovered by pattern — reference
    _scanimage.py:222-290 (_extract_from_description)."""
    from flowreg3d_tpu.io.scanimage import (extract_from_description,
                                            parse_scanimage_metadata)

    desc = ("state.internal.foo = 3; SI.hChannels.channelSave = [1,2] ; "
            "SI.hStackManager.numSlices = 30;"
            "SI.hFastZ.numVolumes = 500;"
            "SI.hStackManager.stackZStepSize = 2.5;"
            "SI.hRoiManager.scanFrameRate = 30.02")
    rec = extract_from_description(desc)
    assert rec["channels"] == 2
    assert rec["slices_per_volume"] == 30
    assert rec["num_volumes"] == 500
    assert rec["z_step"] == 2.5
    assert rec["frame_rate"] == 30.02

    meta = parse_scanimage_metadata(desc)
    assert meta["is_scanimage"]
    assert meta["channels"] == 2
    assert meta["slices_per_volume"] == 30
    assert meta["num_volumes"] == 500


def test_description_z_positions_fallback():
    from flowreg3d_tpu.io.scanimage import extract_from_description

    rec = extract_from_description(
        "SI.hFastZ.positionAbsolute = [0.0 4.0 8.0 12.0];"
        "SI.hFastZ.numFramesPerVolume = 4")
    assert rec["z_step"] == 4.0
    assert rec["slices_per_volume"] == 4


def test_description_only_file_metadata(tmp_path):
    """A TIFF whose only ScanImage signal is a mid-line description still
    yields structured metadata (fixture test per VERDICT round-2 #9)."""
    import numpy as np

    from flowreg3d_tpu.io._tiff_format import TiffWriter
    from flowreg3d_tpu.io.scanimage import parse_scanimage_metadata

    path = tmp_path / "si_desc.tif"
    desc = ("scanimage legacy; SI.hChannels.channelsActive = 2; "
            "SI.hStackManager.numSlices = 6; "
            "SI.hStackManager.numVolumes = 10")
    with TiffWriter(str(path)) as tw:
        tw.set_description(desc)
        for _ in range(120):
            tw.write_page(np.zeros((4, 4), np.uint16))
    meta = parse_scanimage_metadata(str(path))
    assert meta is not None
    assert meta["channels"] == 2
    assert meta["slices_per_volume"] == 6
    assert meta["num_volumes"] == 10

    from flowreg3d_tpu.io.scanimage import interpret_scanimage_dimensions
    vols, slices, ch = interpret_scanimage_dimensions(meta, n_pages=120)
    assert (vols, slices, ch) == (10, 6, 2)
