"""TIFF codec edge cases: ImageJ contiguous layout, big-endian, BigTIFF."""

import struct

import numpy as np
import pytest

from flowreg3d_tpu.io._tiff_format import (
    TiffReader,
    TiffWriter,
    build_imagej_description,
    parse_imagej_description,
)


def test_imagej_contiguous_virtual_pages(tmp_path):
    """ImageJ's 'fake big TIFF': one IFD, remaining pages appended raw."""
    pages = (np.random.default_rng(0).random((4, 6, 8)) * 255).astype(
        np.uint8)
    path = tmp_path / "ij.tif"
    with TiffWriter(str(path)) as w:
        w.set_description(build_imagej_description(4, slices=4))
        w.write_page(pages[0])
        # append the remaining pages' raw pixel data contiguously before the
        # writer emits the (single) IFD — the ImageJ contiguous layout
        w._fh.write(pages[1:].tobytes())
        w._pos += pages[1:].nbytes
    r = TiffReader(str(path))
    assert r.n_pages == 4
    got = r.asarray()
    r.close()
    np.testing.assert_array_equal(got[0], pages[0])
    np.testing.assert_array_equal(got[1:], pages[1:])


def test_bigtiff_roundtrip_large_offsets(tmp_path):
    arr = (np.random.default_rng(1).random((3, 16, 16)) * 1000).astype(
        np.uint16)
    path = tmp_path / "big.tif"
    with TiffWriter(str(path), bigtiff=True) as w:
        for p in arr:
            w.write_page(p)
    r = TiffReader(str(path))
    assert r.big
    np.testing.assert_array_equal(r.asarray(), arr)
    r.close()


def test_big_endian_read(tmp_path):
    """Hand-assembled minimal MM (big-endian) classic TIFF, one 2x3 page."""
    data = np.arange(6, dtype=">u2").reshape(2, 3)
    pixel_bytes = data.tobytes()
    path = tmp_path / "mm.tif"
    entries = [
        (256, 3, 1, 3),      # width
        (257, 3, 1, 2),      # length
        (258, 3, 1, 16),     # bits
        (259, 3, 1, 1),      # compression none
        (262, 3, 1, 1),      # photometric
        (273, 4, 1, 8),      # strip offset (pixel data at byte 8)
        (277, 3, 1, 1),      # samples
        (278, 4, 1, 2),      # rows/strip
        (279, 4, 1, len(pixel_bytes)),
        (339, 3, 1, 1),      # sample format uint
    ]
    ifd = struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3:
            payload = struct.pack(">H", val) + b"\x00\x00"
        else:
            payload = struct.pack(">I", val)
        ifd += struct.pack(">HHI", tag, typ, cnt) + payload
    ifd += struct.pack(">I", 0)
    header = b"MM" + struct.pack(">H", 42) + struct.pack(
        ">I", 8 + len(pixel_bytes))
    path.write_bytes(header + pixel_bytes + ifd)

    r = TiffReader(str(path))
    got = r.asarray()
    r.close()
    np.testing.assert_array_equal(got[0], data.astype("=u2"))


def test_description_parsing_edge_cases():
    assert parse_imagej_description("") is None
    assert parse_imagej_description("not imagej") is None
    meta = parse_imagej_description(
        "ImageJ=1.54f\nimages=12\nchannels=2\nslices=3\nframes=2\n"
        "hyperstack=true\nspacing=2.5\n")
    assert meta["images"] == 12
    assert meta["hyperstack"] is True
    assert meta["spacing"] == 2.5
