"""TIFF decompression: LZW (+ horizontal predictor), PackBits, deflate."""

import struct
import zlib

import numpy as np
import pytest

from flowreg3d_tpu.io._tiff_format import (TiffReader, _lzw_decode,
                                           _packbits_decode)


def _lzw_encode(data):
    """Classic TIFF LZW encoder (early code-width change) for tests."""
    out = bytearray()
    buf = 0
    nbits = 0
    width = 9

    def emit(code):
        nonlocal buf, nbits
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((buf >> nbits) & 0xFF)

    table = {bytes((i,)): i for i in range(256)}
    next_code = 258
    emit(256)  # Clear
    prev = b""
    for byte in data:
        cur = prev + bytes((byte,))
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = next_code
        next_code += 1
        # NOTE: this little test encoder adds its table entry one code
        # earlier than a decoder can, so it switches width at 512/1024/2048
        # to stay in sync; real-writer (libtiff 'early change') streams are
        # covered by the PIL oracle test below
        if next_code == 512:
            width = 10
        elif next_code == 1024:
            width = 11
        elif next_code == 2048:
            width = 12
        elif next_code == 4094:
            emit(256)
            table = {bytes((i,)): i for i in range(256)}
            next_code = 258
            width = 9
        prev = bytes((byte,))
    if prev:
        emit(table[prev])
    emit(257)  # EOI
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_encode(data):
    """Naive PackBits: literal runs of <=128 bytes (valid, not minimal)."""
    out = bytearray()
    for i in range(0, len(data), 128):
        chunk = data[i:i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


@pytest.mark.parametrize("payload", [
    b"TOBEORNOTTOBEORTOBEORNOT" * 10,
    bytes(np.random.default_rng(0).integers(0, 256, 5000, dtype=np.uint8)),
    b"\x00" * 4096,
])
def test_lzw_roundtrip(payload):
    assert _lzw_decode(_lzw_encode(payload)) == payload


def test_packbits_roundtrip():
    rng = np.random.default_rng(1)
    payload = bytes(rng.integers(0, 256, 1000, dtype=np.uint8))
    assert _packbits_decode(_packbits_encode(payload)) == payload
    # replicate-run form
    assert _packbits_decode(bytes([257 - 5, 42])) == b"\x2a" * 5


def _write_tiff(path, img, compression, data, predictor=None):
    """Minimal single-page little-endian TIFF with given encoded strip."""
    H, W = img.shape
    entries = [
        (256, 3, 1, W), (257, 3, 1, H), (258, 3, 1, 16),
        (259, 3, 1, compression), (262, 3, 1, 1),
        (273, 4, 1, None),  # strip offset placeholder
        (277, 3, 1, 1), (278, 4, 1, H), (279, 4, 1, len(data)),
        (339, 3, 1, 1),
    ]
    if predictor:
        entries.insert(9, (317, 3, 1, predictor))
    entries.sort(key=lambda e: e[0])
    data_off = 8
    ifd_off = data_off + len(data) + (len(data) % 2)
    blob = bytearray()
    blob += b"II" + struct.pack("<HI", 42, ifd_off)
    blob += data
    if len(data) % 2:
        blob += b"\x00"
    blob += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if val is None:
            val = data_off
        blob += struct.pack("<HHI", tag, typ, cnt)
        blob += struct.pack("<I", val) if typ == 4 else struct.pack(
            "<HH", val, 0)
    blob += struct.pack("<I", 0)
    path.write_bytes(bytes(blob))


@pytest.mark.parametrize("mode", ["lzw", "lzw_predictor", "packbits",
                                  "deflate"])
def test_compressed_page_decodes(tmp_path, mode):
    rng = np.random.default_rng(2)
    img = (rng.integers(0, 1000, (16, 20)).astype(np.uint16))
    raw = img.astype("<u2").tobytes()
    predictor = None
    if mode == "lzw":
        data, comp = _lzw_encode(raw), 5
    elif mode == "lzw_predictor":
        diff = np.empty_like(img)
        diff[:, 0] = img[:, 0]
        diff[:, 1:] = (img[:, 1:].astype(np.int64)
                       - img[:, :-1].astype(np.int64)) % (1 << 16)
        data, comp = _lzw_encode(diff.astype("<u2").tobytes()), 5
        predictor = 2
    elif mode == "packbits":
        data, comp = _packbits_encode(raw), 32773
    else:
        data, comp = zlib.compress(raw), 8

    path = tmp_path / f"{mode}.tif"
    _write_tiff(path, img, comp, data, predictor)
    with TiffReader(str(path)) as tr:
        got = tr.page_array(0)
    np.testing.assert_array_equal(got, img)


@pytest.mark.parametrize("compression", ["tiff_lzw", "packbits",
                                         "tiff_deflate"])
def test_decodes_pil_written_tiffs(tmp_path, compression):
    """Real-writer streams (PIL/libtiff, incl. LZW early-change)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (64, 80)).astype(np.uint8)
    p = tmp_path / "x.tif"
    PIL_Image.fromarray(img).save(str(p), format="TIFF",
                                  compression=compression)
    with TiffReader(str(p)) as tr:
        got = tr.page_array(0)
    np.testing.assert_array_equal(got, img)
