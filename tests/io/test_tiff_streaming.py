"""Constant-memory streaming through the page-based TIFF reader and CLI.

Builds a sparse half-GB-logical ImageJ-contiguous TIFF (one real page, the
rest virtual pages over a file hole — zero disk cost, real read path) and
asserts that streaming reads / tiff-reshape keep peak Python allocations
bounded far below the logical data size (reference property: arbitrarily
long recordings in constant memory, util/io/tiff.py:18-582).
"""

import tracemalloc

import numpy as np
import pytest

from flowreg3d_tpu.io._tiff_format import (TiffReader, TiffWriter,
                                           build_imagej_description)

H, W = 256, 512
PAGE_BYTES = H * W * 2
N_PAGES = 2048          # 512 MB logical
SLICES = 8
FRAMES = N_PAGES // SLICES
MEM_CAP = 96 * 2 ** 20  # far below the 512 MB logical size


@pytest.fixture(scope="module")
def big_sparse_tiff(tmp_path_factory):
    path = tmp_path_factory.mktemp("big") / "big.tif"
    page0 = (np.arange(H * W, dtype=np.uint16).reshape(H, W) % 1000)
    with TiffWriter(str(path)) as w:
        w.set_description(build_imagej_description(
            N_PAGES, channels=1, slices=SLICES, frames=FRAMES))
        w.write_page(page0)
        # extend sparsely: virtual pages 1..N-1 read zeros from the hole
        end = w._pos + (N_PAGES - 1) * PAGE_BYTES
        w._fh.truncate(end)
        w._fh.seek(end)
        w._pos = end
    return path, page0


@pytest.mark.slow
def test_reader_streams_bounded(big_sparse_tiff):
    from flowreg3d_tpu.io.tiff3d import TIFFFileReader3D

    path, page0 = big_sparse_tiff
    r = TIFFFileReader3D(str(path), buffer_size=4)
    assert r.shape == (FRAMES, SLICES, H, W, 1)

    tracemalloc.start()
    n = 0
    checked_first = False
    while r.has_batch():
        batch = r.read_batch()
        if not checked_first:
            np.testing.assert_array_equal(batch[0, 0, :, :, 0], page0)
            assert batch[1:].max() == 0
            checked_first = True
        n += batch.shape[0]
    peak = tracemalloc.get_traced_memory()[1]
    tracemalloc.stop()
    r.close()
    assert n == FRAMES
    assert peak < MEM_CAP, f"peak {peak / 2**20:.0f} MB"


def test_tiff_reshape_cli_streams_bounded(big_sparse_tiff, tmp_path):
    from flowreg3d_tpu.cli.main import main

    path, page0 = big_sparse_tiff
    out = tmp_path / "reshaped.tif"
    tracemalloc.start()
    rc = main(["tiff-reshape", str(path), str(out),
               "--slices-per-volume", str(SLICES)])
    peak = tracemalloc.get_traced_memory()[1]
    tracemalloc.stop()
    assert rc == 0
    assert peak < MEM_CAP, f"peak {peak / 2**20:.0f} MB"

    with TiffReader(str(out)) as tr:
        assert tr.n_pages == N_PAGES
        np.testing.assert_array_equal(tr.page_array(0), page0)
        ij = tr.imagej_metadata
    assert ij["slices"] == SLICES and ij["frames"] == FRAMES


def test_reader_deinterleaves_sample_channels(tmp_path):
    """Pages with samples-per-pixel > 1 stream as deinterleaved channels."""
    from flowreg3d_tpu.io.tiff3d import TIFFFileReader3D

    rng = np.random.default_rng(0)
    data = (rng.random((6, 5, 7, 2)) * 800).astype(np.uint16)  # (N,H,W,S)
    path = tmp_path / "inter.tif"
    with TiffWriter(str(path)) as w:
        w.set_description(build_imagej_description(
            6, channels=1, slices=3, frames=2))
        for p in data:
            w.write_page(p)

    r = TIFFFileReader3D(str(path))
    assert r.shape == (2, 3, 5, 7, 2)
    got = r[:]
    r.close()
    np.testing.assert_array_equal(
        got, data.reshape(2, 3, 5, 7, 2))


def test_exotic_dim_order_memmaps_bounded(tmp_path):
    """Exotic ``dim_order`` layouts hit the eager fallback — which must be
    a memmap view (reference use_memmap, util/io/tiff.py:41-55,444-445),
    not a whole-file materialization. 2 GB logical, sparse on disk."""
    from flowreg3d_tpu.io.tiff3d import TIFFFileReader3D

    n_pages, h, w, s = 2048, 256, 512, 4
    page_bytes = h * w * s * 2
    page0 = (np.arange(h * w * s, dtype=np.uint16).reshape(h, w, s) % 1000)
    path = tmp_path / "exotic.tif"
    with TiffWriter(str(path), bigtiff=True) as tw:
        tw.write_page(page0)
        base = tw._pages[0][0]
        # pages 1..N-1 live in a file hole: real IFDs, zero disk cost
        for k in range(1, n_pages):
            tw._pages.append((base + k * page_bytes, page_bytes,
                              page0.shape, page0.dtype))
        end = base + n_pages * page_bytes
        tw._fh.truncate(end)
        tw._fh.seek(end)
        tw._pos = end

    # T=pages, Y/X in-page, Z=sample axis: inexpressible by page streaming
    r = TIFFFileReader3D(str(path), dim_order="TYXZ", buffer_size=4)
    tracemalloc.start()
    assert r.shape == (n_pages, s, h, w, 1)
    first = r[0]
    mid = r[n_pages // 2]
    peak = tracemalloc.get_traced_memory()[1]
    tracemalloc.stop()
    r.close()
    np.testing.assert_array_equal(
        first[..., 0], np.transpose(page0, (2, 0, 1)))
    assert mid.max() == 0
    assert peak < MEM_CAP, f"peak {peak / 2**20:.0f} MB"


def test_memmap_pages_matches_asarray(tmp_path):
    """The zero-copy view decodes identically to the strip decoder."""
    rng = np.random.default_rng(7)
    data = (rng.random((5, 16, 24)) * 500).astype(np.uint16)
    path = tmp_path / "mm.tif"
    with TiffWriter(str(path)) as tw:
        for p in data:
            tw.write_page(p)
    with TiffReader(str(path)) as tr:
        mm = tr.memmap_pages()
        assert mm is not None
        np.testing.assert_array_equal(np.asarray(mm), tr.asarray())
