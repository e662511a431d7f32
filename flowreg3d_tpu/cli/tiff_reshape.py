"""``flowreg3d tiff-reshape``: flat TIFF -> proper 3D volumetric stack.

Parity target: reference cli/tiff_reshape.py — ScanImage auto-detection or
manual ``--slices-per-volume``; volume range/stride selection; frames-per-
slice averaging; optional per-axis scaling via the fused Gauss-cubic resize;
dry-run; TZYXC ImageJ hyperstack output.

Note: the built-in TIFF codec writes uncompressed data; ``--compression``
values other than 'none' are accepted for CLI compatibility and ignored with
a warning.
"""

import os
import warnings

import numpy as np


def add_parser(subparsers):
    parser = subparsers.add_parser(
        "tiff-reshape",
        help="Convert flat TIFF files to proper 3D volumetric stacks",
        description="Reshape TIFFs storing 3D volumes as sequential 2D "
                    "slices into TZYXC stacks (ScanImage auto-detection, "
                    "volume selection, optional scaling).",
    )
    parser.add_argument("input_file", type=str)
    parser.add_argument("output_file", type=str)
    g = parser.add_argument_group("Structure specification")
    g.add_argument("--slices-per-volume", "-z", type=int, default=None)
    g.add_argument("--frames-per-slice", "-f", type=int, default=1)
    g = parser.add_argument_group("Volume selection")
    g.add_argument("--start-volume", "-s", type=int, default=None)
    g.add_argument("--end-volume", "-e", type=int, default=None)
    g.add_argument("--volume-stride", "--stride", type=int, default=1)
    g = parser.add_argument_group("Processing options")
    g.add_argument("--channels", type=int, default=None)
    g.add_argument("--dim-order", type=str, default=None)
    g.add_argument("--scale", nargs=3, type=float,
                   metavar=("SX", "SY", "SZ"), default=None)
    g.add_argument("--compression", type=str,
                   choices=["none", "lzw", "zlib", "jpeg"], default="none")
    g = parser.add_argument_group("Output options")
    g.add_argument("--output-dim-order", type=str, default="TZYXC")
    g.add_argument("--imagej", action="store_true")
    g.add_argument("--split-channels", action="store_true")
    parser.add_argument("--dry-run", action="store_true")
    parser.add_argument("--verbose", "-v", action="store_true")
    parser.add_argument("--overwrite", action="store_true")
    parser.set_defaults(func=reshape_tiff)
    return parser


def _load_pages(path):
    from flowreg3d_tpu.io._tiff_format import TiffReader

    with TiffReader(path) as tr:
        return tr.asarray(), tr.imagej_metadata


def _detect_structure(args, pages):
    """(slices, channels, frames_per_slice) from flags or metadata."""
    slices = args.slices_per_volume
    channels = args.channels
    fps = args.frames_per_slice

    if slices is None or channels is None:
        from flowreg3d_tpu.io.scanimage import parse_scanimage_metadata

        meta = parse_scanimage_metadata(args.input_file)
        if meta:
            if args.verbose:
                from flowreg3d_tpu.io.scanimage import format_scanimage_report

                print(format_scanimage_report(meta))
            slices = slices or meta["slices_per_volume"]
            channels = channels or meta["channels"]
            if args.frames_per_slice == 1:
                fps = meta["frames_per_slice"]
    if slices is None:
        raise ValueError(
            "Cannot auto-detect slices per volume; pass --slices-per-volume")
    return int(slices), int(channels or 1), max(1, int(fps))


def _apply_scale(volumes, scale):
    """Per-axis (sx, sy, sz) fused Gauss-cubic resize of each volume."""
    from flowreg3d_tpu.ops.resize import imresize_fused_gauss_cubic3D

    sx, sy, sz = scale
    T, Z, Y, X, C = volumes.shape
    out_size = (max(1, round(Z * sz)), max(1, round(Y * sy)),
                max(1, round(X * sx)))
    scaled = np.stack([
        np.asarray(imresize_fused_gauss_cubic3D(volumes[t], out_size))
        for t in range(T)
    ])
    return scaled


def reshape_tiff(args):
    if os.path.exists(args.output_file) and not args.overwrite:
        raise FileExistsError(
            f"{args.output_file} exists (use --overwrite)")
    if args.compression not in (None, "none"):
        warnings.warn("built-in TIFF codec writes uncompressed data; "
                      f"--compression {args.compression} ignored")

    pages, ij_meta = _load_pages(args.input_file)
    if pages.ndim == 4:  # (N, H, W, S) interleaved channels in samples
        n_pages, H, W, S = pages.shape
        pages = pages.reshape(n_pages * 1, H, W, S)
    else:
        n_pages, H, W = pages.shape
        S = 1
        pages = pages[..., np.newaxis]

    slices, channels, fps = _detect_structure(args, pages)
    if S > 1:
        channels = S

    per_volume = slices * fps * (channels if S == 1 else 1)
    n_volumes = n_pages // per_volume
    if n_volumes < 1:
        raise ValueError(
            f"{n_pages} pages < one volume ({per_volume} pages)")

    if args.verbose or args.dry_run:
        print(f"Input: {n_pages} pages of {H}x{W}")
        print(f"Structure: {n_volumes} volumes x {slices} slices x "
              f"{channels} channels (frames/slice {fps})")

    start = args.start_volume or 0
    end = args.end_volume if args.end_volume is not None else n_volumes
    sel = list(range(start, min(end, n_volumes), args.volume_stride))
    if args.dry_run:
        print(f"Would write {len(sel)} volumes "
              f"({start}..{min(end, n_volumes)} step {args.volume_stride}) "
              f"to {args.output_file}")
        return 0

    used = pages[: n_volumes * per_volume]
    if S == 1:
        shaped = used.reshape(n_volumes, slices, fps, channels, H, W)
        shaped = shaped.mean(axis=2).astype(pages.dtype)  # avg frames/slice
        volumes = np.moveaxis(shaped, 2, -1)  # (T, Z, H, W, C)
    else:
        shaped = used.reshape(n_volumes, slices, fps, H, W, S)
        volumes = shaped.mean(axis=2).astype(pages.dtype)

    volumes = volumes[sel]
    if args.scale is not None:
        volumes = _apply_scale(volumes, args.scale)

    if args.verbose:
        print(f"Writing {volumes.shape} -> {args.output_file}")
    _write_output(volumes, args.output_file, args.split_channels)
    print(f"Wrote {volumes.shape[0]} volumes to {args.output_file}")
    return 0


def _write_output(volumes, output_file, split_channels):
    from flowreg3d_tpu.io.tiff3d import TIFFFileWriter3D
    from flowreg3d_tpu.io.multifile import MULTIFILEFileWriter3D

    if split_channels and volumes.shape[-1] > 1:
        w = MULTIFILEFileWriter3D(output_file, "TIFF")
    else:
        w = TIFFFileWriter3D(output_file)
    with w:
        w.write_frames(volumes)
