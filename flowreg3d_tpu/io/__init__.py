"""Streaming volumetric I/O: readers/writers for HDF5, TIFF, MAT, arrays.

Host-side subsystem (pure Python/numpy). Parity target: reference util/io/
(SURVEY.md §2.7) — the VideoReader3D/VideoWriter3D streaming protocol with
temporal binning, format factories, MATLAB-compatible HDF5 layout, ImageJ
hyperstack TIFF, MAT v5/v7.3, multifile/multichannel wrappers, dataset
discovery heuristics, and ScanImage metadata parsing.

This build carries its own TIFF codec (flowreg3d_tpu/io/_tiff_format.py) and
MAT-v7.3 writer (HDF5 + MATLAB header via h5py) instead of depending on
tifffile/hdf5storage.
"""

from flowreg3d_tpu.io.base import VideoReader3D, VideoWriter3D
from flowreg3d_tpu.io.array import ArrayReader3D, ArrayWriter3D
from flowreg3d_tpu.io.factory import get_video_file_reader, get_video_file_writer

__all__ = [
    "VideoReader3D",
    "VideoWriter3D",
    "ArrayReader3D",
    "ArrayWriter3D",
    "get_video_file_reader",
    "get_video_file_writer",
]
