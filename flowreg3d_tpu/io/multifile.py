"""Multi-file channel wrappers and subset views.

Parity target: reference util/io/multifile_wrappers_3d.py —
``MULTIFILEFileWriter3D`` (one single-channel file per channel, named
``<stem>_ch<N>.<ext>``), ``MULTICHANNELFileReader3D`` (N single-channel files
presented as one multichannel stream), ``SUBSETFileReader3D`` (an
index-subset view over any reader).
"""

import os

import numpy as np

from flowreg3d_tpu.io.base import VideoReader3D, VideoWriter3D


class MULTIFILEFileWriter3D(VideoWriter3D):
    """Splits channels into per-channel files via the single-file writers."""

    _EXT = {"TIFF": ".tif", "HDF5": ".h5", "MAT": ".mat"}

    def __init__(self, file_path, file_type="TIFF", **kwargs):
        super().__init__()
        self.file_path = str(file_path)
        self.file_type = file_type.upper()
        self.writer_kwargs = kwargs
        self._writers = None

    def _channel_path(self, c):
        stem, ext = os.path.splitext(self.file_path)
        ext = ext or self._EXT.get(self.file_type, ".tif")
        return f"{stem}_ch{c + 1}{ext}"

    def write_frames(self, frames):
        from flowreg3d_tpu.io.factory import get_video_file_writer

        frames = self._as_batch(np.asarray(frames))
        if not self.initialized:
            self.init(frames)
            self._writers = [
                get_video_file_writer(self._channel_path(c), self.file_type,
                                      **self.writer_kwargs)
                for c in range(self.n_channels)
            ]
        for c, w in enumerate(self._writers):
            w.write_frames(frames[..., c:c + 1])

    def close(self):
        if self._writers:
            for w in self._writers:
                w.close()
            self._writers = None


class MULTICHANNELFileReader3D(VideoReader3D):
    """Merges N single-channel readers into one multichannel stream."""

    def __init__(self, file_paths, buffer_size=10, bin_size=1, **kwargs):
        super().__init__()
        from flowreg3d_tpu.io.factory import get_video_file_reader

        self.readers = [
            get_video_file_reader(p, buffer_size, bin_size=1, **kwargs)
            for p in file_paths
        ]
        self.buffer_size = buffer_size
        self.bin_size = bin_size

    def _initialize(self):
        for r in self.readers:
            r._ensure_initialized()
        shapes = {r.unbinned_shape[:4] for r in self.readers}
        if len(shapes) != 1:
            raise ValueError(
                f"Channel files disagree on shape: {sorted(shapes)}")
        first = self.readers[0]
        self.frame_count = first.frame_count
        self.depth = first.depth
        self.height = first.height
        self.width = first.width
        self.n_channels = sum(r.n_channels for r in self.readers)
        self.dtype = first.dtype

    def _read_raw_frames(self, frame_indices):
        parts = [r._read_raw_frames(frame_indices) for r in self.readers]
        return np.concatenate(parts, axis=-1)

    def close(self):
        for r in self.readers:
            r.close()


def _natural_key(name):
    """Numeric-aware sort key: vol_2 < vol_10."""
    import re

    return [int(t) if t.isdigit() else t.lower()
            for t in re.split(r"(\d+)", name)]


class FolderReader3D(VideoReader3D):
    """A directory of volume files presented as one time series.

    Files with a supported extension (.tif/.tiff/.h5/.hdf5/.hdf/.mat) are
    naturally sorted (vol_2 before vol_10) and concatenated along T; each
    file may hold one or more timepoints. All files must agree on
    (Z, Y, X, C). The reference leaves folder input unimplemented
    (factory.py:61-65 raises NotImplementedError); this reader goes
    beyond parity because per-timepoint files are a common microscope
    export layout.
    """

    _EXTS = (".tif", ".tiff", ".h5", ".hdf5", ".hdf", ".mat")

    def __init__(self, folder, buffer_size=10, bin_size=1, **kwargs):
        super().__init__()
        self.folder = str(folder)
        self.buffer_size = buffer_size
        self.bin_size = bin_size
        self._reader_kwargs = kwargs
        names = [n for n in os.listdir(self.folder)
                 if os.path.splitext(n)[1].lower() in self._EXTS]
        exts = {os.path.splitext(n)[1].lower() for n in names}
        exts = {".tif" if e == ".tiff" else e for e in exts}
        exts = {".h5" if e in (".hdf5", ".hdf") else e for e in exts}
        if not names:
            raise FileNotFoundError(
                f"No supported volume files (.tif/.h5/.mat) in {folder}")
        if len(exts) > 1:
            raise ValueError(
                f"Mixed file formats in folder {folder}: {sorted(exts)}")
        self.paths = [os.path.join(self.folder, n)
                      for n in sorted(names, key=_natural_key)]
        self.readers = None

    def _initialize(self):
        from flowreg3d_tpu.io.factory import get_video_file_reader

        self.readers = [
            get_video_file_reader(p, self.buffer_size, bin_size=1,
                                  **self._reader_kwargs)
            for p in self.paths
        ]
        for r in self.readers:
            r._ensure_initialized()
        shapes = {(r.depth, r.height, r.width, r.n_channels)
                  for r in self.readers}
        if len(shapes) != 1:
            raise ValueError(
                f"Folder files disagree on volume shape: {sorted(shapes)}")
        counts = [r.frame_count for r in self.readers]
        self._starts = np.concatenate([[0], np.cumsum(counts)])
        self.frame_count = int(self._starts[-1])
        first = self.readers[0]
        self.depth = first.depth
        self.height = first.height
        self.width = first.width
        self.n_channels = first.n_channels
        self.dtype = first.dtype

    def _read_raw_frames(self, frame_indices):
        if isinstance(frame_indices, slice):
            frame_indices = range(*frame_indices.indices(self.frame_count))
        idx = np.asarray(list(frame_indices), dtype=np.int64)
        out = [None] * len(idx)
        # group by source file so each file is touched once per request
        owner = np.searchsorted(self._starts, idx, side="right") - 1
        for f in np.unique(owner):
            local = idx[owner == f] - self._starts[f]
            frames = self.readers[f]._read_raw_frames(list(local))
            for slot, frame in zip(np.flatnonzero(owner == f), frames):
                out[slot] = frame
        return np.stack(out)

    def close(self):
        for r in self.readers or ():
            r.close()


class SUBSETFileReader3D(VideoReader3D):
    """Presents a subset of another reader's (binned) frames as a stream."""

    def __init__(self, reader, indices, buffer_size=None):
        super().__init__()
        self.reader = reader
        reader._ensure_initialized()
        n = reader.binned_count
        idx = np.asarray(indices, dtype=np.int64)
        idx = np.where(idx < 0, n + idx, idx)
        if np.any((idx < 0) | (idx >= n)):
            raise IndexError(f"subset index out of range for {n} frames")
        self.indices = idx
        self.buffer_size = buffer_size or reader.buffer_size
        self.bin_size = 1  # the wrapped reader already applied binning

    def _initialize(self):
        self.frame_count = len(self.indices)
        self.depth = self.reader.depth
        self.height = self.reader.height
        self.width = self.reader.width
        self.n_channels = self.reader.n_channels
        self.dtype = self.reader.dtype

    def _read_raw_frames(self, frame_indices):
        if isinstance(frame_indices, slice):
            sel = self.indices[frame_indices]
        else:
            sel = self.indices[np.asarray(frame_indices)]
        return self.reader[list(sel)]

    def close(self):
        self.reader.close()
