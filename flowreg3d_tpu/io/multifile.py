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
