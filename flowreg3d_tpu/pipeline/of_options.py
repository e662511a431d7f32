"""OFOptions: the user-facing pipeline configuration (pydantic v2).

Parity target: reference motion_correction/OF_options_3D.py:130-740 — same
field groups (I/O, flow params, preprocessing, reference handling, processing
flags), validators (alpha→3-tuple :239-264, weight→sum-1 :266-284,
sigma→(C,4) :286-309), quality presets mapping to effective_min_level 0/4/6
(:329-341), reader/writer construction via the io factory (:405-464),
reference-frame acquisition (:466-600), JSON save/load with MATLAB-style
header (:602-665), solver-kwargs extraction ``to_dict`` (:667-680) and the
MCP JSON-schema export (:736).
"""

import json
import warnings
from datetime import date
from enum import Enum
from pathlib import Path
from typing import Any, Callable, List, Optional, Tuple, Union

import numpy as np
from pydantic import (
    BaseModel,
    ConfigDict,
    Field,
    PrivateAttr,
    StrictInt,
    field_validator,
    model_validator,
)

from flowreg3d_tpu.io.base import VideoReader3D, VideoWriter3D


class OutputFormat(str, Enum):
    TIFF = "TIFF"
    HDF5 = "HDF5"
    MAT = "MAT"
    MULTIFILE_TIFF = "MULTIFILE_TIFF"
    MULTIFILE_MAT = "MULTIFILE_MAT"
    MULTIFILE_HDF5 = "MULTIFILE_HDF5"
    CAIMAN_HDF5 = "CAIMAN_HDF5"
    BEGONIA = "BEGONIA"
    SUITE2P_TIFF = "SUITE2P_TIFF"
    ARRAY = "ARRAY"


class QualitySetting(str, Enum):
    QUALITY = "quality"
    BALANCED = "balanced"
    FAST = "fast"
    CUSTOM = "custom"


class ChannelNormalization(str, Enum):
    JOINT = "joint"
    SEPARATE = "separate"


class InterpolationMethod(str, Enum):
    NEAREST = "nearest"
    LINEAR = "linear"
    CUBIC = "cubic"


class ConstancyAssumption(str, Enum):
    GRAY = "gray"
    GRADIENT = "gc"


class NamingConvention(str, Enum):
    DEFAULT = "default"
    BATCH = "batch"


_QUALITY_MIN_LEVEL = {
    QualitySetting.QUALITY: 0,
    QualitySetting.BALANCED: 4,
    QualitySetting.FAST: 6,
}

_FORMAT_BACKEND = {
    OutputFormat.CAIMAN_HDF5: "HDF5",
    OutputFormat.BEGONIA: "MAT",
    OutputFormat.SUITE2P_TIFF: "TIFF",
}


class OFOptions(BaseModel):
    """Motion-correction options; the public API contract of the pipeline."""

    model_config = ConfigDict(
        arbitrary_types_allowed=True,
        validate_assignment=False,
        extra="forbid",
        populate_by_name=True,
    )

    # I/O
    input_file: Optional[Union[str, Path, np.ndarray, VideoReader3D,
                               List[str]]] = Field(None)
    input_dim_order: str = Field("TZYX")
    output_path: Path = Field(Path("results"))
    output_format: OutputFormat = Field(OutputFormat.MAT)
    output_file_name: Optional[str] = Field(None)
    channel_idx: Optional[List[int]] = Field(None)

    # Flow parameters
    alpha: Union[float, Tuple[float, float],
                 Tuple[float, float, float]] = Field((0.25, 0.25, 0.25))
    weight: Union[List[float], np.ndarray] = Field([0.5, 0.5])
    levels: StrictInt = Field(100, ge=1)
    min_level: StrictInt = Field(5, ge=-1)
    quality_setting: QualitySetting = Field(QualitySetting.QUALITY)
    eta: float = Field(0.8, gt=0, le=1)
    update_lag: StrictInt = Field(5, ge=1)
    iterations: StrictInt = Field(100, ge=1)
    a_smooth: float = Field(1.0, ge=0)
    a_data: float = Field(0.45, gt=0, le=1)

    # Preprocessing
    sigma: Any = Field([[1.0, 1.0, 1.0, 0.1], [1.0, 1.0, 1.0, 0.1]])
    bin_size: StrictInt = Field(1, ge=1)
    buffer_size: StrictInt = Field(10, ge=1)

    # Reference
    reference_frames: Union[List[int], str, Path, np.ndarray] = Field(
        default_factory=lambda: list(range(50, 500)))
    update_reference: bool = Field(False)
    n_references: StrictInt = Field(1, ge=1)
    min_frames_per_reference: StrictInt = Field(20, ge=1)
    preregister_reference: bool = Field(
        False, description="Pre-register index-list references with alpha+2 "
        "before averaging (3D extension of the reference's 2D prereg path)")

    # Processing options
    verbose: bool = Field(False)
    save_meta_info: bool = Field(True)
    save_w: bool = Field(False)
    save_valid_mask: bool = Field(False)
    save_valid_idx: bool = Field(False)
    output_typename: Optional[str] = Field("double")
    channel_normalization: ChannelNormalization = Field(
        ChannelNormalization.JOINT)
    interpolation_method: InterpolationMethod = Field(
        InterpolationMethod.CUBIC)
    cc_initialization: bool = Field(False)
    cc_hw: Union[int, Tuple[int, int]] = Field(256)
    cc_up: int = Field(10, ge=1)
    update_initialization_w: bool = Field(True)
    naming_convention: NamingConvention = Field(NamingConvention.DEFAULT)
    constancy_assumption: ConstancyAssumption = Field(
        ConstancyAssumption.GRADIENT, alias="constancy")

    preproc_funct: Optional[Callable] = Field(None, exclude=True)

    _video_reader: Optional[VideoReader3D] = PrivateAttr(default=None)
    _video_writer: Optional[VideoWriter3D] = PrivateAttr(default=None)
    _quality_setting_old: QualitySetting = PrivateAttr(
        default=QualitySetting.QUALITY)

    # -- validators ---------------------------------------------------------

    @field_validator("alpha", mode="before")
    @classmethod
    def _normalize_alpha(cls, v):
        vals = ([v] if isinstance(v, (int, float)) else list(v))
        if len(vals) == 1:
            vals = vals * 3
        elif len(vals) == 2:
            # legacy 2D (ax, ay): duplicate the first value for z
            vals = [vals[0], vals[0], vals[1]]
        elif len(vals) != 3:
            raise ValueError("Alpha must be scalar, 2-element, or 3-element")
        vals = [float(a) for a in vals]
        if any(a <= 0 for a in vals):
            raise ValueError("All alpha values must be positive")
        return tuple(vals)

    @field_validator("weight", mode="before")
    @classmethod
    def _normalize_weight(cls, v):
        arr = np.asarray(v, dtype=float)
        if arr.ndim == 1:
            if arr.sum() > 0:
                arr = arr / arr.sum()
            return arr.tolist()
        # spatial weight maps ((C,Z,Y,X) or (Z,Y,X)) stay as ndarrays
        return arr

    @field_validator("sigma", mode="before")
    @classmethod
    def _normalize_sigma(cls, v):
        sig = np.asarray(v, dtype=float)
        if sig.ndim == 1:
            if sig.size == 3:  # 2D [sx,sy,st] -> insert sz=1
                sig = np.insert(sig, 2, 1.0)
            elif sig.size != 4:
                raise ValueError(
                    "1D sigma must be [sx,sy,sz,st] or [sx,sy,st]")
            return sig.reshape(1, 4).tolist()
        if sig.ndim == 2:
            if sig.shape[1] == 3:
                sig = np.insert(sig, 2, 1.0, axis=1)
            elif sig.shape[1] != 4:
                raise ValueError("2D sigma must be (n_channels, 4)")
            return sig.tolist()
        raise ValueError("Sigma must be [sx,sy,sz,st] or (n_channels, 4)")

    @model_validator(mode="after")
    def _quality_logic(self):
        if not isinstance(self.output_path, Path):
            self.output_path = Path(self.output_path)
        if self.quality_setting != QualitySetting.CUSTOM:
            self._quality_setting_old = self.quality_setting
        if self.min_level >= 0:
            self.quality_setting = QualitySetting.CUSTOM
        elif self.min_level == -1 \
                and self.quality_setting == QualitySetting.CUSTOM:
            self.quality_setting = self._quality_setting_old
        return self

    # -- derived ------------------------------------------------------------

    @property
    def effective_min_level(self) -> int:
        if self.min_level >= 0:
            return self.min_level
        return _QUALITY_MIN_LEVEL.get(self.quality_setting,
                                      max(self.min_level, 0))

    @property
    def constancy(self) -> str:
        return self.constancy_assumption.value

    @constancy.setter
    def constancy(self, value):
        self.constancy_assumption = (
            value if isinstance(value, ConstancyAssumption)
            else ConstancyAssumption(value))

    def get_sigma_at(self, i: int) -> np.ndarray:
        sig = np.asarray(self.sigma, dtype=float)
        if sig.ndim == 1:
            return sig
        return sig[i] if i < sig.shape[0] else sig[0]

    def get_weight_at(self, i: int, n_channels: int):
        w = np.asarray(self.weight, dtype=float)
        if w.ndim <= 1:
            if w.size == 1:
                return float(w.reshape(-1)[0])
            if w.size > n_channels:
                w = w[:n_channels]
                w = w / w.sum()
                self.weight = w.tolist()
            if i >= w.size:
                return 1.0 / n_channels
            return float(w[i])
        if i >= w.shape[0]:
            return np.ones(w.shape[1:]) / n_channels
        return w[i]

    def copy(self) -> "OFOptions":
        return self.model_copy(deep=True)

    # -- reader / writer ----------------------------------------------------

    def get_video_reader(self) -> VideoReader3D:
        if self._video_reader is not None:
            return self._video_reader
        if isinstance(self.input_file, VideoReader3D):
            self._video_reader = self.input_file
            return self._video_reader
        from flowreg3d_tpu.io.factory import get_video_file_reader

        self._video_reader = get_video_file_reader(
            self.input_file, buffer_size=self.buffer_size,
            bin_size=self.bin_size, dim_order=self.input_dim_order)
        self.input_file = self._video_reader
        return self._video_reader

    def get_video_writer(self) -> VideoWriter3D:
        if self._video_writer is not None:
            return self._video_writer
        from flowreg3d_tpu.io.factory import get_video_file_writer

        fmt = self.output_format
        backend = _FORMAT_BACKEND.get(fmt, fmt.value)
        writer_kwargs = {}
        if fmt == OutputFormat.CAIMAN_HDF5:
            # CaImAn convention: a single dataset named 'mov', time-major
            writer_kwargs = {"dataset_names": "mov",
                             "dimension_ordering": (1, 2, 3, 0)}
        if self.output_file_name:
            filename = self.output_file_name
        elif fmt == OutputFormat.ARRAY:
            filename = None
        else:
            # MULTIFILE_<FMT> writers split per channel; name by base format
            ext = backend.split("_")[-1] if backend.startswith("MULTIFILE") \
                else backend
            if self.naming_convention == NamingConvention.DEFAULT:
                filename = str(self.output_path / f"compensated.{ext}")
            else:
                reader = self.get_video_reader()
                stem = Path(getattr(reader, "file_path", "output")).stem
                filename = str(self.output_path / f"{stem}_compensated.{ext}")
        self._video_writer = get_video_file_writer(filename, backend,
                                                   **writer_kwargs)
        return self._video_writer

    # -- reference ----------------------------------------------------------

    def get_reference_frame(self, video_reader=None):
        """Reference volume (Z,Y,X,C): ndarray passthrough, TIFF path, or
        mean over an index list (optionally pre-registered, alpha+2)."""
        if self.n_references > 1:
            warnings.warn("Multi-reference mode repeats a single reference")
            single = self.model_copy(update={"n_references": 1})
            ref = single.get_reference_frame(video_reader)
            return [ref] * self.n_references

        if isinstance(self.reference_frames, np.ndarray):
            return self.reference_frames

        if isinstance(self.reference_frames, (str, Path)):
            p = Path(self.reference_frames)
            if p.suffix.lower() in (".tif", ".tiff"):
                from flowreg3d_tpu.io._tiff_format import TiffReader

                with TiffReader(str(p)) as tr:
                    arr = tr.asarray()
                return arr[0] if arr.shape[0] == 1 else arr
            raise ValueError(f"Unsupported reference image format: {p.suffix}")

        if isinstance(self.reference_frames, list) and video_reader is not None:
            idx = [i for i in self.reference_frames
                   if i < video_reader.binned_count]
            if not idx:
                idx = [0]
            frames = video_reader[idx]  # (T,Z,Y,X,C)
            if frames.ndim == 4:
                return frames
            if frames.shape[0] == 1 or not self.preregister_reference:
                return frames.mean(axis=0)
            return self._preregister_reference(frames)

        return np.asarray(self.reference_frames)

    def _preregister_reference(self, frames):
        """Mean -> compensate each frame vs mean with alpha+2 -> mean."""
        from flowreg3d_tpu.pipeline.compensate_arr import compensate_arr

        ref0 = frames.mean(axis=0)
        alpha_prereg = tuple(a + 2.0 for a in self.alpha)
        opts = self.model_copy(update={
            "alpha": alpha_prereg,
            "reference_frames": ref0,
            "cc_initialization": False,
            "preregister_reference": False,
        })
        compensated, _ = compensate_arr(frames, ref0, options=opts)
        return compensated.mean(axis=0)

    # -- persistence --------------------------------------------------------

    def save_options(self, filepath=None) -> None:
        path = Path(filepath) if filepath else self.output_path / "options.json"
        path.parent.mkdir(parents=True, exist_ok=True)
        data = self.model_dump(by_alias=True, exclude={"preproc_funct"})
        for k, v in list(data.items()):
            if isinstance(v, Path):
                data[k] = str(v)
            elif isinstance(v, np.ndarray):
                data[k] = v.tolist()
            elif isinstance(v, Enum):
                data[k] = v.value
        if isinstance(self.reference_frames, np.ndarray):
            from flowreg3d_tpu.io._tiff_format import TiffWriter

            ref_path = path.parent / "reference_frames.tif"
            ref = self.reference_frames
            with TiffWriter(str(ref_path)) as tw:
                pages = ref if ref.ndim >= 3 else ref[np.newaxis]
                for page in pages.reshape(-1, *pages.shape[-2:]) \
                        if pages.ndim == 3 else pages.reshape(
                            -1, *pages.shape[-3:-1], pages.shape[-1]):
                    tw.write_page(page)
            data["reference_frames"] = str(ref_path)
            data["_reference_frames_shape"] = list(ref.shape)
        if isinstance(data.get("input_file"), (np.ndarray,)) or isinstance(
                self.input_file, (np.ndarray, VideoReader3D)):
            data["input_file"] = None
        with path.open("w", encoding="utf-8") as f:
            f.write(f"Compensation options {date.today().isoformat()}\n\n")
            json.dump(data, f, indent=2, default=str)

    @classmethod
    def load_options(cls, filepath) -> "OFOptions":
        p = Path(filepath)
        lines = p.read_text(encoding="utf-8").splitlines(keepends=True)
        start = next((i for i, ln in enumerate(lines)
                      if ln.strip().startswith("{")), 0)
        data = json.loads("".join(lines[start:]))
        shape = data.pop("_reference_frames_shape", None)
        ref = data.get("reference_frames")
        if isinstance(ref, str):
            rp = Path(ref)
            if rp.exists() and rp.suffix.lower() in (".tif", ".tiff"):
                from flowreg3d_tpu.io._tiff_format import TiffReader

                with TiffReader(str(rp)) as tr:
                    arr = tr.asarray()
                if shape is not None:
                    arr = arr.reshape(shape)
                data["reference_frames"] = arr
        return cls(**data)

    def to_dict(self) -> dict:
        """Solver kwargs for ``get_displacement``."""
        return {
            "alpha": self.alpha,
            "weight": self.weight,
            "levels": self.levels,
            "min_level": self.effective_min_level,
            "eta": self.eta,
            "iterations": self.iterations,
            "update_lag": self.update_lag,
            "a_data": self.a_data,
            "a_smooth": self.a_smooth,
            "const_assumption": self.constancy_assumption.value,
        }

    def __repr__(self) -> str:
        return (f"OFOptions(quality={self.quality_setting.value}, "
                f"alpha={self.alpha}, levels={self.levels}, "
                f"min_level={self.effective_min_level})")


def compensate_inplace(frames, reference, options=None, **kwargs):
    """Compensate (T,Z,Y,X,C) frames against a reference in memory.

    Parity: reference OF_options_3D.py:690-733 (3D semantics)."""
    from flowreg3d_tpu.pipeline.compensate_arr import compensate_arr

    if options is None:
        options = OFOptions(**kwargs)
    elif kwargs:
        options = options.model_copy(update=kwargs)
    return compensate_arr(frames, reference, options=options)


def get_mcp_schema() -> dict:
    return OFOptions.model_json_schema(mode="serialization")
