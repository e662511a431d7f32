"""Motion-correction pipeline: options, streaming engine, in-memory API."""

from flowreg3d_tpu.pipeline.of_options import (
    ChannelNormalization,
    ConstancyAssumption,
    InterpolationMethod,
    NamingConvention,
    OFOptions,
    OutputFormat,
    QualitySetting,
    compensate_inplace,
    get_mcp_schema,
)
from flowreg3d_tpu.pipeline.corrector import (
    BatchMotionCorrector,
    RegistrationConfig,
    compensate_recording,
)
from flowreg3d_tpu.pipeline.compensate_arr import compensate_arr, compensate_arr_3D
from flowreg3d_tpu.pipeline.stats import flow_statistics

__all__ = [
    "OFOptions",
    "OutputFormat",
    "QualitySetting",
    "ChannelNormalization",
    "InterpolationMethod",
    "ConstancyAssumption",
    "NamingConvention",
    "BatchMotionCorrector",
    "RegistrationConfig",
    "compensate_recording",
    "compensate_arr",
    "compensate_arr_3D",
    "compensate_inplace",
    "flow_statistics",
    "get_mcp_schema",
]
