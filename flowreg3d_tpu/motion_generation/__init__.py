"""Synthetic 3D motion generation + evaluation (test-data tier, host numpy).

Parity target: reference motion_generation/motion_generators.py and the EPE
harness of examples/motion_correct_3d_test.py. Generates ground-truth
displacement fields by composing augmentors, forward-warps volumes to create
synthetic "moving" frames, and scores estimated flows with End-Point Error.
"""

from flowreg3d_tpu.motion_generation.motion_generators import (
    Expansion3DFlowAugmentor,
    FlowGenerator3D,
    Jitter3DFlowAugmentor,
    Random3DFlowAugmentor,
    Rotational3DFlowAugmentor,
    Shear3DFlowAugmentor,
    Translational3DFlowAugmentor,
    get_default_3d_generator,
    get_high_disp_3d_generator,
    get_low_disp_3d_generator,
    get_test_3d_generator,
    warp_volume_3d,
    warp_volume_backward,
    warp_volume_splat3d,
)
from flowreg3d_tpu.motion_generation.evaluation import (
    evaluate_flow_accuracy,
    improvement_ratio,
    psnr,
)

__all__ = [
    "FlowGenerator3D",
    "Rotational3DFlowAugmentor",
    "Translational3DFlowAugmentor",
    "Jitter3DFlowAugmentor",
    "Expansion3DFlowAugmentor",
    "Random3DFlowAugmentor",
    "Shear3DFlowAugmentor",
    "warp_volume_3d",
    "warp_volume_splat3d",
    "warp_volume_backward",
    "get_default_3d_generator",
    "get_low_disp_3d_generator",
    "get_test_3d_generator",
    "get_high_disp_3d_generator",
    "evaluate_flow_accuracy",
    "improvement_ratio",
    "psnr",
]
