"""Module registry: YAML name → flax module class.

Mirrors the reference's name-resolution contract (nn/tasks.py:994-1002 —
globals then ultralytics.nn.modules fallback): YAML rows reference modules by
string name; this dict is the single source of truth.
"""

from yolo_sod_tpu.nn.modules.attention import (
    A2_Attn,
    CA_Block,
    CBAM_Block,
    GLUBlock,
    HyperACEBlock,
    MHSA,
    MixedAttention,
    OmniKernelFusion,
    SE,
    SE_Block,
    SwinBlock,
    WindowAttention,
    window_partition,
    window_reverse,
)
from yolo_sod_tpu.nn.modules.block import (
    A2C2f,
    AAttn,
    ABlock,
    Bottleneck,
    C2f,
    C3,
    C3k,
    C3k2,
    DFL,
    SPPF,
)
from yolo_sod_tpu.nn.modules.conv import (
    Add,
    ChannelNorm,
    Concat,
    Conv,
    ConvBNAct,
    ConvTranspose,
    DWConv,
    Focus,
    GhostConv,
    ScaleAdd,
    SpaceToDepth,
    Upsample,
    autopad,
)
from yolo_sod_tpu.nn.modules.fusion import (
    BiLevelRoutingAttention,
    BiLevelRoutingAttentionFusionBlock,
    ConvGRUCell,
    RecurrentAttentionFusionBlock,
    SageAttention2,
)
from yolo_sod_tpu.nn.modules.head import Detect, DetectStable
from yolo_sod_tpu.nn.modules.ssm import MambaBlock, SSMCore, selective_scan

MODULE_REGISTRY = {
    "Conv": ConvBNAct,
    "DWConv": DWConv,
    "ConvTranspose": ConvTranspose,
    "Focus": Focus,
    "GhostConv": GhostConv,
    "Concat": Concat,
    "Add": Add,
    "ScaleAdd": ScaleAdd,
    "nn.Upsample": Upsample,
    "Upsample": Upsample,
    "SpaceToDepth": SpaceToDepth,
    "ChannelNorm": ChannelNorm,
    "Bottleneck": Bottleneck,
    "C2f": C2f,
    "C3": C3,
    "C3k": C3k,
    "C3k2": C3k2,
    "SPPF": SPPF,
    "A2C2f": A2C2f,
    "ABlock": ABlock,
    "AAttn": AAttn,
    "SE": SE,
    "SE_Block": SE_Block,
    "MixedAttention": MixedAttention,
    "CBAM_Block": CBAM_Block,
    "CA_Block": CA_Block,
    "A2_Attn": A2_Attn,
    "SwinBlock": SwinBlock,
    "OmniKernelFusion": OmniKernelFusion,
    "HyperACEBlock": HyperACEBlock,
    "GLUBlock": GLUBlock,
    "MambaBlock": MambaBlock,
    "SageAttention2": SageAttention2,
    "BiLevelRoutingAttention": BiLevelRoutingAttention,
    "BiLevelRoutingAttentionFusionBlock": BiLevelRoutingAttentionFusionBlock,
    "RecurrentAttentionFusionBlock": RecurrentAttentionFusionBlock,
    "Detect": Detect,
    "DetectStable": DetectStable,
}

__all__ = list(MODULE_REGISTRY) + [
    "MODULE_REGISTRY", "MHSA", "WindowAttention", "window_partition",
    "window_reverse", "DFL", "autopad", "Conv",
]
