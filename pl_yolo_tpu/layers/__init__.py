from .blocks import (
    ConvBlock,
    DWConvBlock,
    Focus,
    Bottleneck,
    CSPLayer,
    SPPBottleneck,
    SPPCSPC,
    get_activation,
)
from .schedules import cosine_warmup_schedule

__all__ = [
    "ConvBlock",
    "DWConvBlock",
    "Focus",
    "Bottleneck",
    "CSPLayer",
    "SPPBottleneck",
    "SPPCSPC",
    "get_activation",
    "cosine_warmup_schedule",
]
