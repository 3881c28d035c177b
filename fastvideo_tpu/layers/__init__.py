"""Neural-net layer library (TPU-native analog of reference fastvideo/layers)."""

from fastvideo_tpu.layers.linear import Linear, ColumnParallelLinear, RowParallelLinear
from fastvideo_tpu.layers.norm import (FP32LayerNorm, LayerNormScaleShift,
                                       RMSNorm, ScaleResidual,
                                       ScaleResidualLayerNormScaleShift)
from fastvideo_tpu.layers.mlp import MLP

__all__ = [
    "Linear",
    "ColumnParallelLinear",
    "RowParallelLinear",
    "RMSNorm",
    "FP32LayerNorm",
    "LayerNormScaleShift",
    "ScaleResidual",
    "ScaleResidualLayerNormScaleShift",
    "MLP",
]
