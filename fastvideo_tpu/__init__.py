"""fastvideo_tpu: TPU-native video generation framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
hao-ai-lab/FastVideo (reference mounted read-only at /root/reference).
Public surface mirrors the reference package root
(/root/reference/fastvideo/__init__.py): VideoGenerator, PipelineConfig,
SamplingParam.
"""

from fastvideo_tpu.configs.pipelines.base import PipelineConfig
from fastvideo_tpu.configs.sample import SamplingParam
from fastvideo_tpu.entrypoints.video_generator import VideoGenerator

__version__ = "0.1.0"

__all__ = ["VideoGenerator", "PipelineConfig", "SamplingParam", "__version__"]
