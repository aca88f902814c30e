"""Pre-built flagship pipelines (fused, shardable, benchmarkable)."""

from .wideband import WidebandPulsarPipeline
from .dmsearch import DMTrialSearch

__all__ = ["WidebandPulsarPipeline", "DMTrialSearch"]
