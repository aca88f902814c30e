"""Pre-built flagship pipelines (fused, shardable, benchmarkable)."""

from .wideband import WidebandPulsarPipeline
from .dmsearch import DMTrialSearch
from .runner import StreamRunner

__all__ = ["WidebandPulsarPipeline", "DMTrialSearch", "StreamRunner"]
