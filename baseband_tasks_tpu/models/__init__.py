"""Pre-built flagship pipelines (fused, shardable, benchmarkable)."""

from .wideband import WidebandPulsarPipeline

__all__ = ["WidebandPulsarPipeline"]
