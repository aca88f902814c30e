"""Pre-built flagship pipelines (fused, shardable, benchmarkable)."""

from .wideband import WidebandPulsarPipeline
from .dmsearch import DMTrialSearch
from .runner import StreamRunner
from .sharded import ShardedPipeline
from .view import CompiledStreamView, compile_stream
from .correlator import CrossMultiply, fx_correlate
from .accelsearch import FourierDomainAccelSearch, accel_template
from .rmsearch import RMSynthesis
from .beamform import BeamformStations, tied_array_beam
from .ffa import FastFoldingSearch, ffa_fold
from .scintillation import SecondarySpectrum, secondary_spectrum

__all__ = ["WidebandPulsarPipeline", "DMTrialSearch", "StreamRunner",
           "ShardedPipeline", "CompiledStreamView", "compile_stream",
           "CrossMultiply", "fx_correlate",
           "FourierDomainAccelSearch", "accel_template",
           "RMSynthesis", "BeamformStations", "tied_array_beam",
           "FastFoldingSearch", "ffa_fold",
           "SecondarySpectrum", "secondary_spectrum"]
