"""FFT engines: XLA (device, default) and numpy (host)."""

from .base import (FFTBase, FFTMakerBase, fft_maker, FFT_MAKER_CLASSES,
                   next_fast_len)
from .numpy import NumpyFFTMaker, NumpyFFTBase
from .xla import XLAFFTMaker, XLAFFTBase

__all__ = ["FFTBase", "FFTMakerBase", "fft_maker", "FFT_MAKER_CLASSES",
           "next_fast_len", "NumpyFFTMaker", "NumpyFFTBase",
           "XLAFFTMaker", "XLAFFTBase"]
