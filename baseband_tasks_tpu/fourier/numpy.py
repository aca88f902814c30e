"""Host numpy FFT engine — for host-side reference computations and tests.

Counterpart of `/root/reference/baseband_tasks/fourier/numpy.py`, with the
same numpy conventions; used to cross-check the XLA engine and for small
host-only transforms (e.g. building filter responses at graph-build time).
"""

from __future__ import annotations

import numpy as np

from .base import FFTBase, FFTMakerBase

__all__ = ["NumpyFFTMaker", "NumpyFFTBase"]


class NumpyFFTBase(FFTBase):
    def _fft(self, data):
        data = np.asarray(data)
        norm = "ortho" if self._ortho else None
        axis = self._axis
        if self._direction == "forward":
            if self.real_input:
                out = np.fft.rfft(data, axis=axis, norm=norm)
            else:
                out = np.fft.fft(data, axis=axis, norm=norm)
            return out.astype(self._frequency_dtype, copy=False)
        else:
            if self.real_input:
                out = np.fft.irfft(data, n=self._time_shape[axis], axis=axis,
                                   norm=norm)
            else:
                out = np.fft.ifft(data, axis=axis, norm=norm)
            return out.astype(self._time_dtype, copy=False)


class NumpyFFTMaker(FFTMakerBase):
    """Engine factory for host FFTs (registered as 'numpy')."""

    _fft_class = NumpyFFTBase
