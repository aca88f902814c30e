"""Pallas four-step FFT engine (registered as 'pallas').

The pluggable-engine slot SURVEY.md §2 L2 prescribes: select with
``fft_maker.set('pallas')`` (context-manageable) and every task built
under it plans transforms through the fastest TPU path for the shape:

* long power-of-two complex transforms (n ≥ 512, ≥ 8 lanes): the
  VMEM-resident four-step Stockham kernels (`ops/fft_pallas.py`);
* anything else falls back to the default engine, which on TPU already
  runs short transforms (n ≤ 256, any length, real or complex) as a
  dense DFT matmul on the MXU (`ops/dft_matmul.py`) and uses jnp.fft
  everywhere else — so 'pallas' is always safe to select globally, on
  any backend.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .base import FFTMakerBase
from .xla import XLAFFTBase

__all__ = ["PallasFFTMaker", "PallasFFTBase"]

_MIN_N = 512
_MIN_LANES = 8


class PallasFFTBase(XLAFFTBase):
    """One planned transform: four-step pallas kernels when the shape
    qualifies, otherwise exactly the default engine (whose TPU-gated
    short-n MXU matmul path is inherited, not duplicated)."""

    @property
    def _use_pallas(self):
        n = self._time_shape[self._axis]
        lanes = int(np.prod(self._time_shape)) // max(n, 1)
        return (self._time_dtype == np.dtype("complex64")
                and n >= _MIN_N and (n & (n - 1)) == 0
                and lanes >= _MIN_LANES)

    def _fft(self, data):
        if self._direction == "forward":
            expected = self._time_dtype
        else:
            expected = self._frequency_dtype
        data = jnp.asarray(data)
        if data.dtype != expected:
            data = data.astype(expected)
        if not self._use_pallas:
            return super()._fft(data)
        from ..ops.fft_pallas import fft_pow2_planes
        x = jnp.moveaxis(data, self._axis, 0)
        batch_shape = x.shape[1:]
        n = x.shape[0]
        x2 = x.reshape(n, -1)
        yr, yi = fft_pow2_planes(jnp.real(x2), jnp.imag(x2),
                                 inverse=self._direction != "forward",
                                 ortho=self._ortho)
        out = jax.lax.complex(yr, yi).reshape((n,) + batch_shape)
        return jnp.moveaxis(out, 0, self._axis)


class PallasFFTMaker(FFTMakerBase):
    """Engine factory for the pallas four-step FFT (registered 'pallas')."""

    _fft_class = PallasFFTBase

    @staticmethod
    def next_fast_len(n):
        """Prefer a power of two (the four-step kernels require it) when
        it costs at most ~12% extra length over the 2/3/5-smooth size;
        otherwise keep the smooth size and let the transform fall back
        to XLA — a pow2 window up to 2x larger loses far more to extra
        memory traffic than the kernel gains (measured: four-step at
        equal size is only ~8% faster than XLA at the (2048, 512) scale,
        and a doubled window halved PFB-inversion throughput)."""
        from .base import next_fast_len as smooth
        s = smooth(n)
        if n > _MIN_N:
            p2 = 1 << (n - 1).bit_length()
            if p2 <= s * 1.125:
                return p2
        return s
