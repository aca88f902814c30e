"""Real-to-complex baseband conversion.

Counterpart of `/root/reference/baseband_tasks/conversion.py`
(``Real2Complex`` conversion.py:10): Hilbert transform to the analytic
signal, downshift by a quarter of the sample rate to centre the band, and
decimate by two; the frequency label moves to the band centre
(conversion.py:64-67).  One fused device computation per frame.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import TaskBase, getattr_if_none

__all__ = ["Real2Complex"]


class Real2Complex(TaskBase):
    """Convert a real baseband stream to complex at half the sample rate."""

    def __init__(self, ih, *, samples_per_frame=None, frequency=None,
                 sideband=None):
        if ih.dtype.kind == "c":
            raise ValueError("Real2Complex requires real-valued input.")
        frequency = getattr_if_none(ih, "frequency", frequency,
                                    required=False)
        sideband = getattr_if_none(ih, "sideband", sideband, required=False)
        if frequency is not None and sideband is not None:
            # real band [f, f + sb*B/2] -> complex label at band centre
            frequency = frequency + np.asarray(sideband) \
                * (ih.sample_rate / 4)
        if samples_per_frame is None:
            spf_in = getattr(ih, "samples_per_frame", 2)
            samples_per_frame = max(spf_in // 2, 1)
        super().__init__(ih, ih_samples_per_frame=2 * samples_per_frame,
                         samples_per_frame=samples_per_frame,
                         sample_rate=ih.sample_rate / 2,
                         dtype=np.complex64, frequency=frequency,
                         sideband=sideband)

    def task(self, data):
        x = data.astype(jnp.float32)
        n = x.shape[0]
        X = jnp.fft.fft(x.astype(jnp.complex64), axis=0)
        k = jnp.arange(n).reshape((-1,) + (1,) * (x.ndim - 1))
        weight = jnp.where(k == 0, 1.0,
                           jnp.where(k < n // 2, 2.0,
                                     jnp.where(k == n // 2, 1.0, 0.0)))
        a = jnp.fft.ifft(X * weight, axis=0)  # analytic signal
        z = a[::2]
        m = jnp.arange(z.shape[0]).reshape((-1,) + (1,) * (x.ndim - 1))
        # downshift by rate/4: e^{-2 pi i (n/4) t} sampled at even t = (-1)^m
        sign = jnp.where(m % 2 == 0, 1.0, -1.0)
        return (z * sign).astype(jnp.complex64)
