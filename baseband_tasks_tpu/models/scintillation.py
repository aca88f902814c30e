"""Scintillometry: dynamic spectra and the secondary (delay-Doppler)
spectrum.

Interstellar scintillation imprints an interference pattern on a
pulsar's dynamic spectrum ``D(t, nu)``; its 2-D power spectrum — the
**secondary spectrum** ``S(f_t, f_nu) = |FFT2(D)|^2`` with conjugate
axes fringe rate (Hz, a.k.a. Doppler) and delay (s) — concentrates
that pattern into the famous parabolic arcs whose curvature ``eta``
measures the screen distance/velocity (Stinebring et al. 2001).

A dynamic spectrum is just ``Integrate(Square(Channelize(...)))`` in
this framework; this module adds the analysis step.  All compute is a
single 2-D real FFT + elementwise power on the device — trivially
jittable and big-batch friendly.

Reference scope: baseband-tasks produces dynamic spectra but has no
scintillation analysis; new capability in the same domain.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..utils import units as u

__all__ = ["secondary_spectrum", "SecondarySpectrum"]


@functools.partial(jax.jit, static_argnames=("detrend",))
def _secondary(dyn, detrend=True):
    d = jnp.asarray(dyn, jnp.float32)
    if detrend:
        # remove the mean bandpass and mean light curve: the DC cross
        # would otherwise dominate the whole delay/Doppler origin
        d = d - jnp.mean(d, axis=-2, keepdims=True)
        d = d - jnp.mean(d, axis=-1, keepdims=True)
    f = jnp.fft.rfft2(d, axes=(-2, -1))
    s = f.real ** 2 + f.imag ** 2
    # shift the fringe-rate (time-conjugate) axis to put 0 in the middle
    return jnp.fft.fftshift(s, axes=-2)


def secondary_spectrum(dyn, *, t_step=None, nu_step=None, detrend=True):
    """Secondary spectrum of a dynamic spectrum ``dyn`` (..., t, nu).

    Returns ``(S, fringe_rate, delay)``: the power on the
    (fringe rate, delay) grid (fringe-rate axis fftshifted so 0 sits in
    the middle; delay axis one-sided from the real FFT), plus the two
    axes — in Hz and s when ``t_step``/``nu_step`` are given as
    Quantities (subintegration length and channel bandwidth), else in
    cycles per sample.
    """
    dyn = jnp.asarray(dyn)
    if dyn.ndim < 2:
        raise ValueError("dynamic spectrum needs (..., time, freq)")
    n_t, n_nu = dyn.shape[-2], dyn.shape[-1]
    S = _secondary(dyn, detrend=bool(detrend))
    ft = np.fft.fftshift(np.fft.fftfreq(n_t))
    fnu = np.fft.rfftfreq(n_nu)
    if t_step is not None:
        ft = u.Quantity(ft / t_step.to_value(u.s), u.Hz)
    if nu_step is not None:
        fnu = u.Quantity(fnu / nu_step.to_value(u.Hz), u.s)
    return S, ft, fnu


class SecondarySpectrum:
    """Secondary-spectrum analysis bound to a dynamic-spectrum stream.

    Parameters
    ----------
    ih : stream
        A dynamic-spectrum producer: sample shape ``(n_chan,)`` (e.g.
        ``Integrate(Square(Channelize(...)))``), one spectrum per
        sample.
    n_time : int
        Subintegrations per analyzed block.

    ``analyze(offset=0)`` reads ``n_time`` spectra and returns
    ``(S, fringe_rate, delay)`` with physical axes taken from the
    stream's ``sample_rate`` (subintegration rate) and channel spacing
    (from its ``frequency`` labels when present).
    """

    def __init__(self, ih, n_time):
        if len(ih.sample_shape) != 1:
            raise ValueError("need a (time, chan) dynamic-spectrum "
                             f"stream, got sample shape "
                             f"{tuple(ih.sample_shape)}")
        self.ih = ih
        self.n_time = int(n_time)
        if self.n_time < 2:
            raise ValueError("need at least 2 subintegrations")
        self._t_step = u.Quantity(
            1.0 / ih.sample_rate.to_value(u.Hz), u.s)
        self._nu_step = None
        freq = getattr(ih, "frequency", None)
        if freq is not None and np.ndim(np.asarray(freq.value)) >= 1:
            fv = np.sort(np.asarray(freq.to_value(u.Hz)).ravel())
            df = np.diff(fv)
            if len(df) and np.allclose(df, df[0], rtol=1e-6):
                self._nu_step = u.Quantity(float(df[0]), u.Hz)

    def analyze(self, offset=0, *, detrend=True):
        self.ih.seek(int(offset))
        dyn = jnp.asarray(self.ih.read(self.n_time))
        return secondary_spectrum(dyn, t_step=self._t_step,
                                  nu_step=self._nu_step,
                                  detrend=detrend)
