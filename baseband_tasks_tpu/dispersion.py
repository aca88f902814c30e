"""Coherent and incoherent dispersion/dedispersion.

Counterpart of `/root/reference/baseband_tasks/dispersion.py` (``Disperse``
dispersion.py:16, ``Dedisperse`` dispersion.py:149, ``DisperseSamples``/
``DedisperseSamples`` dispersion.py:193,253).

Coherent path (TPU-native): one jitted frame function
fft → multiply-cached-chirp → ifft → static trim, in overlap-save windows
whose total padding equals the dispersion smearing across the band; the
chirp (exp(2πi φ_DM(f) · sideband)) is built once on host in float64 and
cached on device as complex64.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .base import PaddedTaskBase, getattr_if_none
from .dm import DispersionMeasure
from .fourier import fft_maker
from .sampling import ShiftSamples
from .utils import units as u
from .utils.device import device_complex

__all__ = ["Disperse", "Dedisperse", "DisperseSamples", "DedisperseSamples"]


def _pow2_len(n):
    """Round up to a power of two (pallas engine windows)."""
    return 1 << (n - 1).bit_length()


class Disperse(PaddedTaskBase):
    """Coherently disperse a (complex baseband) stream.

    Each spectral component acquires the cold-plasma group delay relative
    to ``reference_frequency`` (which itself stays fixed in time); positive
    DM delays lower frequencies more.

    Parameters
    ----------
    ih : stream
        Input; each sample-shape channel has a carrier ``frequency`` and
        ``sideband`` (from the stream or passed explicitly).
    dm : DispersionMeasure or Quantity
        Dispersion measure (pc/cm³).  Negative values dedisperse.
    reference_frequency : Quantity, optional
        Frequency that stays aligned in time.  Default: midpoint of the
        full band edges (reference dispersion.py:68-77).
    """

    def __init__(self, ih, dm, *, reference_frequency=None,
                 samples_per_frame=None, frequency=None, sideband=None,
                 pad_margin=256, engine="auto"):
        frequency = getattr_if_none(ih, "frequency", frequency)
        sideband = getattr_if_none(ih, "sideband", sideband)
        if not isinstance(dm, u.Quantity):
            dm = DispersionMeasure(dm)
        elif not isinstance(dm, DispersionMeasure):
            dm = DispersionMeasure(dm.to_value(u.DM), u.DM)
        self._dm = dm
        # engine: 'xla' (jnp.fft overlap-save), 'pallas' (fused four-step
        # VMEM-resident kernels, power-of-two windows), or 'auto' (pallas
        # on TPU for complex data filling >= 8 of the 128 lanes).
        if engine == "auto":
            lanes = int(np.prod(ih.sample_shape)) if ih.sample_shape else 1
            engine = "pallas" if (jax.default_backend() == "tpu"
                                  and ih.dtype.kind == "c"
                                  and lanes >= 8) else "xla"
        if engine == "pallas" and ih.dtype.kind != "c":
            raise ValueError("the pallas dedispersion engine requires "
                             "complex data")
        self.engine = engine

        sample_shape = ih.sample_shape if ih.sample_shape else (1,)
        freq = u.Quantity(np.broadcast_to(
            np.asarray(frequency.value, dtype=np.float64), sample_shape),
            frequency.unit)
        sb = np.broadcast_to(np.asarray(sideband), sample_shape)
        rate = ih.sample_rate

        # Band edges per channel (complex data spans ±B/2 around the
        # carrier; real data spans half the rate on the sideband's side;
        # reference dispersion.py:55-61).
        half = 0.5 * rate
        if ih.dtype.kind == "c":
            f_low = freq - half
            f_high = freq + half
        else:
            f_low = freq + np.minimum(sb, 0) * half
            f_high = freq + np.maximum(sb, 0) * half
        edges = np.concatenate([np.ravel(f_low.to_value(u.MHz)),
                                np.ravel(f_high.to_value(u.MHz))])
        if reference_frequency is None:
            # mean of the per-channel band centers (reference :63-64)
            centers = (f_low.to_value(u.MHz)
                       + f_high.to_value(u.MHz)) / 2.0
            reference_frequency = u.Quantity(float(np.mean(centers)),
                                             u.MHz)
        self.reference_frequency = reference_frequency

        # Delay extremes across the whole band set the padding.
        delays = dm.time_delay(u.Quantity(edges, u.MHz),
                               reference_frequency).to_value(u.s)
        rate_hz = rate.to_value(u.Hz)
        d_max = float(np.max(delays)) * rate_hz
        d_min = float(np.min(delays)) * rate_hz
        # Extra discard beyond the nominal smearing: the discrete chirp's
        # impulse response has band-edge (Gibbs) tails of a few hundred
        # samples at ~1e-3..1e-4 amplitude regardless of DM; discarding
        # them keeps overlap-save ghosts below the 60 dB noise floor.
        margin = int(pad_margin)
        pad_start = max(int(np.ceil(d_max)), 0) + margin
        pad_end = max(int(np.ceil(-d_min)), 0) + margin
        self._freq = freq
        self._sb = sb
        self._chirp_cache = None
        self._storage_chirp_cache = None
        if self.engine == "pallas":
            fast_len = _pow2_len
            # The fused kernels need a power-of-two window; additionally
            # rounding the pads up to multiples of the four-step N2 makes
            # the trim boundaries land on whole stage-A rows, which lets
            # downstream fusions (compiled Disperse→Dechannelize) discard
            # the pads inside the last kernel instead of a separate pass.
            from .ops.dedisperse_pallas import split_n
            spf0 = samples_per_frame if samples_per_frame is not None \
                else max(3 * (pad_start + pad_end), 1)
            n_fft = _pow2_len(spf0 + pad_start + pad_end)
            while True:
                n2 = split_n(n_fft)[1]
                p0 = -(-pad_start // n2) * n2
                p1 = -(-pad_end // n2) * n2
                if n_fft - p0 - p1 >= max(spf0, 1):
                    break
                n_fft *= 2
            pad_start, pad_end = p0, p1
            samples_per_frame = n_fft - p0 - p1
        else:
            fast_len = fft_maker.get().next_fast_len
        super().__init__(ih, pad_start=pad_start, pad_end=pad_end,
                         samples_per_frame=samples_per_frame,
                         next_fast_len=fast_len)
        if self.engine == "pallas":
            from .ops.spectral_filter import geometry_ok
            if not geometry_ok(self._padded_samples_per_frame,
                               self._pad_start, self._pad_end):
                # e.g. a short stream clamped the frame below the
                # planned pow2 window; the XLA task is always valid
                self.engine = "xla"


    def _chirp(self):
        """Device chirp exp(2πi φ(f_sky) · sb) over the padded window."""
        n = self._padded_samples_per_frame
        sample_shape = self.ih.sample_shape if self.ih.sample_shape else (1,)
        fft = fft_maker((n,) + sample_shape, self.ih.dtype,
                        axis=0, sample_rate=self.ih.sample_rate)
        # baseband offsets -> sky frequency per (bin, channel...)
        offset = fft.frequency  # Quantity (nfreq, 1, ..)
        f_sky = self._freq + offset * self._sb
        phase = self._dm.phase_delay(f_sky, self.reference_frequency)
        cycles = np.asarray(phase.to_value(u.cycle), dtype=np.float64)
        cycles = cycles - np.round(cycles)
        factor = np.exp(2j * np.pi * cycles * np.asarray(self._sb))
        # keep the host copy too: the pallas path re-permutes it on host,
        # and complex device arrays cannot round-trip on every backend
        self._chirp_host = factor.astype(np.complex64)
        return device_complex(self._chirp_host)

    def _storage_chirp(self):
        from .ops.dedisperse_pallas import permute_to_storage_order, split_n
        n = self._padded_samples_per_frame
        n1, n2 = split_n(n)
        chirp = self._chirp_host  # (n, *sample_shape), host copy
        planes = chirp.reshape(n, -1)
        stor = permute_to_storage_order(planes, n1, n2)
        return (jnp.asarray(np.ascontiguousarray(stor.real.astype(
                    np.float32))),
                jnp.asarray(np.ascontiguousarray(stor.imag.astype(
                    np.float32))))

    def _task_pallas(self, data):
        if self._chirp_cache is None:
            self._chirp_cache = self._chirp()
        if self._storage_chirp_cache is None:
            self._storage_chirp_cache = self._storage_chirp()
        squeeze = data.ndim == 1
        if squeeze:
            data = data[:, None]
        n = data.shape[0]
        sample_shape = data.shape[1:]
        x = jnp.asarray(data).astype(jnp.complex64)
        yr, yi = self._task_pallas_planes(jnp.real(x).reshape(n, -1),
                                          jnp.imag(x).reshape(n, -1))
        out = jax.lax.complex(yr, yi).reshape(
            (self._samples_per_frame,) + sample_shape)
        if squeeze:
            out = out[:, 0]
        return out

    def _task_pallas_planes(self, xr, xi, post=None):
        """Dedisperse padded float32 planes (N, lanes) -> trimmed planes.

        Pads are discarded inside the last kernel (they are multiples of
        the four-step N2 by construction); ``post`` optionally fuses a
        lane-mixing matrix — e.g. a following Dechannelize's inverse-DFT
        (models/compiled.py fusion)."""
        from .ops.spectral_filter import spectral_filter_pow2
        csr, csi = self._storage_chirp_cache
        return spectral_filter_pow2(xr, xi, csr, csi,
                                    pad_start=self._pad_start,
                                    pad_end=self._pad_end, post=post)

    def _task_pallas_stream(self, carry_pair, x_pair, scale=None,
                            post=None):
        """Streaming planes form: overlap-save carry + block planes in,
        trimmed planes out, with the window assembled in VMEM and an
        optional per-iteration scale applied there (no XLA pass touches
        the padded window)."""
        from .ops.spectral_filter import spectral_filter_stream
        if self._chirp_cache is None:
            self._chirp_cache = self._chirp()
        if self._storage_chirp_cache is None:
            self._storage_chirp_cache = self._storage_chirp()
        csr, csi = self._storage_chirp_cache
        return spectral_filter_stream(
            carry_pair[0], carry_pair[1], x_pair[0], x_pair[1], csr, csi,
            pad_start=self._pad_start, pad_end=self._pad_end,
            scale=scale, post=post)

    def task_planes(self, pair):
        """Planes-interchange form for compiled pipelines: padded window
        as (re, im) float32 planes in, trimmed planes out (in-kernel
        trim).  NotImplemented when the pallas geometry does not apply
        (the caller then falls back through ``task``)."""
        xr, xi = pair
        if (self.engine != "pallas" or xi is None
                or xr.shape[0] != self._padded_samples_per_frame):
            return NotImplemented
        shape = xr.shape
        yr, yi = self._task_pallas_planes(xr.reshape(shape[0], -1),
                                          xi.reshape(shape[0], -1))
        out_shape = (self._samples_per_frame,) + shape[1:]
        return yr.reshape(out_shape), yi.reshape(out_shape)

    def task_stream(self, carry_pair, x_pair, scale=None):
        """Streaming planes form: (pad, ...) carry planes + (spf, ...)
        block planes -> trimmed planes, window assembled in VMEM with an
        optional in-kernel scale (see models/compiled.py planes_step)."""
        pad = self._pad_start + self._pad_end
        if (self.engine != "pallas" or carry_pair[0].shape[0] != pad
                or x_pair[0].shape[0] + pad
                != self._padded_samples_per_frame):
            return NotImplemented
        shape = x_pair[0].shape
        yr, yi = self._task_pallas_stream(
            (carry_pair[0].reshape(pad, -1),
             carry_pair[1].reshape(pad, -1)),
            (x_pair[0].reshape(shape[0], -1),
             x_pair[1].reshape(shape[0], -1)), scale=scale)
        out_shape = (self._samples_per_frame,) + shape[1:]
        return yr.reshape(out_shape), yi.reshape(out_shape)

    def task(self, data):
        if self.engine == "pallas" and \
                data.shape[0] == self._padded_samples_per_frame:
            return self._task_pallas(data)
        if self._chirp_cache is None:
            self._chirp_cache = self._chirp()
        squeeze = data.ndim == 1
        if squeeze:
            data = data[:, None]
        n = data.shape[0]
        fft = fft_maker((n,) + data.shape[1:], data.dtype, axis=0,
                        sample_rate=self.ih.sample_rate)
        ft = fft(data)
        ft = ft * self._chirp_cache
        out = fft.inverse()(ft)
        out = out[self._pad_start:self._pad_start + self._samples_per_frame]
        if squeeze:
            out = out[:, 0]
        return out

    @property
    def dm(self):
        return self._dm

    @property
    def dedispersion_measure(self):
        return DispersionMeasure(-self._dm.to_value(u.DM), u.DM)


class Dedisperse(Disperse):
    """Coherently dedisperse: remove the dispersion of ``dm``
    (sign-flip wrapper, reference dispersion.py:182-190)."""

    def __init__(self, ih, dm, *, reference_frequency=None,
                 samples_per_frame=None, frequency=None, sideband=None,
                 pad_margin=256, engine="auto"):
        if not isinstance(dm, u.Quantity):
            dm = DispersionMeasure(dm)
        negated = DispersionMeasure(-dm.to_value(u.DM), u.DM)
        super().__init__(ih, negated,
                         reference_frequency=reference_frequency,
                         samples_per_frame=samples_per_frame,
                         frequency=frequency, sideband=sideband,
                         pad_margin=pad_margin, engine=engine)

    @property
    def dm(self):
        # the reference's Dedisperse.dm returns the *positive* value
        # passed in (dispersion.py:188-190): undo the internal negation
        return DispersionMeasure(-self._dm.to_value(u.DM), u.DM)

    @property
    def dedispersion_measure(self):
        return self._dm


class DisperseSamples(ShiftSamples):
    """Incoherently disperse: shift each channel by its integer-sample
    mid-channel dispersion delay (reference dispersion.py:193-250)."""

    def __init__(self, ih, dm, *, reference_frequency=None,
                 samples_per_frame=None, frequency=None, sideband=None):
        frequency = getattr_if_none(ih, "frequency", frequency)
        sideband = getattr_if_none(ih, "sideband", sideband)
        if not isinstance(dm, DispersionMeasure):
            dm = DispersionMeasure(dm if not isinstance(dm, u.Quantity)
                                   else dm.to_value(u.DM))
        self._dm = dm
        sample_shape = ih.sample_shape if ih.sample_shape else (1,)
        freq = u.Quantity(np.broadcast_to(
            np.asarray(frequency.value, dtype=np.float64), sample_shape),
            frequency.unit)
        if ih.dtype.kind != "c":
            # real data: labels are band edges; delays act at the
            # mid-channel frequency (reference dispersion.py:236-238)
            sb = np.broadcast_to(np.asarray(sideband), sample_shape)
            freq = freq + sb * ih.sample_rate / 2.0
        if reference_frequency is None:
            reference_frequency = u.Quantity(
                float(np.mean(freq.value)), freq.unit)
        self.reference_frequency = reference_frequency
        # Mid-channel delay -> whole-sample shift per channel.
        delay = dm.time_delay(freq, reference_frequency).to_value(u.s)
        shift = np.round(delay * ih.sample_rate.to_value(u.Hz)).astype(int)
        super().__init__(ih, shift, samples_per_frame=samples_per_frame)

    @property
    def dm(self):
        return self._dm


class DedisperseSamples(DisperseSamples):
    """Incoherently dedisperse (sign-flip wrapper, reference
    dispersion.py:253-300)."""

    def __init__(self, ih, dm, *, reference_frequency=None,
                 samples_per_frame=None, frequency=None, sideband=None):
        if not isinstance(dm, u.Quantity):
            dm = DispersionMeasure(dm)
        negated = DispersionMeasure(-dm.to_value(u.DM), u.DM)
        super().__init__(ih, negated,
                         reference_frequency=reference_frequency,
                         samples_per_frame=samples_per_frame,
                         frequency=frequency, sideband=sideband)

    @property
    def dm(self):
        # positive value passed in (reference dispersion.py:298-300)
        return DispersionMeasure(-self._dm.to_value(u.DM), u.DM)

    @property
    def dedispersion_measure(self):
        return self._dm
