"""Secondary-spectrum analysis (beyond the reference, which has no
scintillation tools).  A sinusoidal interference pattern in the dynamic
spectrum must concentrate into the conjugate (fringe rate, delay)
point; axes must carry the physical units."""

import numpy as np
import pytest

from baseband_tasks_tpu.models.scintillation import (SecondarySpectrum,
                                                     secondary_spectrum)
from baseband_tasks_tpu.utils import Time, units as u

T0 = Time("2020-01-01")


def two_ray_dynamic(n_t=64, n_nu=128, kt=5, knu=12, amp=0.5, seed=0):
    """Dynamic spectrum of a two-ray screen: 1 + amp*cos phase pattern
    with kt cycles across the time axis and knu across the band."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_t)[:, None] / n_t
    nu = np.arange(n_nu)[None, :] / n_nu
    d = 1.0 + amp * np.cos(2 * np.pi * (kt * t + knu * nu))
    return (d + 0.01 * rng.standard_normal((n_t, n_nu))
            ).astype(np.float32)


class TestSecondarySpectrum:
    def test_two_ray_concentrates(self):
        n_t, n_nu, kt, knu = 64, 128, 5, 12
        S, ft, fnu = secondary_spectrum(two_ray_dynamic())
        assert S.shape == (n_t, n_nu // 2 + 1)
        S = np.asarray(S)
        i, j = np.unravel_index(S.argmax(), S.shape)
        # fringe-rate axis is fftshifted: the +/- kt pair; delay axis
        # one-sided at knu
        assert abs(abs(ft[i]) - kt / n_t) < 1e-9
        assert abs(fnu[j] - knu / n_nu) < 1e-9
        # concentration: the peak pair dominates the off-peak power
        total = S.sum()
        peak = S[i, j] + S[n_t - i if i else 0, j]
        assert peak / total > 0.8

    def test_detrend_kills_dc(self):
        d = two_ray_dynamic()
        S, ft, fnu = secondary_spectrum(d, detrend=True)
        S = np.asarray(S)
        mid = len(ft) // 2
        assert S[mid, 0] < 1e-2 * S.max()

    def test_physical_axes(self):
        d = two_ray_dynamic()
        S, ft, fnu = secondary_spectrum(
            d, t_step=u.Quantity(10.0, u.s),
            nu_step=u.Quantity(1.0, u.MHz))
        assert ft.unit == u.Hz and fnu.unit == u.s
        # Nyquist of 10-s subints = 0.05 Hz; max delay = 0.5 us
        assert abs(ft[-1].to_value(u.Hz) - (0.5 - 1 / 64) / 10) < 1e-9
        assert abs(fnu[-1].to_value(u.s) - 0.5e-6) < 1e-12

    def test_stream_analyzer(self):
        from baseband_tasks_tpu import StreamGenerator, SetAttribute
        d = two_ray_dynamic(n_t=64)

        gen = SetAttribute(
            StreamGenerator(lambda sh: d[sh.tell():sh.tell() + 16],
                            shape=(64, 128), start_time=T0,
                            sample_rate=u.Quantity(0.1, u.Hz),
                            samples_per_frame=16, dtype=np.float32),
            frequency=(1400 + 0.25 * np.arange(128)) * u.MHz, sideband=1)
        an = SecondarySpectrum(gen, 64)
        S, ft, fnu = an.analyze()
        assert ft.unit == u.Hz and fnu.unit == u.s
        S = np.asarray(S)
        i, j = np.unravel_index(S.argmax(), S.shape)
        assert abs(abs(ft[i].to_value(u.Hz)) - 5 / 64 * 0.1) < 1e-9
        # delay of 12 cycles across 128 x 0.25 MHz = 32 MHz band
        assert abs(fnu[j].to_value(u.s) - 12 / 32e6) < 1e-12

    def test_validation(self):
        with pytest.raises(ValueError, match="time, freq"):
            secondary_spectrum(np.ones(8, np.float32))
        from baseband_tasks_tpu import NoiseGenerator
        sh = NoiseGenerator(shape=(64, 4, 2), start_time=T0,
                            sample_rate=1 * u.Hz, samples_per_frame=8,
                            seed=1, dtype=np.float32)
        with pytest.raises(ValueError, match="sample shape"):
            SecondarySpectrum(sh, 16)
