"""TOA extraction by FFT phase-gradient template matching (timing.py).

Closed-form checks: a template shifted by a known (fractional) number
of bins must fit back to that shift; the TOA arithmetic must place the
pulse at the model phase plus the fitted offset with two-double Time
precision.
"""

import numpy as np
import pytest

from baseband_tasks_tpu.timing import ProfileTemplate, fit_phase_shift
from baseband_tasks_tpu.utils import Time, units as u


def gaussian_profile(n, width=0.03, center=0.3, amp=1.0):
    phase = (np.arange(n) + 0.5) / n
    d = (phase - center + 0.5) % 1.0 - 0.5
    return amp * np.exp(-0.5 * (d / width) ** 2)


def shifted(template, shift_bins):
    """Circularly shift by a possibly fractional number of bins via the
    Fourier phase ramp (the exact model the fit assumes)."""
    n = template.size
    k = np.fft.rfftfreq(n) * n
    ph = np.exp(-2j * np.pi * k * shift_bins / n)
    return np.fft.irfft(np.fft.rfft(template) * ph, n=n)


class TestFitPhaseShift:
    @pytest.mark.parametrize("shift", [0.0, 1.0, -3.0, 2.34567, -7.891,
                                       31.5])
    def test_recovers_exact_shift(self, shift):
        t = gaussian_profile(64)
        p = 3.0 * shifted(t, shift) + 0.7
        got, err, scale, base, snr = fit_phase_shift(p, t)
        wrapped = (shift + 32) % 64 - 32
        assert got == pytest.approx(wrapped, abs=1e-6)
        assert scale == pytest.approx(3.0, rel=1e-6)
        assert base == pytest.approx(0.7, abs=1e-6)

    def test_noise_error_estimate(self):
        """The quoted uncertainty must be calibrated: over many noise
        realizations, the empirical shift scatter matches shift_err
        within ~30%."""
        rng = np.random.default_rng(5)
        t = gaussian_profile(128, width=0.02)
        true = 5.25
        clean = 10.0 * shifted(t, true)
        shifts, errs = [], []
        for _ in range(60):
            p = clean + rng.standard_normal(128) * 0.3
            s, e, *_ = fit_phase_shift(p, t)
            shifts.append(s)
            errs.append(e)
        scatter = np.std(np.asarray(shifts) - true)
        quoted = np.mean(errs)
        assert 0.6 < scatter / quoted < 1.6, (scatter, quoted)
        assert abs(np.mean(shifts) - true) < 3 * quoted / np.sqrt(60)

    def test_snr_scales_with_amplitude(self):
        rng = np.random.default_rng(6)
        t = gaussian_profile(64)
        noise = rng.standard_normal(64) * 0.1
        _, _, _, _, snr_lo = fit_phase_shift(1.0 * t + noise, t)
        _, _, _, _, snr_hi = fit_phase_shift(10.0 * t + noise, t)
        assert snr_hi > 5 * snr_lo

    def test_validation(self):
        with pytest.raises(ValueError, match="equal-length"):
            fit_phase_shift(np.zeros(8), np.zeros(9))
        with pytest.raises(ValueError, match="4 phase bins"):
            fit_phase_shift(np.zeros(2), np.zeros(2))


class TestProfileTemplateTOA:
    def test_toa_closed_form(self):
        """Fold a synthetic pulsar whose phase at the reference time is
        known; the TOA must land where the model phase plus the fitted
        offset crosses an integer."""
        n_bin = 128
        period = u.Quantity(1.0 / 641.0, u.s)
        t0 = Time("2020-01-01T12:00:00.000000000")
        tmpl = gaussian_profile(n_bin)
        # the observed profile is the template shifted by dphi cycles
        dphi = 0.123
        prof = shifted(tmpl, dphi * n_bin)
        frac_model = 0.4  # model phase at t0
        template = ProfileTemplate(tmpl)
        toa, toa_err, snr = template.toa(prof, time=t0,
                                         folded_phase=frac_model,
                                         period=period)
        # phase at the TOA should be integer: going back from t0 by
        # (frac_model + dphi) cycles (mod 1, nearest)
        expect_off = ((frac_model + dphi + 0.5) % 1.0 - 0.5) \
            * period.to_value(u.s)
        got_off = float((t0 - toa).sec)
        assert got_off == pytest.approx(expect_off, abs=1e-9)
        assert toa_err.to_value(u.s) < 1e-6
        assert snr > 1e3

    def test_phase_object_accepted(self):
        from baseband_tasks_tpu.phases import Phase
        n_bin = 64
        tmpl = gaussian_profile(n_bin)
        template = ProfileTemplate(tmpl)
        t0 = Time("2020-01-01T00:00:00.0")
        toa1, _, _ = template.toa(
            shifted(tmpl, 0.2 * n_bin), time=t0,
            folded_phase=Phase(12345.0, 0.25),
            period=u.Quantity(1e-3, u.s))
        toa2, _, _ = template.toa(
            shifted(tmpl, 0.2 * n_bin), time=t0,
            folded_phase=0.25, period=u.Quantity(1e-3, u.s))
        assert abs(float((toa1 - toa2).sec)) < 1e-12
