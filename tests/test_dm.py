"""DispersionMeasure unit handling and the cold-plasma relations
(reference tests/test_dm.py)."""

import numpy as np
import pytest

from baseband_tasks_tpu.dm import (DispersionMeasure,
                                   dispersion_delay_constant)
from baseband_tasks_tpu.utils import units as u

DM_VAL = 29.1168   # B1957+20


class TestDM:
    def test_quantity(self):
        dm = DispersionMeasure(DM_VAL)
        assert dm.unit.is_equivalent(u.DM)
        assert float(dm.to_value(u.DM)) == DM_VAL
        dm2 = DispersionMeasure(DM_VAL, unit=u.DM)
        assert float((dm - dm2).to_value(u.DM)) == 0.0
        with pytest.raises(u.UnitsError):
            DispersionMeasure(DM_VAL * u.s)

    def test_simple_calculation(self):
        """dm=1 at 1 MHz (reference test_dm.py:33-42)."""
        dm = DispersionMeasure(1.0)
        assert float(dm.time_delay(1.0 * u.MHz).to_value(u.s)) \
            == pytest.approx(1.0 / 2.41e-4, rel=1e-13)
        # reference expresses this as (1/2.41e-4) cycle*MHz*s
        # (test_dm.py:38-39); in pure cycles that is 1e6x larger
        phase = dm.phase_delay(1.0 * u.MHz)
        assert float(phase.to_value(u.cycle)) \
            == pytest.approx(1.0e6 / 2.41e-4, rel=1e-13)
        expected = np.exp(1j * phase.to_value(u.rad))
        assert np.isclose(complex(dm.phase_factor(1.0 * u.MHz)),
                          expected, rtol=1e-5)

    def test_array_calculation(self):
        """Random frequencies near a reference (reference
        test_dm.py:44-73), with and without a reference frequency."""
        freqs = np.array([369.66462, 373.56482, 319.541562,
                          297.2516, 321.053234]) * u.MHz
        ref = 321.582761 * u.MHz
        dm = DispersionMeasure(DM_VAL)
        d = dispersion_delay_constant * dm

        expected = (d * (1.0 / freqs ** 2 - 1.0 / ref ** 2)).to(u.s)
        np.testing.assert_allclose(
            dm.time_delay(freqs, ref).to_value(u.s),
            expected.to_value(u.s), rtol=1e-13)
        np.testing.assert_allclose(
            dm.time_delay(freqs).to_value(u.s),
            (d / freqs ** 2).to_value(u.s), rtol=1e-13)

        phase = (d * u.cycle * freqs
                 * (1.0 / ref - 1.0 / freqs) ** 2).to(u.cycle)
        np.testing.assert_allclose(
            dm.phase_delay(freqs, ref).to_value(u.cycle),
            phase.to_value(u.cycle), rtol=1e-13)
        phase_inf = (d * u.cycle / freqs).to(u.cycle)
        np.testing.assert_allclose(
            dm.phase_delay(freqs).to_value(u.cycle),
            phase_inf.to_value(u.cycle), rtol=1e-13)

        np.testing.assert_allclose(
            dm.phase_factor(freqs, ref),
            np.exp(2j * np.pi * phase.to_value(u.cycle)), rtol=1e-5)
        np.testing.assert_allclose(
            dm.phase_factor(freqs),
            np.exp(2j * np.pi * phase_inf.to_value(u.cycle)), rtol=1e-4)
