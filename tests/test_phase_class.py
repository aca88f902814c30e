"""Two-double Phase precision semantics (reference: 707-line
tests/test_phase_class.py; the essential 1e-16-cycle behaviours)."""

import numpy as np
import pytest

from baseband_tasks_tpu.phases import Phase, FractionalPhase
from baseband_tasks_tpu.utils import units as u


class TestConstruction:
    def test_split(self):
        p = Phase(10.25)
        assert p.count == 10.0
        assert p.fraction == 0.25

    def test_two_part_exact(self):
        p = Phase(1e10, 1e-15)
        assert p.count == 1e10
        assert p.fraction == 1e-15

    def test_from_quantity(self):
        p = Phase(u.Quantity(2.5, u.cycle))
        assert p.count == 2.0 or p.count == 3.0
        assert abs((p.count + p.fraction) - 2.5) == 0

    def test_from_angles(self):
        p = Phase.from_angles(5, 0.3)
        assert p.count == 5.0
        assert p.fraction == pytest.approx(0.3, abs=1e-16)

    def test_array(self):
        p = Phase(np.array([1.1, 2.9, -0.4]))
        np.testing.assert_array_equal(p.count, [1, 3, 0])
        np.testing.assert_allclose(p.fraction, [0.1, -0.1, -0.4],
                                   atol=1e-15)


class TestPrecision:
    def test_add_preserves_tiny(self):
        p = Phase(1e10) + Phase(0, 1e-15)
        q = p - Phase(1e10)
        assert q.count + q.fraction == pytest.approx(1e-15, rel=1e-6)

    def test_accumulated_small_steps(self):
        p = Phase(12345678901.0)
        step = Phase(0, 1e-10)
        for _ in range(100):
            p = p + step
        diff = p - Phase(12345678901.0)
        assert diff.cycle.value == pytest.approx(1e-8, rel=1e-10)

    def test_comparison_1e16(self):
        a = Phase(1e8, 1e-13)
        b = Phase(1e8, 2e-13)
        assert b > a
        assert a < b
        assert a != b
        assert a == Phase(1e8, 1e-13)

    def test_mul_precision(self):
        p = Phase(1e9, 0.123456789012345)
        q = p * 3
        diff = q - (p + p + p)
        assert abs(diff.cycle.value) < 1e-9


class TestViews:
    def test_int_frac(self):
        p = Phase(7.3)
        assert p.int.to_value(u.cycle) == 7.0
        assert p.frac.to_value(u.cycle) == pytest.approx(0.3, abs=1e-15)

    def test_cycle_pair(self):
        hi, lo = Phase(3.75).cycle_pair
        assert hi + lo == 3.75

    def test_fractional_phase_wrap(self):
        f = FractionalPhase(u.Quantity(1.75, u.cycle))
        assert f.to_value(u.cycle) == pytest.approx(-0.25)


class TestOps:
    def test_neg_abs(self):
        p = Phase(-2.25)
        assert abs(p) == Phase(2.25)
        assert -p == Phase(2.25)

    def test_divmod(self):
        p = Phase(7.5)
        q, r = divmod(p, Phase(2.0))
        assert q == 3.0
        assert r == Phase(1.5)

    def test_mod_negative(self):
        r = Phase(-0.3) % Phase(1.0)
        assert r.cycle.value == pytest.approx(0.7)

    def test_sorting(self):
        p = Phase(np.array([3.0, 1.0, 2.0]),
                  np.array([1e-14, 0.0, -1e-14]))
        idx = p.argsort()
        np.testing.assert_array_equal(idx, [1, 2, 0])
        s = p.sort()
        assert s[0] == p[1]

    def test_argsort_breaks_ties_by_fraction(self):
        p = Phase(np.array([5.0, 5.0]), np.array([2e-15, 1e-15]))
        np.testing.assert_array_equal(p.argsort(), [1, 0])
        assert p.argmin() == 1
        assert p.argmax() == 0

    def test_min_max(self):
        p = Phase(np.array([2.5, -1.5, 7.25]))
        assert p.min() == Phase(-1.5)
        assert p.max() == Phase(7.25)

    def test_getitem_reshape(self):
        p = Phase(np.arange(6.0))
        assert p[2] == Phase(2.0)
        assert p.reshape((2, 3)).shape == (2, 3)


class TestImaginaryPhase:
    def test_detect_from_complex(self):
        p = Phase(1j * 2.25)
        assert p.imaginary
        assert p.count == 2.0 and p.fraction == 0.25

    def test_mixed_raises(self):
        with pytest.raises(ValueError):
            Phase(1.0 + 1j)
        with pytest.raises(ValueError):
            Phase(1j) + Phase(1.0)

    def test_exp_drops_integer_cycles(self):
        # exp of 1e9 + 0.25 imaginary cycles must equal exp(0.25 cycles)
        big = Phase(1j * 1e9) + Phase(0, 0.25) * 1 if False else \
            Phase.from_angles(1e9, 0.25, imaginary=True)
        val = np.exp(big)
        assert val == pytest.approx(np.exp(2j * np.pi * 0.25), abs=1e-12)

    def test_arithmetic_keeps_flag(self):
        p = Phase(1j * 1.5)
        assert (-p).imaginary
        assert (p * 2).imaginary
        assert (p + Phase(1j * 0.25)).imaginary

    def test_real_exp_not_supported(self):
        with pytest.raises(TypeError):
            np.exp(Phase(1.5))


class TestDecimalStrings:
    def test_parse_lossless(self):
        p = Phase("123456789012.3456789012345678")
        assert p.count == 123456789012.0
        assert p.fraction == pytest.approx(0.3456789012345678, abs=1e-16)

    def test_roundtrip(self):
        p = Phase.from_angles(987654321.0, 0.1234567890123456)
        s = p.to_string()
        q = Phase(s)
        assert abs((q - p).cycle.value) < 1e-15

    def test_negative(self):
        p = Phase("-10.25")
        assert p.cycle.value == pytest.approx(-10.25)
        assert Phase(p.to_string()).cycle.value == pytest.approx(-10.25)

    def test_array_of_strings(self):
        p = Phase(np.array(["1.5", "2.25"]))
        np.testing.assert_allclose(p.cycle.value, [1.5, 2.25])

    def test_str(self):
        assert str(Phase(5.25)).startswith("5.25")
