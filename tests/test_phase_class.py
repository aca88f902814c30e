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
        # falls back to the cycle Quantity, whose exp needs dimensionless
        with pytest.raises((TypeError, u.UnitsError)):
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


class TestAngleUnits:
    """Construction from radian/degree quantities (reference accepts any
    angular unit, phase.py:194)."""

    def test_from_degrees(self):
        assert Phase(u.Quantity(90.0, u.deg)) == Phase(0.25)

    def test_from_radians(self):
        p = Phase(u.Quantity(np.pi, u.rad))
        assert abs((p - Phase(0.5)).cycle.value) < 1e-16

    def test_two_part_mixed_units(self):
        p = Phase(u.Quantity(1.0, u.cycle), u.Quantity(180.0, u.deg))
        assert p == Phase(1.5)

    def test_non_angle_raises(self):
        with pytest.raises(u.UnitsError):
            Phase(u.Quantity(1.0, u.m))


class TestUfuncAddSubtract:
    def test_np_add_phases(self):
        a, b = Phase(1e10, 1e-15), Phase(2.0, 3e-15)
        s = np.add(a, b)
        assert isinstance(s, Phase)
        assert s.count == 1e10 + 2.0
        assert s.fraction == pytest.approx(4e-15, rel=1e-6)

    def test_np_add_quantity(self):
        s = np.add(Phase(5.0), u.Quantity(0.25, u.cycle))
        assert isinstance(s, Phase)
        assert s == Phase(5.25)

    def test_np_add_quantity_first(self):
        s = np.add(u.Quantity(0.25, u.cycle), Phase(5.0))
        assert isinstance(s, Phase)
        assert s == Phase(5.25)

    def test_np_subtract_preserves_precision(self):
        a = Phase(1e10, 1e-15)
        d = np.subtract(a, Phase(1e10))
        assert d.cycle.value == pytest.approx(1e-15, rel=1e-6)

    def test_np_add_degrees(self):
        s = np.add(Phase(1.0), u.Quantity(90.0, u.deg))
        assert s == Phase(1.25)


class TestUfuncComparisons:
    @pytest.mark.parametrize("ufunc,op", [
        (np.equal, "=="), (np.not_equal, "!="), (np.less, "<"),
        (np.less_equal, "<="), (np.greater, ">"),
        (np.greater_equal, ">=")])
    def test_all_comparisons_exact(self, ufunc, op):
        a = Phase(1e8, 1e-13)
        b = Phase(1e8, 2e-13)
        expected = eval(f"1 {op} 2")
        assert bool(ufunc(a, b)) is expected

    def test_comparison_with_quantity(self):
        p = Phase(np.array([0.5, 1.0, 1.5]))
        res = np.less(p, u.Quantity(1.25, u.cycle))
        np.testing.assert_array_equal(res, [True, True, False])

    def test_equality_wrong_units_is_false(self):
        assert (Phase(1.0) == u.Quantity(1.0, u.m)) is False
        assert (Phase(1.0) != u.Quantity(1.0, u.m)) is True

    def test_array_comparison(self):
        p = Phase(np.array([1.0, 2.0]), np.array([1e-15, -1e-15]))
        q = Phase(np.array([1.0, 2.0]))
        np.testing.assert_array_equal(p > q, [True, False])
        np.testing.assert_array_equal(p == q, [False, False])


class TestUfuncScalings:
    def test_np_multiply(self):
        m = np.multiply(Phase(1e9, 0.25), 2)
        assert isinstance(m, Phase)
        assert m.count == 2e9 and m.fraction == 0.5

    def test_np_multiply_reversed(self):
        m = np.multiply(2, Phase(1e9, 0.25))
        assert isinstance(m, Phase)
        assert m.count == 2e9

    def test_np_divide(self):
        d = np.divide(Phase(1e9, 0.5), 2)
        assert isinstance(d, Phase)
        assert d.count == 5e8 and d.fraction == 0.25

    def test_multiply_dimensionless_quantity(self):
        m = Phase(3.0) * u.Quantity(2.0, u.one)
        assert isinstance(m, Phase)
        assert m == Phase(6.0)

    def test_multiply_array_factor(self):
        p = Phase(np.array([1.0, 2.0]))
        m = p * np.array([2.0, 3.0])
        assert isinstance(m, Phase)
        np.testing.assert_array_equal(m.count, [2.0, 6.0])

    def test_unitfull_multiplication_decays(self):
        m = Phase(3.5) * u.Quantity(2.0, u.Hz)
        assert isinstance(m, u.Quantity)
        assert m.to_value(u.cycle * u.Hz) == pytest.approx(7.0)

    def test_unitfull_division_decays(self):
        d = Phase(3.0) / u.Quantity(0.5, u.s)
        assert isinstance(d, u.Quantity)
        assert d.to_value(u.cycle / u.s) == pytest.approx(6.0)

    def test_multiply_by_unit(self):
        m = Phase(3.0) * u.one
        assert isinstance(m, Phase)
        assert m == Phase(3.0)

    def test_divide_by_unit_decays(self):
        d = Phase(3.0) / u.s
        assert isinstance(d, u.Quantity)
        assert d.to_value(u.cycle / u.s) == pytest.approx(3.0)


class TestImaginaryScalings:
    """reference test_imaginary_scalings semantics."""

    def test_multiply_by_1j(self):
        m = Phase(2.25) * 1j
        assert isinstance(m, Phase) and m.imaginary
        assert m.count == 2.0 and m.fraction == 0.25

    def test_multiply_by_small_imaginary(self):
        m = Phase(16.0) * 0.125j
        assert m.imaginary
        assert m.count + m.fraction == pytest.approx(2.0)

    def test_divide_by_imaginary(self):
        d = Phase(16.0) / 8j
        assert isinstance(d, Phase) and d.imaginary
        assert d.count + d.fraction == pytest.approx(-2.0)

    def test_divide_imaginary_by_imaginary(self):
        p = Phase.from_angles(0.0, 0.25, imaginary=True)
        d = p / 1j
        assert isinstance(d, Phase) and not d.imaginary
        assert d.cycle.value == pytest.approx(0.25)

    def test_mixed_complex_decays(self):
        m = Phase(2.0) * (1 + 1j)
        assert isinstance(m, u.Quantity)
        assert m.to_value(u.cycle) == pytest.approx(2 + 2j)


class TestUfuncFloorDivMod:
    def test_np_floor_divide(self):
        p = Phase(np.array([2.25, -0.3, 7.5]))
        fd = np.floor_divide(p, u.Quantity(1.0, u.cycle))
        np.testing.assert_array_equal(np.asarray(fd), [2.0, -1.0, 7.0])

    def test_np_mod(self):
        p = Phase(np.array([2.25, -0.3]))
        m = np.mod(p, u.Quantity(1.0, u.cycle))
        assert isinstance(m, Phase)
        np.testing.assert_allclose(
            np.asarray(m.count) + np.asarray(m.fraction), [0.25, 0.7])

    def test_np_divmod(self):
        q, r = np.divmod(Phase(7.5), u.Quantity(2.0, u.cycle))
        assert np.asarray(q) == 3.0
        assert r == Phase(1.5)

    def test_degree_divisor(self):
        fd = np.floor_divide(Phase(2.25), u.Quantity(360.0, u.deg))
        assert np.asarray(fd) == 2.0

    def test_mod_preserves_fraction_precision(self):
        p = Phase(123456789.0, 1e-14)
        r = np.mod(p, u.Quantity(1.0, u.cycle))
        assert r.fraction == pytest.approx(1e-14, rel=1e-6)

    def test_wrong_units_raises(self):
        with pytest.raises(u.UnitsError):
            np.mod(Phase(1.0), u.Quantity(1.0, u.m))


class TestUfuncUnary:
    def test_np_positive(self):
        p = np.positive(Phase(1.5))
        assert isinstance(p, Phase) and p == Phase(1.5)

    def test_np_negative(self):
        assert np.negative(Phase(1.5)) == Phase(-1.5)

    def test_np_absolute_and_fabs(self):
        p = Phase(-2.25)
        assert np.absolute(p) == Phase(2.25)
        assert np.fabs(p) == Phase(2.25)

    def test_np_rint(self):
        r = np.rint(Phase(5.3))
        assert isinstance(r, u.Quantity)
        assert r.to_value(u.cycle) == 5.0

    def test_np_sign(self):
        p = Phase(np.array([2.5, -0.25, 0.0]))
        np.testing.assert_array_equal(np.sign(p), [1.0, -1.0, 0.0])


class TestUfuncFraction:
    @pytest.mark.parametrize("ufunc", [np.sin, np.cos, np.tan])
    def test_trig_uses_fraction_only(self, ufunc):
        # at 1e10 cycles a plain double has lost the angle entirely;
        # the two-part phase has not (reference test_trig)
        d = np.arange(-177.0, 180.0, 10.0)
        expected = ufunc(np.deg2rad(d))
        phase = Phase(1e10, u.Quantity(d, u.deg))
        np.testing.assert_allclose(ufunc(phase), expected,
                                   rtol=1e-13, atol=1e-13)

    def test_spacing(self):
        s = np.spacing(Phase(1e10, 0.25))
        assert isinstance(s, u.Quantity)
        assert s.to_value(u.cycle) == np.spacing(0.25)

    def test_exp_imaginary_precision(self):
        phase = Phase.from_angles(1e10, 0.125, imaginary=True)
        assert np.exp(phase) == pytest.approx(
            np.exp(2j * np.pi * 0.125), abs=1e-13)


class TestNanPropagation:
    def test_isnan(self):
        p = Phase(np.array([1.5, np.nan, 3.0]))
        np.testing.assert_array_equal(np.isnan(p), [False, True, False])

    def test_isfinite_isinf(self):
        p = Phase(np.array([1.5, np.inf]))
        np.testing.assert_array_equal(np.isfinite(p), [True, False])
        np.testing.assert_array_equal(np.isinf(p), [False, True])

    def test_nan_from_arithmetic(self):
        d = Phase(np.nan) - Phase(1.0)
        assert np.isnan(d)

    def test_nan_comparisons_false(self):
        assert not bool(Phase(np.nan) == Phase(np.nan))
        assert not bool(Phase(np.nan) < Phase(1.0))

    def test_sort_nan_last(self):
        p = Phase(np.array([3.0, np.nan, 1.0]))
        s = p.sort()
        assert s[0] == Phase(1.0)
        assert np.isnan(s[2])


class TestLossyFallback:
    def test_minimum_maximum_decay_to_quantity(self):
        a, b = Phase(1.0), Phase(2.0)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        assert isinstance(lo, u.Quantity)
        assert lo.to_value(u.cycle) == 1.0
        assert hi.to_value(u.cycle) == 2.0

    def test_sqrt_unsupported(self):
        with pytest.raises(TypeError):
            np.sqrt(Phase(4.0))


class TestReductionsAndShape:
    def test_ptp(self):
        p = Phase(np.array([2.5, -1.5, 7.25]))
        assert p.ptp() == Phase(8.75)

    def test_ptp_precise(self):
        p = Phase(np.array([1e10, 1e10]), np.array([3e-15, 1e-15]))
        assert p.ptp().cycle.value == pytest.approx(2e-15, rel=1e-6)

    def test_min_max_axis(self):
        p = Phase(np.arange(6.0).reshape(2, 3))
        assert p.min(axis=0).shape == (3,)
        np.testing.assert_array_equal(np.asarray(p.max(axis=1).count),
                                      [2.0, 5.0])

    def test_ptp_axis(self):
        p = Phase(np.arange(6.0).reshape(2, 3))
        res = p.ptp(axis=0)
        np.testing.assert_array_equal(
            np.asarray(res.count) + np.asarray(res.fraction), [3., 3., 3.])

    def test_copy_and_pos(self):
        p = Phase(np.array([1.5]))
        q = p.copy()
        np.asarray(q.count)[0] = 99.0
        assert p == Phase(1.5)
        assert np.positive(p) == Phase(1.5)


class TestFromString:
    def test_basic(self):
        p = Phase.from_string("9876543210.123456789012345")
        assert p.count == 9876543210.0
        assert p.fraction == pytest.approx(0.123456789012345, abs=1e-16)

    def test_positive_exponent(self):
        p = Phase.from_string("1.25e2")
        assert p == Phase(125.0)

    def test_negative_exponent(self):
        p = Phase.from_string("1250e-1")
        assert p == Phase(125.0)

    def test_fortran_exponent(self):
        p = Phase.from_string("1.5d1")
        assert p == Phase(15.0)

    def test_imaginary_suffix(self):
        p = Phase.from_string("2.25j")
        assert p.imaginary
        assert p.count == 2.0 and p.fraction == 0.25

    def test_long_string_beyond_double(self):
        # 0.3333333333333333333333 is not representable; the two parts
        # together must beat a single double's rounding
        p = Phase.from_string("1000000000.3333333333333333333333")
        assert p.count == 1e9
        assert p.fraction == pytest.approx(1.0 / 3.0, abs=1e-16)

    def test_array_input(self):
        p = Phase.from_string(np.array(["1.5", "-2.25"]))
        np.testing.assert_allclose(
            np.asarray(p.count) + np.asarray(p.fraction), [1.5, -2.25])

    def test_non_string_raises(self):
        with pytest.raises(ValueError):
            Phase.from_string(1.5)


class TestFractionalPhase:
    """Reference phase.py:70-103: Longitude-style wrap at +/-0.5 cycle."""

    def test_wrap_range(self):
        import numpy as np
        vals = np.linspace(-3, 3, 61)
        fp = FractionalPhase(vals)
        v = fp.to_value(u.cycle)
        assert (v >= -0.5).all() and (v < 0.5).all()

    def test_half_wraps_negative(self):
        assert FractionalPhase(0.5).to_value(u.cycle) == -0.5
        assert FractionalPhase(-0.5).to_value(u.cycle) == -0.5

    def test_angle_units(self):
        import numpy as np
        assert np.isclose(FractionalPhase(
            np.pi / 2 * u.rad).to_value(u.cycle), 0.25)
        assert np.isclose(FractionalPhase(
            90 * u.deg).to_value(u.cycle), 0.25)

    def test_from_phase_extracts_frac(self):
        fp = FractionalPhase(Phase(12345, 0.125))
        assert fp.to_value(u.cycle) == 0.125

    def test_arithmetic_stays_wrapped(self):
        s = FractionalPhase(0.375) + FractionalPhase(0.25)
        assert isinstance(s, FractionalPhase)
        assert s.to_value(u.cycle) == -0.375
        d = FractionalPhase(-0.375) - FractionalPhase(0.25)
        assert isinstance(d, FractionalPhase)
        assert d.to_value(u.cycle) == 0.375
        n = -FractionalPhase(-0.5)
        assert n.to_value(u.cycle) == -0.5


class TestFloorDivSigns:
    """floor semantics for all sign combinations, incl. exact-zero
    remainders with negative divisors (reference phase.py:696-725)."""

    @pytest.mark.parametrize("a, b", [
        (4, -2), (-4, -2), (4, 2), (-4, 2),
        (7, 2), (-7, 2), (7, -2), (-7, -2), (4.5, -1.5)])
    def test_matches_python_floor(self, a, b):
        q = Phase(a) // Phase(b)
        r = Phase(a) % Phase(b)
        assert float(np.asarray(q)) == a // b
        np.testing.assert_allclose(
            float(r.cycle.to_value(u.cycle)), a - b * (a // b), atol=1e-12)


class TestImaginaryPropagation:
    def test_views_keep_imaginary(self):
        p = Phase(np.array([0.25, 0.5]), imaginary=True)
        assert p.ravel().imaginary
        assert p.reshape((2, 1)).imaginary
        assert p[0:1].imaginary
        assert p.sort().imaginary
        assert p.min().imaginary and p.max().imaginary
        # exp of an imaginary phase stays on the real-exponent path
        np.testing.assert_allclose(np.exp(p.ravel())[0],
                                   np.exp(2j * np.pi * 0.25), rtol=1e-6)


class TestAstype:
    def test_float_sum_precision(self):
        p = Phase(np.array([1e9, 2e9]), np.array([0.25, -0.125]))
        out = p.astype(np.float64)
        np.testing.assert_array_equal(out, [1e9 + 0.25, 2e9 - 0.125])

    def test_structured_lossless(self):
        # two-field structured targets receive the parts separately
        # (ADVICE r2: reference falls back to ndarray.astype for these)
        p = Phase(np.array([1.0, -3.0]), np.array([0.25, -0.125]))
        s = p.astype([("int", "f8"), ("frac", "f8")])
        np.testing.assert_array_equal(s["int"], [1.0, -3.0])
        np.testing.assert_array_equal(s["frac"], [0.25, -0.125])

    def test_bad_casting_and_fields(self):
        p = Phase(1.0)
        with pytest.raises(TypeError, match="casting"):
            p.astype(np.float64, casting="safe")
        with pytest.raises(TypeError, match="two fields"):
            p.astype([("a", "f8"), ("b", "f8"), ("c", "f8")])
