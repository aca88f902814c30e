import numpy as np
import pytest

from baseband_tasks_tpu.utils import Time, TimeDelta, units as u


class TestTime:
    def test_mjd_roundtrip(self):
        t = Time.from_mjd(58000.0)
        assert t.mjd == pytest.approx(58000.0, abs=1e-12)

    def test_isot_parse_format(self):
        t = Time("2018-01-01T12:00:00.000000000")
        assert t.isot == "2018-01-01T12:00:00.000000000"
        # J2000 epoch: 2000-01-01T12:00 = JD 2451545.0
        t2 = Time("2000-01-01T12:00:00.0")
        assert t2.jd == pytest.approx(2451545.0)

    def test_isot_random_times(self):
        for iso in ["1999-12-31T23:59:59.500000000",
                    "2020-02-29T00:00:00.000000000",
                    "2010-06-15T07:30:15.123456789"]:
            assert Time(iso).isot == iso

    def test_nanosecond_precision(self):
        t0 = Time.from_mjd(55000.0)
        dt = TimeDelta.from_sec(1e-9)
        t1 = t0 + dt
        diff = (t1 - t0).sec
        assert diff == pytest.approx(1e-9, rel=1e-6)

    def test_subnanosecond_accumulation(self):
        # adding 1 sample at 1 GHz a million times = 1 ms exactly
        t = Time.from_mjd(58000.0)
        step = TimeDelta.from_sec(1e-9)
        t1 = t + step * 1_000_000
        assert (t1 - t).sec == pytest.approx(1e-3, rel=1e-12)

    def test_add_quantity(self):
        t = Time.from_mjd(58000.0)
        t2 = t + 2.5 * u.s
        assert (t2 - t).sec == pytest.approx(2.5)
        t3 = t - 1 * u.ms
        assert (t - t3).sec == pytest.approx(1e-3)

    def test_comparison(self):
        t = Time.from_mjd(58000.0)
        assert t + 1 * u.ns > t
        assert t <= t
        assert (t + 0 * u.s) == t

    def test_array_time(self):
        t = Time.from_mjd(np.array([58000.0, 58001.0]))
        assert t.shape == (2,)
        dt = t[1] - t[0]
        assert dt.sec == pytest.approx(86400.0)

    def test_time_minus_time_precision(self):
        t0 = Time.from_mjd(58000.0)
        t1 = Time.from_mjd(58000.0) + TimeDelta.from_sec(0.125 + 1e-10)
        assert (t1 - t0).sec == pytest.approx(0.125 + 1e-10, rel=1e-13)


class TestTimeDelta:
    def test_sec_pair_exact(self):
        dt = TimeDelta.from_sec(1.0, 1e-12)
        hi, lo = dt.sec_pair
        assert hi + lo == pytest.approx(1.0 + 1e-12, rel=0, abs=1e-15)

    def test_scaling(self):
        dt = TimeDelta.from_sec(2.0)
        assert (dt * 3).sec == pytest.approx(6.0)
        assert (dt / 4).sec == pytest.approx(0.5)
        assert (dt / TimeDelta.from_sec(0.5)) == pytest.approx(4.0)

    def test_to_quantity(self):
        dt = TimeDelta.from_sec(0.25)
        assert dt.to(u.ms).value == pytest.approx(250.0)

    def test_petasample_roundtrip_precision(self):
        """from_samples -> Time add/sub -> sec_pair must hold far below
        one sample even at ~10^15-sample offsets (compensated day<->sec
        scaling; a bare float64 product loses ~0.5 sample here)."""
        from fractions import Fraction
        t0 = Time("2018-01-01T00:00:00.000000000")
        for n, rate in [(4_194_304_100_000_000, 1e9),
                        (10**15 + 3, 1e9), (123456789012345, 2e9)]:
            dt = TimeDelta.from_samples(n, rate)
            hi, lo = ((t0 + dt) - t0).sec_pair
            resid = float(((Fraction(float(hi)) + Fraction(float(lo)))
                           - Fraction(n) / Fraction(rate))
                          * Fraction(rate))
            assert abs(resid) < 1e-9, (n, rate, resid)


class TestDateOnlyStrings:
    """astropy accepts date-only and minute-resolution ISO strings
    (reference tests write Time('2010-01-01')); so do we."""

    def test_date_only(self):
        from baseband_tasks_tpu.utils import Time
        assert Time("2010-01-01").mjd == 55197.0
        assert Time("2010-01-01") == Time("2010-01-01T00:00:00")

    def test_minutes_only(self):
        from baseband_tasks_tpu.utils import Time
        assert Time("2010-01-01T12:30") == Time("2010-01-01T12:30:00")

    def test_garbage_still_rejected(self):
        import pytest
        from baseband_tasks_tpu.utils import Time
        with pytest.raises(ValueError):
            Time("2010-01-01T12")
        with pytest.raises(ValueError):
            Time("2010-01")
