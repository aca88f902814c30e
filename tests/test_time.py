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


class TestTimescales:
    """UTC/TAI/TT with the IERS leap-second table (VERDICT round-3
    item 7; the reference gets scale-correct arithmetic from astropy,
    reference base.py:312-377)."""

    def test_delta_at_table(self):
        from baseband_tasks_tpu.utils.time import delta_at
        assert delta_at(41316.0) == 10.0   # clamped before 1972
        assert delta_at(41317.0) == 10.0   # 1972-01-01
        assert delta_at(57753.0) == 36.0   # 2016-12-31
        assert delta_at(57754.0) == 37.0   # 2017-01-01
        assert delta_at(60000.0) == 37.0   # current era
        np.testing.assert_array_equal(
            delta_at(np.array([41317.0, 57754.0])), [10.0, 37.0])

    def test_leap_spanning_duration(self):
        # 2016-12-31T23:59:60 was inserted: two minutes of wall-clock
        # labels around that midnight span 121 SI seconds.
        t1 = Time("2016-12-31T23:59:00")
        t2 = Time("2017-01-01T00:01:00")
        assert (t2 - t1).sec == pytest.approx(121.0, abs=1e-9)
        # and in TAI the same two instants differ by the same amount
        assert (t2.tai - t1.tai).sec == pytest.approx(121.0, abs=1e-9)

    def test_non_spanning_unchanged(self):
        t1 = Time("2020-06-01T00:00:00")
        t2 = Time("2020-06-01T00:02:00")
        assert (t2 - t1).sec == pytest.approx(120.0, abs=1e-9)

    def test_scale_roundtrip_exact(self):
        t = Time("2020-01-01T12:34:56.789")
        rt = t.tai.utc
        assert rt.scale == "utc"
        assert (rt - t).sec == 0.0
        rt2 = t.tt.utc
        assert abs((rt2 - t).sec) < 1e-12

    def test_known_offsets(self):
        t = Time("2020-01-01T00:00:00")
        def pair_diff_sec(a, b):
            return ((a.jd1 - b.jd1) + (a.jd2 - b.jd2)) * 86400
        assert pair_diff_sec(t.tai, t) == pytest.approx(37.0, abs=1e-9)
        assert pair_diff_sec(t.tt, t.tai) == pytest.approx(32.184,
                                                           abs=1e-9)
        # tt/tai label formatting reflects the scale offset
        assert t.tai.isot.startswith("2020-01-01T00:00:37")

    def test_add_across_leap(self):
        # 23:59:30 UTC + 60 SI seconds lands on 00:00:29, not 00:00:30
        t = Time("2016-12-31T23:59:30") + u.Quantity(60.0, u.s)
        assert t.isot.startswith("2017-01-01T00:00:29")
        # and round-trips: subtracting the duration returns the start
        back = t - u.Quantity(60.0, u.s)
        assert back.isot.startswith("2016-12-31T23:59:30")

    def test_add_sub_exact_within_era(self):
        t = Time("2020-01-01T00:00:00")
        dt = TimeDelta.from_sec(12345.678901234567)
        assert abs(((t + dt) - t - dt).sec) < 1e-15

    def test_cross_scale_compare(self):
        t = Time("2020-01-01T00:00:00")
        assert t.tai == t and t.tt == t
        assert not (t.tai != t)
        assert hash(t.tai) == hash(t)

    def test_unknown_scale_rejected(self):
        with pytest.raises(ValueError, match="timescale"):
            Time("2020-01-01T00:00:00", scale="tdb")

    def test_scale_propagates(self):
        t = Time(np.array([58000.0, 58001.0]), format="mjd", scale="tai")
        assert t.scale == "tai"
        assert t[0].scale == "tai"
        assert t.reshape((2, 1)).scale == "tai"
        assert (t + u.Quantity(1.0, u.s)).scale == "tai"
        assert Time(t).scale == "tai"


class TestReaderEpochScales:
    """File epochs are scale-tagged at every I/O boundary (VDIF ref
    epoch, polyco TMID = UTC; PSRFITS STT_* per its TIMESYS)."""

    def test_vdif_ref_epoch_utc(self):
        from baseband_tasks_tpu.io.vdif import _ref_epoch_time
        assert _ref_epoch_time(0).scale == "utc"

    def test_polyco_tmid_utc(self):
        import os
        path = "/root/reference/baseband_tasks/tests/data/B1937_polyco.dat"
        if not os.path.exists(path):
            pytest.skip("golden polyco not present")
        from baseband_tasks_tpu.phases.predictor import Polyco
        p = Polyco(path)
        assert p.entries[0].tmid.scale == "utc"

    def test_polyco_label_arithmetic(self):
        """Polyco dt is tempo's raw UTC MJD label difference: building
        the t0=0 polynomial (argument = the MJD itself) is consistent
        with direct evaluation even though MJD 0 sits in a different
        leap era."""
        import os
        path = "/root/reference/baseband_tasks/tests/data/B1937_polyco.dat"
        if not os.path.exists(path):
            pytest.skip("golden polyco not present")
        from baseband_tasks_tpu.phases.predictor import Polyco
        p = Polyco(path)
        tmid = p.entries[0].tmid
        pol = p.polynomial(0, t0=0.0, time_unit=u.day)
        direct = p(tmid, index=0)
        def val(x):
            return float(x.to_value(u.cycle)) if hasattr(x, "to_value") \
                else float(x)
        expected = val(direct.count) + val(direct.frac)
        assert float(pol(tmid.mjd)) == pytest.approx(expected, abs=1e-4)


class TestScaleConstructorConverts:
    """Time(t, scale=...) must CONVERT (astropy semantics), not relabel
    (code-review finding: it silently shifted the instant ~69 s)."""

    def test_convert_not_relabel(self):
        from baseband_tasks_tpu.utils import Time
        t = Time("2020-01-01T00:00:00.0", scale="utc")
        tt = Time(t, scale="tt")
        assert tt.scale == "tt"
        assert tt == t                      # same instant
        np.testing.assert_allclose(tt.jd2 - t.tt.jd2, 0.0, atol=1e-12)
        assert abs((tt.jd1 - t.jd1) + (tt.jd2 - t.jd2)
                   - 69.184 / 86400.0) < 1e-12

    def test_same_scale_copy_unchanged(self):
        from baseband_tasks_tpu.utils import Time
        t = Time("2020-01-01T00:00:00.0", scale="tai")
        t2 = Time(t, scale="tai")
        assert t2.jd1 == t.jd1 and t2.jd2 == t.jd2
