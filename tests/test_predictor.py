"""Polyco parse/evaluate/write tests with synthetic polycos whose phases
are computable in closed form (no golden files copied from the
reference)."""

import numpy as np
import pytest

from baseband_tasks_tpu.phases import Polyco, PolycoPhase, Phase, PintPhase
from baseband_tasks_tpu.utils import Time, units as u

TMID = 58000.0
F0 = 10.0  # Hz
RPHASE_INT = 123456789
RPHASE_FRAC = 0.123456
COEFF = [1.5e-2, 3.0e-4, -2.0e-6, 5.0e-9]

POLYCO_TEXT = (
    f"B1937+21    9-AUG-18  120000.00   {TMID:.11f}"
    "            71.019700              0.000000   0.000\n"
    f"{RPHASE_INT}.{int(RPHASE_FRAC * 1e6):06d}  {F0:.12E}"
    "   ao  1440    4   1400.000\n"
    f"{COEFF[0]:.17E} {COEFF[1]:.17E} {COEFF[2]:.17E}\n"
    f"{COEFF[3]:.17E}\n"
).replace("E+", "D+").replace("E-", "D-")


def expected_phase(mjd):
    dt_min = (mjd - TMID) * 1440.0
    poly = sum(c * dt_min ** k for k, c in enumerate(COEFF))
    return RPHASE_INT + RPHASE_FRAC + 60.0 * F0 * dt_min + poly


class TestPolycoParse:
    def test_basic_fields(self):
        p = Polyco(POLYCO_TEXT)
        assert len(p) == 1
        e = p[0]
        assert e.psr == "B1937+21"
        assert e.f0 == F0
        assert e.ncoeff == 4
        assert e.span == 1440
        assert e.obs == "ao"
        assert e.rphase_int == RPHASE_INT
        assert e.rphase_frac == pytest.approx(RPHASE_FRAC, abs=1e-12)
        np.testing.assert_allclose(e.coeff, COEFF)

    def test_tmid_precision(self):
        p = Polyco(POLYCO_TEXT)
        assert p[0].tmid.mjd == pytest.approx(TMID, abs=1e-10)


class TestPolycoEvaluate:
    def test_phase_matches_closed_form(self):
        p = Polyco(POLYCO_TEXT)
        for offset_min in (0.0, 1.0, -30.0, 300.0):
            t = Time.from_mjd(TMID) + offset_min * u.minute
            ph = p(t)
            assert isinstance(ph, Phase)
            expected = expected_phase(TMID + offset_min / 1440.0)
            assert ph.cycle.value == pytest.approx(expected, rel=1e-12)

    def test_phase_array(self):
        p = Polyco(POLYCO_TEXT)
        t = Time.from_mjd(np.array([TMID, TMID + 0.01]))
        ph = p(t)
        assert ph.shape == (2,)

    def test_frequency_deriv(self):
        p = Polyco(POLYCO_TEXT)
        t = Time.from_mjd(TMID) + 10 * u.minute
        f = p(t, deriv=1)
        dt_min = 10.0
        expected = F0 + sum(k * c * dt_min ** (k - 1)
                            for k, c in enumerate(COEFF) if k) / 60.0
        assert f.to_value(u.Hz) == pytest.approx(expected, rel=1e-12)

    def test_rphase_options(self):
        p = Polyco(POLYCO_TEXT)
        t = Time.from_mjd(TMID)
        full = p(t)
        ignored = p(t, rphase="ignored")
        assert abs((full - ignored).cycle.value
                   - (RPHASE_INT + RPHASE_FRAC)) < 1e-6

    def test_phasepol(self):
        # phasepol returns a numpy Polynomial in the MJD by default
        # (reference predictor.py:264-283)
        p = Polyco(POLYCO_TEXT)
        pol = p.phasepol(rphase="fraction")
        mjd = TMID + 5.0 / 1440.0
        expected = expected_phase(mjd) - RPHASE_INT
        assert pol(mjd) == pytest.approx(expected, rel=1e-9)

    def test_out_of_span_warns(self):
        p = Polyco(POLYCO_TEXT)
        t = Time.from_mjd(TMID + 2.0)  # 2 days out
        with pytest.warns(UserWarning, match="span"):
            p(t)


class TestPolynomialBuilder:
    """Option grid of Polyco.polynomial (reference predictor.py:204-304)."""

    def setup_method(self):
        self.p = Polyco(POLYCO_TEXT)

    def test_default_minutes_since_tmid(self):
        pol = self.p.polynomial(0)
        for dt_min in (0.0, 1.0, -30.0, 123.456):
            mjd = TMID + dt_min / 1440.0
            assert pol(dt_min) == pytest.approx(expected_phase(mjd),
                                                rel=1e-12)

    @pytest.mark.parametrize("rphase,zero", [
        (None, RPHASE_INT + RPHASE_FRAC),
        ("fraction", RPHASE_FRAC),
        ("ignore", 0.0),
        (2.5, 2.5),
    ])
    def test_rphase_options(self, rphase, zero):
        pol = self.p.polynomial(0, rphase=rphase)
        dt_min = 1.0
        base = 60.0 * F0 * dt_min + sum(c * dt_min ** k
                                        for k, c in enumerate(COEFF))
        if isinstance(rphase, float):
            # a float rphase REPLACES the constant coefficient
            # (reference predictor.py:252-255)
            base -= COEFF[0]
        if rphase is None:
            assert pol(dt_min) == pytest.approx(zero + base, rel=1e-12)
        else:
            assert pol(dt_min) == pytest.approx(zero + base, abs=1e-9)

    def test_deriv_frequency(self):
        # d(phase)/dt at TMID in cycles/min is 60*F0 + COEFF[1]; with
        # out_unit=u.s the values come out in Hz
        pol = self.p.polynomial(0, deriv=1, out_unit=u.s)
        assert pol(0.0) == pytest.approx(F0 + COEFF[1] / 60.0, rel=1e-12)

    def test_deriv2(self):
        pol = self.p.polynomial(0, deriv=2, out_unit=u.s)
        assert pol(0.0) == pytest.approx(2 * COEFF[2] / 3600.0, rel=1e-10)

    def test_t0_mjd_domain(self):
        # t0=0, time_unit=day: argument is the MJD itself
        pol = self.p.polynomial(0, t0=0.0, time_unit=u.day)
        mjd = TMID + 0.01
        assert pol(mjd) == pytest.approx(expected_phase(mjd), rel=1e-12)

    def test_t0_time_object(self):
        pol = self.p.polynomial(0, t0=Time.from_mjd(TMID),
                                time_unit=u.s)
        # argument: seconds since TMID
        assert pol(120.0) == pytest.approx(
            expected_phase(TMID + 2.0 / 1440.0), rel=1e-12)

    def test_convert(self):
        # convert() re-expands in the domain variable; anchor at TMID so
        # the expansion is well-conditioned (an MJD-scale domain loses
        # precision to cancellation, in the reference just the same)
        pol = self.p.polynomial(0, rphase="fraction",
                                t0=Time.from_mjd(TMID),
                                time_unit=u.minute, convert=True)
        ref = self.p.polynomial(0, rphase="fraction",
                                t0=Time.from_mjd(TMID),
                                time_unit=u.minute)
        assert pol(7.25) == pytest.approx(ref(7.25), rel=1e-9)

    def test_index_by_mjd(self):
        pol = self.p.polynomial(TMID + 0.1)
        assert pol(0.0) == pytest.approx(expected_phase(TMID), rel=1e-12)

    def test_fpol(self):
        f = self.p.fpol(0)
        mjd = TMID + 3.0 / 1440.0
        dt_min = 3.0
        dphase = (60.0 * F0 + COEFF[1] + 2 * COEFF[2] * dt_min
                  + 3 * COEFF[3] * dt_min ** 2)
        assert f(mjd) == pytest.approx(dphase / 60.0, rel=1e-12)

    def test_matches_call_eval(self):
        # polynomial(0) at dt agrees with the table evaluation __call__
        t = Time.from_mjd(TMID) + 7.0 * u.minute
        pol = self.p.polynomial(0, rphase="fraction")
        ph = self.p(t, rphase="fraction")
        assert pol(7.0) == pytest.approx(
            ph.count + ph.fraction, rel=1e-12)


class TestPolycoRoundtrip:
    def test_write_parse_roundtrip(self, tmp_path):
        p = Polyco(POLYCO_TEXT)
        path = tmp_path / "polyco.dat"
        p.write(str(path))
        p2 = Polyco.read(str(path))
        e, e2 = p[0], p2[0]
        assert e2.psr == e.psr
        assert e2.f0 == pytest.approx(e.f0, rel=1e-12)
        assert e2.rphase_int == e.rphase_int
        assert e2.rphase_frac == pytest.approx(e.rphase_frac, abs=1e-6)
        np.testing.assert_allclose(e2.coeff, e.coeff, rtol=1e-12)
        t = Time.from_mjd(TMID) + 17 * u.minute
        assert abs((p2(t) - p(t)).cycle.value) < 1e-6


class TestMultiEntry:
    def test_searchclosest(self):
        one = Polyco(POLYCO_TEXT)
        e2 = POLYCO_TEXT.replace(f"{TMID:.11f}", f"{TMID + 1:.11f}")
        p = Polyco(POLYCO_TEXT + e2)
        assert len(p) == 2
        assert p.searchclosest(Time.from_mjd(TMID + 0.1)) == 0
        assert p.searchclosest(Time.from_mjd(TMID + 0.9)) == 1


class TestPolycoPhaseProvider:
    def test_callable_and_freq(self):
        pp = PolycoPhase(Polyco(POLYCO_TEXT))
        t = Time.from_mjd(TMID) + 1 * u.minute
        ph = pp(t)
        assert isinstance(ph, Phase)
        f = pp.apparent_spin_freq(t)
        assert f.to_value(u.Hz) == pytest.approx(10.0, rel=1e-3)

    def test_fold_with_polyco(self):
        """End-to-end: fold a pulse train using a matching polyco."""
        import jax.numpy as jnp
        from baseband_tasks_tpu import Fold, StreamGenerator
        # polyco: pure F0=10 Hz, no rphase, no coeffs
        text = ("PSRTEST     9-AUG-18  120000.00   "
                f"{TMID:.11f}            10.0 0.0 0.0\n"
                "0.000000  1.000000000000D+01   ao  1440    1   1400.000\n"
                "0.00000000000000000D+00\n")
        pp = PolycoPhase(Polyco(text))
        start = Time.from_mjd(TMID)
        rate = 1 * u.kHz

        def pulses(sh):
            o = sh.tell()
            m = min(sh.samples_per_frame, sh.shape[0] - o)
            idx = jnp.arange(o, o + m)
            return jnp.where(idx % 100 == 35, 1.0, 0.0).astype(jnp.float32)

        sh = StreamGenerator(pulses, (4000,), start, rate,
                             samples_per_frame=1000, dtype=np.float32)
        fold = Fold(sh, 10, pp, average=False)
        data = fold.read()
        sums = data["data"][0]
        assert sums[3] == pytest.approx(40)
        assert sums.sum() == pytest.approx(40)


class TestPintGating:
    def test_missing_pint_raises_clearly(self):
        with pytest.raises(ImportError, match="pint"):
            PintPhase("fake.par", "ao", 1400 * u.MHz)


class TestScaledTimeEvaluation:
    """Polyco evaluation must convert differently-scaled Times to the
    TMID scale (code-review finding: a TAI Time leaked its 37-s label
    offset straight into DTMIN — 23753 cycles at 642 Hz)."""

    def test_tai_time_equals_utc_time(self):
        import os
        from baseband_tasks_tpu.phases import Polyco
        path = ("/root/reference/baseband_tasks/tests/data/"
                "B1937_polyco.dat")
        if not os.path.exists(path):
            import pytest
            pytest.skip("reference polyco not available")
        pc = Polyco(path)
        t = pc.entries[0].tmid + u.Quantity(17.0, u.s)
        ph_utc = pc(t)
        ph_tai = pc(t.tai)
        assert ph_utc == ph_tai
