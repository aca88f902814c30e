"""Golden-file validation against the reference package's *data* files
(real telescope artifacts, not code): the B1937+21/B1957+20 tempo polycos
and the Arecibo PUPPI fold-mode PSRFITS file with its PSRCHIVE-computed
expectation values.  VERDICT round-1 item 5: self-round-trip tests cannot
catch a bug present in both writer and reader; these pin behavior to
externally produced files.  All tests skip if the reference data is not
on disk.
"""

import os
import warnings

import numpy as np
import pytest

from baseband_tasks_tpu.phases import Polyco
from baseband_tasks_tpu.utils import Time, units as u

REF_DATA = "/root/reference/baseband_tasks/tests/data"
REF_PSRFITS = "/root/reference/baseband_tasks/io/psrfits/tests/data"

B1937 = os.path.join(REF_DATA, "B1937_polyco.dat")
B1957 = os.path.join(REF_DATA, "B1957_polyco.dat")
PUPPI = os.path.join(REF_PSRFITS, "B1855+09.430.PUPPI.11y.x.sum.sm")
PUPPI_NPZ = os.path.join(REF_PSRFITS, "B1855_nano.npz")

needs_b1937 = pytest.mark.skipif(not os.path.exists(B1937),
                                 reason="reference polyco data not present")
needs_b1957 = pytest.mark.skipif(not os.path.exists(B1957),
                                 reason="reference polyco data not present")
needs_puppi = pytest.mark.skipif(
    not (os.path.exists(PUPPI) and os.path.exists(PUPPI_NPZ)),
    reason="reference PSRFITS data not present")


@needs_b1937
class TestB1937Polyco:
    """Real tempo1 polyco (4 one-hour entries around MJD 58245)."""

    @classmethod
    def setup_class(cls):
        cls.polyco = Polyco(B1937)

    def test_structure(self):
        p = self.polyco
        assert len(p) == 4
        for e in p.entries:
            assert e.psr == "B1937+21"
            assert e.ncoeff == 15 and len(e.coeff) == 15
            assert e.span == 60
            assert e.obsfreq == 1440.0
        # entries are spaced exactly one hour
        tm = np.array([e.tmid.mjd for e in p.entries])
        np.testing.assert_allclose(np.diff(tm) * 24, 1.0, rtol=1e-6)

    def test_tempo1_write_roundtrip_byte_exact(self, tmp_path):
        name = str(tmp_path / "polyco.dat")
        self.polyco.to_polyco(name, style="tempo1")
        with open(name) as fh, open(B1937) as ref:
            assert fh.read() == ref.read()

    def test_phase_continuity_across_entries(self):
        """Adjacent polynomial entries must predict consistent absolute
        phase and spin frequency at their shared boundary — the physical
        consistency a synthetic polyco cannot certify."""
        p = self.polyco
        for i in range(3):
            e0, e1 = p.entries[i], p.entries[i + 1]
            tb = Time((e0.tmid.mjd + e1.tmid.mjd) / 2, format="mjd")
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                d = p(tb, index=i) - p(tb, index=i + 1)
                df = (p(tb, index=i, deriv=1)
                      - p(tb, index=i + 1, deriv=1)).to_value(u.Hz)
            assert abs(float(d.count) + float(d.fraction)) < 2e-5
            assert abs(float(df)) < 1e-6

    def test_f0_and_rphase_precision(self):
        """RPHASE (18 significant digits) must survive parse losslessly:
        the two-double split reproduces both parts of the file value."""
        e = self.polyco.entries[0]
        assert e.rphase_int == 162169181660.0
        assert abs(e.rphase_frac - 0.066162) < 1e-12
        assert e.f0 == 641.928233334554

    def test_rphase_fraction_reference(self):
        """rphase='fraction' at TMID returns the fractional part of the
        entry's own RPHASE (reference test_predictor.py semantics)."""
        p = self.polyco
        for i, e in enumerate(p.entries):
            ph = p(e.tmid, index=i, rphase="fraction")
            frac = float(ph.count) + float(ph.fraction)
            assert abs(frac - e.rphase_frac) < 2e-5

    def test_nearest_entry_selection(self):
        p = self.polyco
        t = p.entries[2].tmid + u.Quantity(3.0, u.min)
        assert p.searchclosest(t) == 2


@needs_b1957
class TestB1957Polyco:
    """Real tempo2 polyco (binary pulsar: binphase + forb columns)."""

    @classmethod
    def setup_class(cls):
        cls.polyco = Polyco(B1957)

    def test_binary_columns(self):
        e = self.polyco.entries[0]
        assert e.obs == "ao"
        assert e.binphase == 0.9609
        assert e.forb == 2.618

    def test_tempo2_write_roundtrip_byte_exact(self, tmp_path):
        name = str(tmp_path / "polyco.dat")
        self.polyco.to_polyco(name, style="tempo2")
        with open(name) as fh, open(B1957) as ref:
            assert fh.read() == ref.read()

    def test_reparse_equality(self, tmp_path):
        name = str(tmp_path / "polyco.dat")
        self.polyco.write(name, style="tempo1")
        p2 = Polyco(name)
        for a, b in zip(self.polyco.entries, p2.entries):
            assert a.rphase_int == b.rphase_int
            assert a.rphase_frac == b.rphase_frac
            assert a.f0 == b.f0
            np.testing.assert_array_equal(a.coeff, b.coeff)


@needs_puppi
class TestPUPPIFoldRead:
    """Real Arecibo PUPPI fold-mode file vs its PSRCHIVE-derived npz
    (reference io/psrfits/tests/test_psrfits_read.py expectations)."""

    @classmethod
    def setup_class(cls):
        from baseband_tasks_tpu.io import psrfits
        cls.reader = psrfits.open(PUPPI, weighted=False)
        cls.npz = np.load(PUPPI_NPZ)

    def test_shape_and_meta(self):
        r = self.reader
        assert r.shape == (1, 2048, 1, 1)
        assert r.telescope == "Arecibo"
        assert r.source == "B1855+09"
        freq = r.meta["__attributes__"]["frequency"]
        np.testing.assert_allclose(
            np.asarray(freq.to_value(u.MHz)).ravel(), [433.12399292],
            rtol=1e-9)

    def test_start_time_matches_psrchive(self):
        # psrchive reports the subint mid-time minus half a subint: the
        # stream's start_time (STT_* + OFFS_SUB - TSUBINT/2)
        t = self.reader.start_time.mjd
        assert abs(t - float(self.npz["t"][0])) < 1e-9

    def test_data_matches_psrchive_bit_exact(self):
        """DAT_SCL/DAT_OFFS application must reproduce PSRCHIVE's values
        exactly (identical float32 arithmetic)."""
        self.reader.seek(0)
        d = np.asarray(self.reader.read(1))
        expected = self.npz["data"].reshape(self.reader.shape)
        np.testing.assert_array_equal(d, expected)

    def test_undefined_zero_off_card(self):
        """PUPPI writes ZERO_OFF='*'; the reader must treat it as 0."""
        assert self.reader._zero_off == 0.0

    def test_weighted_read_scales(self):
        from baseband_tasks_tpu.io import psrfits
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            rw = psrfits.open(PUPPI, weighted=True)
        dw = np.asarray(rw.read(1))
        self.reader.seek(0)
        d = np.asarray(self.reader.read(1))
        wts = np.atleast_1d(np.asarray(
            self.reader._subint.data[0]["DAT_WTS"], np.float32))
        np.testing.assert_array_equal(dw, d * wts[0])


GUPPI_COEFFS = os.path.join(REF_DATA,
                            "bGDSP_U1_0032_T12_W095_get_pfb_coeffs.txt")
needs_guppi = pytest.mark.skipif(not os.path.exists(GUPPI_COEFFS),
                                 reason="GUPPI coefficient data not present")


@needs_guppi
class TestGUPPIPFBCoefficients:
    """GUPPI's shipped 12-tap x 64-channel polyphase filter coefficients
    (produced by its own get_pfb_coeffs, stored 8 columns per row) must
    match ``sinc_hamming(12, 64, sinc_scale=0.95)`` — pins the prototype
    filter to a real instrument's table (reference tests/test_pfb.py:27-35).
    """

    def test_matches_shipped_table(self):
        from baseband_tasks_tpu.pfb import sinc_hamming
        table = np.loadtxt(GUPPI_COEFFS).reshape(8, -1).T.reshape(12, 64)
        model = np.asarray(sinc_hamming(12, 64, sinc_scale=0.95))
        assert model.shape == (12, 64)
        # our coefficients are float32; the table is float64 text
        assert np.allclose(model, table, atol=6e-8, rtol=0)

    def test_sc_positional_equivalent(self):
        from baseband_tasks_tpu.pfb import sinc_hamming
        assert np.array_equal(sinc_hamming(4, 32, 0.9),
                              sinc_hamming(4, 32, sinc_scale=0.9))
