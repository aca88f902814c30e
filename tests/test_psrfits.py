"""PSRFITS fold-mode write/read round-trip tests (reference strategy:
io/psrfits golden-file checks; here self-consistent synthetic profiles)."""

import numpy as np
import pytest

from baseband_tasks_tpu import SetAttribute, StreamGenerator
from baseband_tasks_tpu.io import psrfits
from baseband_tasks_tpu.io.psrfits.fitsio import (Header, read_fits,
                                                  write_fits, HDU)
from baseband_tasks_tpu.utils import Time, units as u

START = Time("2019-03-01T10:30:00.000000000")


def folded_stream(nt=8, nbin=64, nchan=4, npol=2):
    """A fake folded stream: profile with a Gaussian pulse per channel."""
    import jax.numpy as jnp
    phase = np.arange(nbin) / nbin

    def frames(sh):
        o = sh.tell()
        n = min(sh.samples_per_frame, sh.shape[0] - o)
        prof = np.exp(-0.5 * ((phase - 0.3) / 0.05) ** 2)
        data = (prof[None, :, None, None]
                * (1 + 0.1 * np.arange(nchan))[None, None, :, None]
                * (1 + np.arange(npol))[None, None, None, :]
                + np.arange(o, o + n)[:, None, None, None])
        return jnp.asarray(data.astype(np.float32))

    sh = StreamGenerator(frames, (nt, nbin, nchan, npol), START,
                         u.Quantity(0.1, u.Hz),  # 10 s subints
                         samples_per_frame=1, dtype=np.float32)
    freq = (np.arange(nchan) * 1.5625 + 1400.0).reshape(nchan, 1) * u.MHz
    return SetAttribute(sh, frequency=freq, sideband=1,
                        polarization=["AA", "BB"][:npol])


class TestFitsLayer:
    def test_header_roundtrip(self):
        h = Header()
        h.set("SIMPLE", True)
        h.set("BITPIX", 8)
        h.set("NAXIS", 0)
        h.set("OBSFREQ", 1400.123456, "MHz")
        h.set("SRC_NAME", "B1937+21")
        raw = h.to_bytes()
        assert len(raw) % 2880 == 0
        h2 = Header.from_bytes(raw)
        assert h2["SIMPLE"] is True
        assert h2["OBSFREQ"] == pytest.approx(1400.123456)
        assert h2["SRC_NAME"].strip() == "B1937+21"

    def test_file_roundtrip(self, tmp_path):
        path = str(tmp_path / "t.fits")
        h = Header()
        h.set("TESTKEY", 42)
        write_fits(path, [HDU(h, None)])
        hdus = read_fits(path)
        assert hdus[0].header["TESTKEY"] == 42
        assert hdus[0].header["SIMPLE"] is True


class TestPsrfitsRoundtrip:
    def test_write_read(self, tmp_path):
        sh = folded_stream()
        data = np.asarray(sh.read())
        sh.seek(0)
        path = str(tmp_path / "fold.fits")
        with psrfits.open(path, "w", template=sh, source="FAKEPSR",
                          telescope="FAKE") as fw:
            fw.write(data)
        fr = psrfits.open(path)
        assert fr.shape == (8, 64, 4, 2)
        assert fr.source == "FAKEPSR"
        assert fr.telescope == "FAKE"
        assert list(fr.polarization) == ["AA", "BB"]
        np.testing.assert_allclose(
            fr.frequency.to_value(u.MHz).ravel(),
            1400.0 + np.arange(4) * 1.5625)
        # subint rate = 0.1 Hz
        assert fr.sample_rate.to_value(u.Hz) == pytest.approx(0.1)
        back = np.asarray(fr.read())
        # 16-bit quantization: relative accuracy ~1e-4 of the range
        np.testing.assert_allclose(back, data,
                                   atol=2e-4 * np.ptp(data) + 1e-5)

    def test_start_time_subint_centring(self, tmp_path):
        sh = folded_stream()
        data = np.asarray(sh.read())
        sh.seek(0)
        path = str(tmp_path / "fold.fits")
        with psrfits.open(path, "w", template=sh) as fw:
            fw.write(data)
        fr = psrfits.open(path)
        # OFFS_SUB centring should reconstruct the original start time
        assert abs((fr.start_time - START).sec) < 1e-6

    def test_weights_applied(self, tmp_path):
        sh = folded_stream()
        data = np.asarray(sh.read())
        sh.seek(0)
        path = str(tmp_path / "fold.fits")
        with psrfits.open(path, "w", template=sh) as fw:
            fw.write(data)
        # zero out one channel's weight manually and reread
        from baseband_tasks_tpu.io.psrfits.fitsio import read_fits as rf
        fr = psrfits.open(path, weighted=False)
        fr2 = psrfits.open(path, weighted=True)
        a = np.asarray(fr.read(1))
        b = np.asarray(fr2.read(1))
        np.testing.assert_allclose(a, b, rtol=1e-6)  # all weights are 1
