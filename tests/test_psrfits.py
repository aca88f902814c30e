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


class TestSearchMode:
    def make_intensity_stream(self, n=16384, nchan=8, npol=2):
        import jax.numpy as jnp

        def f(sh):
            o = sh.tell()
            m = min(sh.samples_per_frame, sh.shape[0] - o)
            i = jnp.arange(o, o + m, dtype=jnp.float32)[:, None, None]
            base = 10.0 + jnp.sin(2 * jnp.pi * i / 700.0)
            return jnp.broadcast_to(base, (m, nchan, npol)) \
                + 0.1 * jnp.arange(nchan)[None, :, None]

        sh = StreamGenerator(f, (n, nchan, npol), START,
                             u.Quantity(1000.0, u.Hz),
                             samples_per_frame=4096, dtype=np.float32)
        freq = (1400.0 + np.arange(nchan)).reshape(nchan, 1) * u.MHz
        return SetAttribute(sh, frequency=freq, sideband=1)

    def test_write_read_roundtrip(self, tmp_path):
        sh = self.make_intensity_stream()
        data = np.asarray(sh.read())
        path = str(tmp_path / "search.fits")
        with psrfits.open(path, "w", obs_mode="search", template=sh,
                          nsblk=2048, source="SRC") as fw:
            fw.write(data)
        fr = psrfits.open(path)  # auto-detects SEARCH
        from baseband_tasks_tpu.io.psrfits import SearchReader
        assert isinstance(fr, SearchReader)
        assert fr.shape == (16384, 8, 2)
        assert fr.sample_rate.to_value(u.Hz) == pytest.approx(1000.0)
        assert abs((fr.start_time - START).sec) < 1e-6
        np.testing.assert_allclose(fr.frequency.to_value(u.MHz).ravel(),
                                   1400.0 + np.arange(8))
        back = np.asarray(fr.read())
        # 8-bit quantization per row: relative accuracy ~ range/255
        np.testing.assert_allclose(back, data,
                                   atol=np.ptp(data) / 200 + 1e-3)

    def test_seek_by_time(self, tmp_path):
        sh = self.make_intensity_stream()
        data = np.asarray(sh.read())
        path = str(tmp_path / "s2.fits")
        with psrfits.open(path, "w", obs_mode="search", template=sh,
                          nsblk=2048) as fw:
            fw.write(data)
        fr = psrfits.open(path)
        fr.seek(START + 2 * u.s)
        assert fr.tell() == 2000
        piece = np.asarray(fr.read(16))
        np.testing.assert_allclose(piece, data[2000:2016],
                                   atol=np.ptp(data) / 200 + 1e-3)

    def test_single_pol(self, tmp_path):
        import jax.numpy as jnp

        def f(sh):
            m = min(sh.samples_per_frame, sh.shape[0] - sh.tell())
            return jnp.ones((m, 4), jnp.float32) * 7.0

        sh = SetAttribute(
            StreamGenerator(f, (8192, 4), START, u.Quantity(100.0, u.Hz),
                            samples_per_frame=2048, dtype=np.float32),
            frequency=(800.0 + np.arange(4)) * u.MHz, sideband=1)
        path = str(tmp_path / "s3.fits")
        with psrfits.open(path, "w", obs_mode="search", template=sh,
                          nsblk=1024) as fw:
            fw.write(np.asarray(sh.read()))
        fr = psrfits.open(path)
        assert fr.shape == (8192, 4)
        np.testing.assert_allclose(np.asarray(fr.read(10)), 7.0, atol=0.1)

    @pytest.mark.parametrize("nbits,tol", [(4, 1 / 14), (2, 1 / 2.8),
                                           (1, 1.1)])
    def test_low_bit_roundtrip(self, tmp_path, nbits, tol):
        sh = self.make_intensity_stream(n=8192)
        data = np.asarray(sh.read())
        path = str(tmp_path / f"s{nbits}.fits")
        with psrfits.open(path, "w", obs_mode="search", template=sh,
                          nsblk=2048, nbits=nbits) as fw:
            fw.write(data)
        fr = psrfits.open(path)
        assert fr.shape == (8192, 8, 2)
        back = np.asarray(fr.read())
        # quantization noise scales as range / (2^nbits - 1)
        np.testing.assert_allclose(back, data,
                                   atol=np.ptp(data) * tol + 1e-3)


class TestWrittenHeaderAudit:
    """Audit written fold-mode files against the PSRFITS definition's
    required PRIMARY + SUBINT cards (the reference builds its template
    from the spec HTML, psrfits_htm_parser.py:170-183; conventions here
    follow the real PUPPI file in its test data)."""

    REQUIRED_PRIMARY = ["HDRVER", "FITSTYPE", "OBS_MODE", "TELESCOP",
                        "OBSFREQ", "OBSBW", "OBSNCHAN",
                        "STT_IMJD", "STT_SMJD", "STT_OFFS"]
    REQUIRED_SUBINT = ["EPOCHS", "INT_TYPE", "INT_UNIT", "SCALE",
                       "POL_TYPE", "NPOL", "TBIN", "NBIN", "NBIN_PRD",
                       "PHS_OFFS", "NBITS", "ZERO_OFF", "SIGNINT",
                       "NSUBOFFS", "NCHAN", "CHAN_BW", "DM", "RM",
                       "NCHNOFFS", "NSBLK", "NSTOT"]

    def _write_one(self, tmp_path):
        from baseband_tasks_tpu.io import psrfits
        from baseband_tasks_tpu import SetAttribute, EmptyStreamGenerator
        from baseband_tasks_tpu.utils import Time, units as u

        tmpl = SetAttribute(
            EmptyStreamGenerator(shape=(3, 16, 4, 2),
                                 start_time=Time("2020-01-01T00:00:00.0"),
                                 sample_rate=u.Quantity(0.5, u.Hz),
                                 samples_per_frame=1,
                                 dtype=np.float32),
            frequency=(1400 + np.arange(4)[:, None] * 1.5) * u.MHz,
            sideband=1)
        path = str(tmp_path / "audit.fits")
        with psrfits.open(path, "w", template=tmpl, source="J0000+0000",
                          telescope="GBT", dm=13.3) as wh:
            for i in range(3):
                wh.write(np.full((1, 16, 4, 2), float(i + 1), np.float32))
        return path

    def test_required_cards_present(self, tmp_path):
        from baseband_tasks_tpu.io.psrfits import fitsio
        path = self._write_one(tmp_path)
        hdus = fitsio.read_fits(path)
        primary = hdus[0].header
        subint = next(h.header for h in hdus
                      if str(h.header.get("EXTNAME", "")).strip()
                      == "SUBINT")
        missing_p = [k for k in self.REQUIRED_PRIMARY if k not in primary]
        missing_s = [k for k in self.REQUIRED_SUBINT if k not in subint]
        assert not missing_p, f"PRIMARY missing {missing_p}"
        assert not missing_s, f"SUBINT missing {missing_s}"
        assert subint["INT_TYPE"].strip() == "TIME"
        assert subint["INT_UNIT"].strip() == "SEC"
        assert subint["NBIN"] == 16 and subint["NPOL"] == 2
        assert subint["DM"] == 13.3
        assert subint["NSTOT"] == 3

    def test_reader_accepts_audited_file(self, tmp_path):
        from baseband_tasks_tpu.io import psrfits
        path = self._write_one(tmp_path)
        rh = psrfits.open(path)
        out = np.asarray(rh.read(3))
        np.testing.assert_allclose(
            out, np.stack([np.full((16, 4, 2), float(i + 1))
                           for i in range(3)]), rtol=1e-3)
