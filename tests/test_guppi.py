"""GUPPI raw format: block headers, channel-major payloads, overlap.

Reference analogue: the baseband package's guppi module (the reference
tunes its PFB inversion for GUPPI data, pfb.py:170-181); conventions
follow the GUPPI raw disk format (80-char cards + channel-major int8
payload blocks).
"""

import numpy as np
import pytest

from baseband_tasks_tpu import NoiseGenerator, SetAttribute
from baseband_tasks_tpu.io import guppi
from baseband_tasks_tpu.utils import Time, units as u

T0 = Time("2021-06-01T10:00:00.0")


def noise(shape=(8192, 4, 2), seed=5):
    return NoiseGenerator(shape=shape, start_time=T0,
                          sample_rate=u.Quantity(3, u.MHz),
                          samples_per_frame=2048, seed=seed)


class TestRoundTrip:
    def test_write_read(self, tmp_path):
        src = SetAttribute(noise(),
                           frequency=(1500 + np.arange(4)[:, None] * 3)
                           * u.MHz, sideband=1)
        path = str(tmp_path / "a.raw")
        src.seek(0)
        data = np.asarray(src.read(8192)) * 0.2
        with guppi.open(path, "w", template=src,
                        samples_per_block=2048) as wh:
            wh.write(data)
        rh = guppi.open(path)
        assert rh.shape == (8192, 4, 2)
        assert rh.dtype == np.complex64
        assert abs((rh.start_time - T0).sec) < 1e-6
        assert float(rh.sample_rate.to_value(u.MHz)) == pytest.approx(3.0)
        out = np.asarray(rh.read(8192))
        err = np.abs(out / 32.0 - data).max()
        assert err < 0.5 / 32.0 * np.sqrt(2) + 1e-6   # int8 rounding
        rh.close()

    def test_multi_block_seek(self, tmp_path):
        src = noise(seed=6)
        path = str(tmp_path / "b.raw")
        src.seek(0)
        data = np.asarray(src.read(8192)) * 0.2
        with guppi.open(path, "w", template=src,
                        samples_per_block=1024) as wh:
            wh.write(data)
        rh = guppi.open(path)
        assert len(rh._blocks) == 8
        rh.seek(3000)
        out = np.asarray(rh.read(500))
        np.testing.assert_allclose(out / 32.0, data[3000:3500],
                                   atol=0.5 / 32.0 * 1.5)
        rh.close()

    def test_header_cards(self, tmp_path):
        src = noise(seed=7)
        path = str(tmp_path / "c.raw")
        src.seek(0)
        with guppi.open(path, "w", template=src,
                        samples_per_block=4096) as wh:
            wh.write(np.asarray(src.read(8192)) * 0.1)
        rh = guppi.open(path)
        h = rh.header0
        assert h["OBSNCHAN"] == "4" and h["NPOL"] == "4"
        assert int(h["BLOCSIZE"]) == 4096 * 4 * 2 * 2
        rh.close()

    def test_single_pol(self, tmp_path):
        src = noise(shape=(4096, 8), seed=8)
        path = str(tmp_path / "d.raw")
        src.seek(0)
        data = np.asarray(src.read(4096)) * 0.2
        with guppi.open(path, "w", template=src,
                        samples_per_block=2048) as wh:
            wh.write(data)
        rh = guppi.open(path)
        assert rh.shape == (4096, 8)
        out = np.asarray(rh.read(4096))
        assert np.abs(out / 32.0 - data).max() < 0.03
        rh.close()


class TestGuppiEdgeCases:
    def test_overlap_tail_reads_unique_samples(self, tmp_path):
        """The final overlap tail must come from the last block's tail
        rows, not its head (repro: read starting inside the tail)."""
        import builtins
        from baseband_tasks_tpu.io import guppi
        name = str(tmp_path / "ov.raw")
        nchan, npol, ntime, overlap = 2, 1, 8, 3
        step = ntime - overlap
        rng = np.arange(13)  # 13 unique global samples, 2 blocks
        blocks = [rng[0:8], rng[5:13]]

        with builtins.open(name, "wb") as fh:
            for z in blocks:
                cards = {"BLOCSIZE": nchan * ntime * npol * 2,
                         "OBSNCHAN": nchan, "NPOL": 2, "NBITS": 8,
                         "TBIN": "1e-6", "OVERLAP": overlap,
                         "STT_IMJD": 58000, "STT_SMJD": 0}
                text = b"".join(
                    f"{k:<8}= {str(v):<20}".ljust(80).encode()
                    for k, v in cards.items()) + b"END".ljust(80)
                fh.write(text)
                comp = np.zeros((nchan, ntime, 2), np.int8)
                comp[:, :, 0] = z[np.newaxis, :]
                fh.write(comp.tobytes())

        rd = guppi.open(name)
        assert rd.shape[0] == 13
        rd.seek(10)
        got = np.asarray(rd.read(3)).real[:, 0]
        np.testing.assert_array_equal(got, [10, 11, 12])
        rd.seek(0)
        np.testing.assert_array_equal(np.asarray(rd.read()).real[:, 0],
                                      np.arange(13))
        rd.close()

    def test_inline_comments_and_directio_padding(self, tmp_path):
        """FITS inline comments parse; DIRECTIO=1 pads the data segment
        to 512 bytes too (hashpipe convention)."""
        import builtins
        from baseband_tasks_tpu.io import guppi
        name = str(tmp_path / "dio.raw")
        nchan, ntime = 2, 5           # BLOCSIZE 20, not a 512 multiple
        with builtins.open(name, "wb") as fh:
            for k in range(2):
                cards = {"BLOCSIZE": nchan * ntime * 2,
                         "OBSNCHAN": nchan, "NPOL": 2, "NBITS": 8,
                         "TBIN": "1.0E-06 / seconds per sample",
                         "DIRECTIO": 1, "STT_IMJD": 58000}
                text = b"".join(
                    f"{kk:<8}= {str(v):<20}".ljust(80).encode()
                    for kk, v in cards.items()) + b"END".ljust(80)
                fh.write(text)
                fh.write(b"\x00" * ((-len(text)) % 512))
                comp = np.full((nchan, ntime, 2), k + 1, np.int8)
                fh.write(comp.tobytes())
                fh.write(b"\x00" * ((-(nchan * ntime * 2)) % 512))
        rd = guppi.open(name)
        assert rd.sample_rate.to_value(u.Hz) == pytest.approx(1e6)
        data = np.asarray(rd.read()).real[:, 0]
        np.testing.assert_array_equal(data, [1] * 5 + [2] * 5)
        rd.close()

    def test_descending_frequency_roundtrip(self, tmp_path):
        """Negative bandwidth (lower sideband) survives write->read with
        the channel order and spacing intact."""
        from baseband_tasks_tpu.io import guppi
        from baseband_tasks_tpu import EmptyStreamGenerator
        chans = np.array([1400.0, 1399.0, 1398.0, 1397.0])
        tmpl = EmptyStreamGenerator(
            (64, 4, 2), Time("2020-01-01"), 1 * u.MHz,
            dtype=np.complex64,
            frequency=u.Quantity(chans[:, None], u.MHz),
            sideband=-1)
        name = str(tmp_path / "neg.raw")
        with guppi.open(name, "w", template=tmpl,
                        samples_per_block=64) as w:
            w.write(np.zeros((64, 4, 2), np.complex64))
        rd = guppi.open(name)
        f = np.asarray(rd.frequency.to_value(u.MHz)).reshape(4, -1)[:, 0]
        np.testing.assert_allclose(f, chans, atol=1e-9)
        assert np.all(np.asarray(rd.sideband) == -1)
        rd.close()
