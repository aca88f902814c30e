"""DADA single-file format: header parse, payload layouts, round trips.

Reference analogue: the baseband package's dada module (used by the
reference's UseDADASample mixin, tests/common.py:12-39); conventions
(header keys, (npol, nchan) sample shape, TSAMP in microseconds)
follow the psrdada disk format.
"""

import numpy as np
import pytest

from baseband_tasks_tpu import NoiseGenerator, SetAttribute
from baseband_tasks_tpu.io import dada
from baseband_tasks_tpu.utils import Time, units as u

T0 = Time("2020-01-01T12:34:56.0")


def noise(shape=(4000, 2), seed=7, dtype=np.complex64):
    return NoiseGenerator(shape=shape, start_time=T0,
                          sample_rate=u.Quantity(100, u.kHz),
                          samples_per_frame=1000, seed=seed, dtype=dtype)


class TestRoundTrip:
    def test_complex_float32(self, tmp_path):
        src = noise()
        path = str(tmp_path / "a.dada")
        src.seek(0)
        data = np.asarray(src.read(4000))
        with dada.open(path, "w", template=src) as wh:
            wh.write(data)
        rh = dada.open(path)
        assert rh.shape == (4000, 2)
        assert rh.dtype == np.complex64
        assert abs((rh.start_time - T0).sec) < 1.0  # whole-second header
        assert float(rh.sample_rate.to_value(u.kHz)) == 100.0
        np.testing.assert_allclose(np.asarray(rh.read(4000)), data,
                                   rtol=1e-6, atol=1e-6)
        rh.close()

    def test_int8_payload(self, tmp_path):
        src = noise(seed=9)
        path = str(tmp_path / "b.dada")
        src.seek(0)
        data = np.asarray(src.read(4000)) * 10.0
        with dada.open(path, "w", template=src, nbit=8) as wh:
            wh.write(data)
        rh = dada.open(path)
        hdr = rh.header
        assert hdr["NBIT"] == "8" and hdr["NDIM"] == "2"
        out = np.asarray(rh.read(4000))
        err = np.abs(out - data).max()
        assert err <= 0.5 * np.sqrt(2) + 1e-6  # re+im int8 rounding
        rh.close()

    def test_real_stream(self, tmp_path):
        src = noise(shape=(2000,), dtype=np.float32)
        path = str(tmp_path / "c.dada")
        src.seek(0)
        data = np.asarray(src.read(2000))
        with dada.open(path, "w", template=src) as wh:
            wh.write(data)
        rh = dada.open(path)
        assert rh.dtype == np.float32
        np.testing.assert_allclose(np.asarray(rh.read(2000)), data,
                                   rtol=1e-6, atol=1e-6)
        rh.close()

    def test_frequency_header(self, tmp_path):
        src = SetAttribute(noise(shape=(1000, 4), seed=3),
                           frequency=(1400 + np.arange(4) * 0.1) * u.MHz,
                           sideband=1)
        path = str(tmp_path / "d.dada")
        src.seek(0)
        with dada.open(path, "w", template=src) as wh:
            wh.write(np.asarray(src.read(1000)))
        rh = dada.open(path)
        assert float(rh.header["FREQ"]) == pytest.approx(1400.15)
        assert rh.frequency is not None
        np.testing.assert_allclose(
            np.sort(np.asarray(rh.frequency.to_value(u.MHz)).ravel()),
            1400 + np.arange(4) * 0.1, rtol=1e-9)
        rh.close()


class TestStreamProtocol:
    def test_seek_and_chain(self, tmp_path):
        from baseband_tasks_tpu import Square
        src = noise(seed=11)
        path = str(tmp_path / "e.dada")
        src.seek(0)
        data = np.asarray(src.read(4000))
        with dada.open(path, "w", template=src) as wh:
            wh.write(data)
        rh = dada.open(path, samples_per_frame=512)
        rh.seek(1234)
        np.testing.assert_allclose(np.asarray(rh.read(100)),
                                   data[1234:1334], rtol=1e-6, atol=1e-6)
        sq = Square(rh)
        sq.seek(0)
        out = np.asarray(sq.read(64))
        np.testing.assert_allclose(out, np.abs(data[:64]) ** 2,
                                   rtol=1e-5, atol=1e-5)
        rh.close()

    def test_registry_detection(self, tmp_path):
        from baseband_tasks_tpu import registry
        src = noise(seed=13)
        path = str(tmp_path / "f.dada")
        src.seek(0)
        with dada.open(path, "w", template=src) as wh:
            wh.write(np.asarray(src.read(1000)))
        rh = registry.open(path)
        assert isinstance(rh, dada.DADAStreamReader)
        rh.close()


class TestDadaEdgeCases:
    def test_fractional_start_time_roundtrip(self, tmp_path):
        """Sub-second start times ride in PICOSECONDS (psrdada
        convention) instead of being silently truncated."""
        from baseband_tasks_tpu.io import dada
        from baseband_tasks_tpu import EmptyStreamGenerator
        t0 = Time("2020-01-01T00:00:00.500")
        tmpl = EmptyStreamGenerator((32, 2), t0, 1 * u.MHz,
                                    dtype=np.complex64)
        name = str(tmp_path / "frac.dada")
        with dada.open(name, "w", template=tmpl) as w:
            w.write(np.zeros((32, 2), np.complex64))
        rd = dada.open(name)
        assert abs((rd.start_time - t0).sec) < 1e-9
        rd.close()

    def test_descending_frequency_roundtrip(self, tmp_path):
        from baseband_tasks_tpu.io import dada
        from baseband_tasks_tpu import EmptyStreamGenerator
        chans = np.array([1400.0, 1399.0, 1398.0, 1397.0])
        tmpl = EmptyStreamGenerator(
            (32, 2, 4), Time("2020-01-01"), 1 * u.MHz,
            dtype=np.complex64,
            frequency=u.Quantity(chans, u.MHz), sideband=-1)
        name = str(tmp_path / "neg.dada")
        with dada.open(name, "w", template=tmpl) as w:
            w.write(np.zeros((32, 2, 4), np.complex64))
        rd = dada.open(name)
        f = np.asarray(rd.frequency.to_value(u.MHz))
        np.testing.assert_allclose(f.reshape(-1, 4)[0], chans, atol=1e-9)
        assert np.all(np.asarray(rd.sideband) == -1)
        rd.close()
