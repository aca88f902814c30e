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
