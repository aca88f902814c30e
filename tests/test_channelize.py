"""Channelizer tests: implementation must match direct block FFTs
(reference strategy: tests/test_channelize.py 'understanding' tests)."""

import numpy as np
import pytest

from baseband_tasks_tpu import (Channelize, Dechannelize, NoiseGenerator,
                                SetAttribute, StreamGenerator)
from baseband_tasks_tpu.utils import Time, units as u

START = Time("2018-01-01T00:00:00.000000000")


def noise_stream(shape=(4096, 2), rate=1 * u.MHz, dtype=np.complex64,
                 spf=1024, seed=5):
    return NoiseGenerator(shape=shape, start_time=START, sample_rate=rate,
                          samples_per_frame=spf, dtype=dtype, seed=seed)


class TestChannelize:
    def test_matches_direct_fft(self):
        sh = noise_stream()
        raw = np.asarray(sh.read())
        sh.seek(0)
        ct = Channelize(sh, 256)
        assert ct.shape == (16, 256, 2)
        assert ct.sample_rate.to_value(u.kHz) == pytest.approx(1000 / 256)
        data = np.asarray(ct.read())
        expected = np.fft.fft(raw.reshape(16, 256, 2), axis=1)
        np.testing.assert_allclose(data, expected, rtol=1e-4, atol=1e-3)

    def test_real_input(self):
        sh = noise_stream(dtype=np.float32)
        ct = Channelize(sh, 256)
        assert ct.shape == (16, 129, 2)
        data = np.asarray(ct.read(2))
        sh2 = noise_stream(dtype=np.float32)
        raw = np.asarray(sh2.read(512))
        expected = np.fft.rfft(raw.reshape(2, 256, 2), axis=1)
        np.testing.assert_allclose(data, expected, rtol=1e-4, atol=1e-3)

    def test_frequency_labels(self):
        sh = noise_stream()
        labeled = SetAttribute(sh, frequency=[400., 400.] * u.MHz,
                               sideband=np.array([1, -1]))
        ct = Channelize(labeled, 4)
        freq = ct.frequency.to_value(u.MHz)
        # channel offsets: fftfreq(4) * 1 MHz = [0, .25, -.5, -.25]
        np.testing.assert_allclose(freq[:, 0], [400, 400.25, 399.5, 399.75])
        np.testing.assert_allclose(freq[:, 1], [400, 399.75, 400.5, 400.25])

    def test_time_and_rate(self):
        sh = noise_stream()
        ct = Channelize(sh, 256)
        assert ct.start_time == sh.start_time
        ct.seek(8)
        assert abs((ct.time - START).sec - 8 * 256 / 1e6) < 1e-12

    def test_partial_trailing_samples(self):
        sh = noise_stream(shape=(1000, 2), spf=1000)
        ct = Channelize(sh, 256)
        # only 3 full spectra fit
        assert ct.shape[0] == 3


class TestDechannelize:
    def test_roundtrip_complex(self):
        sh = noise_stream()
        raw = np.asarray(sh.read())
        sh.seek(0)
        ct = Channelize(sh, 256)
        dt = Dechannelize(ct, 256)
        assert dt.shape == (4096, 2)
        assert dt.sample_rate == sh.sample_rate
        back = np.asarray(dt.read())
        np.testing.assert_allclose(back, raw, rtol=1e-4, atol=1e-3)

    def test_roundtrip_real(self):
        sh = noise_stream(dtype=np.float32)
        raw = np.asarray(sh.read())
        sh.seek(0)
        ct = Channelize(sh, 256)
        dt = Dechannelize(ct, 256, dtype=np.float32)
        back = np.asarray(dt.read())
        assert back.dtype == np.float32
        np.testing.assert_allclose(back, raw, rtol=1e-3, atol=1e-3)

    def test_inverse_builder(self):
        sh = noise_stream()
        ct = Channelize(sh, 128)
        inv = ct.inverse(ct)
        assert isinstance(inv, Dechannelize)
        assert inv.shape == sh.shape

    def test_frequency_passthrough(self):
        sh = noise_stream()
        labeled = SetAttribute(sh, frequency=[400., 400.] * u.MHz,
                               sideband=np.array([1, 1]))
        ct = Channelize(labeled, 8)
        dt = Dechannelize(ct, 8)
        assert dt.frequency.to_value(u.MHz) == pytest.approx(400.0)


class TestDechannelizeFrameSemantics:
    def test_samples_per_frame_counts_output_samples(self):
        """Reference channelize.py:104-107: samples_per_frame is OUTPUT
        time samples (rounded to whole spectra), not input spectra."""
        sh = NoiseGenerator(shape=(8192,), start_time=START,
                            sample_rate=1 * u.MHz, samples_per_frame=1024,
                            seed=31)
        ct = Channelize(sh, 256)
        dt = Dechannelize(ct, samples_per_frame=2048)
        assert dt.samples_per_frame == 2048      # = 8 spectra * 256
        assert dt.shape == (8192,)
        back = np.asarray(dt.read(2048))
        sh.seek(0)
        np.testing.assert_allclose(back, np.asarray(sh.read(2048)),
                                   atol=1e-4)
