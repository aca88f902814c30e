import jax.numpy as jnp
import numpy as np
import pytest

from baseband_tasks_tpu import Real2Complex, SetAttribute, StreamGenerator, \
    NoiseGenerator
from baseband_tasks_tpu.utils import Time, units as u

START = Time("2018-01-01T00:00:00.000000000")


class TestReal2Complex:
    def test_real_tone_maps_to_complex_tone(self):
        # real cos at frequency nu (cycles/sample); after conversion the
        # complex stream at half rate carries it at 2*nu - 0.5 cycles/sample
        nu = 0.15

        def tone(sh):
            o = sh.tell()
            n = min(sh.samples_per_frame, sh.shape[0] - o)
            i = jnp.arange(o, o + n, dtype=jnp.float32)
            return jnp.cos(2 * jnp.pi * nu * i)

        sh = StreamGenerator(tone, (4096,), START, 1 * u.MHz,
                             samples_per_frame=4096, dtype=np.float32)
        r2c = Real2Complex(sh)
        assert r2c.dtype == np.complex64
        assert r2c.sample_rate.to_value(u.kHz) == pytest.approx(500)
        assert r2c.shape == (2048,)
        data = np.asarray(r2c.read())
        # ignore edges (FFT-based Hilbert has wrap effects)
        sl = slice(100, -100)
        i = np.arange(2048)[sl]
        expected = np.exp(2j * np.pi * (2 * nu - 0.5) * i)
        np.testing.assert_allclose(data[sl], expected, atol=2e-2)

    def test_power_preserved(self):
        sh = NoiseGenerator(shape=(16384,), start_time=START,
                            sample_rate=1 * u.MHz, samples_per_frame=16384,
                            dtype=np.float32, seed=2)
        r2c = Real2Complex(sh)
        data = np.asarray(r2c.read())
        # analytic signal of unit-variance real noise has |z|^2 mean 2
        assert np.mean(np.abs(data) ** 2) == pytest.approx(2.0, rel=0.05)

    def test_frequency_label_moves_to_center(self):
        sh = SetAttribute(
            NoiseGenerator(shape=(1024,), start_time=START,
                           sample_rate=1 * u.MHz, samples_per_frame=1024,
                           dtype=np.float32, seed=2),
            frequency=400 * u.MHz, sideband=1)
        r2c = Real2Complex(sh)
        assert r2c.frequency.to_value(u.MHz) == pytest.approx(400.25)

    def test_rejects_complex(self):
        sh = NoiseGenerator(shape=(128,), start_time=START,
                            sample_rate=1 * u.MHz, samples_per_frame=128,
                            dtype=np.complex64)
        with pytest.raises(ValueError):
            Real2Complex(sh)
