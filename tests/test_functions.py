import numpy as np
import pytest

from baseband_tasks_tpu import NoiseGenerator, SetAttribute, Square, Power, \
    StreamGenerator
from baseband_tasks_tpu.utils import Time, units as u

START = Time("2018-01-01T00:00:00.000000000")


def noise(shape=(10000, 2), dtype=np.complex64):
    return NoiseGenerator(shape=shape, start_time=START,
                          sample_rate=1 * u.MHz, samples_per_frame=1000,
                          dtype=dtype, seed=11)


class TestSquare:
    def test_complex_power(self):
        sh = noise()
        sq = Square(sh)
        assert sq.dtype == np.float32
        data = np.asarray(sq.read())
        assert np.all(data >= 0)
        assert data.mean() == pytest.approx(2.0, rel=0.05)

    def test_real_square(self):
        sh = noise(dtype=np.float32)
        sq = Square(sh)
        data = np.asarray(sq.read())
        assert data.mean() == pytest.approx(1.0, rel=0.05)

    def test_polarization_doubling(self):
        sh = SetAttribute(noise(), polarization=["X", "Y"])
        sq = Square(sh)
        assert list(sq.polarization) == ["XX", "YY"]


class TestPower:
    def make_tones(self):
        import jax.numpy as jnp

        def tone(sh):
            o = sh.tell()
            n = min(sh.samples_per_frame, sh.shape[0] - o)
            i = jnp.arange(o, o + n)
            # X: unit amplitude, phase 2*pi*f*t; Y: amplitude 2, 90 deg shift
            x = jnp.exp(2j * jnp.pi * 0.05 * i)
            y = 2.0 * jnp.exp(2j * jnp.pi * 0.05 * i + 0.5j * jnp.pi)
            return jnp.stack([x, y], axis=-1).astype(jnp.complex64)

        return StreamGenerator(tone, (1000, 2), START, 1 * u.MHz,
                               samples_per_frame=100, dtype=np.complex64)

    def test_powers_and_cross(self):
        sh = SetAttribute(self.make_tones(), polarization=["X", "Y"])
        pw = Power(sh)
        assert pw.shape == (1000, 4)
        assert list(pw.polarization) == ["XX", "YY", "XY", "YX"]
        data = np.asarray(pw.read())
        np.testing.assert_allclose(data[:, 0], 1.0, rtol=1e-5)
        np.testing.assert_allclose(data[:, 1], 4.0, rtol=1e-5)
        # X Y* = 1*2*exp(-i pi/2) = -2i -> Re=0, Im=-2
        np.testing.assert_allclose(data[:, 2], 0.0, atol=1e-4)
        np.testing.assert_allclose(data[:, 3], -2.0, rtol=1e-5)

    def test_requires_two_pols(self):
        sh = noise()
        with pytest.raises(Exception):
            Power(sh)  # no polarization labels anywhere

    def test_requires_complex(self):
        sh = SetAttribute(noise(dtype=np.float32), polarization=["X", "Y"])
        with pytest.raises(ValueError):
            Power(sh)


class TestPowerAxisDiscovery:
    def test_pol_axis_first(self):
        """Polarization on the first sample axis, channels after."""
        import jax.numpy as jnp

        def tone(sh):
            o = sh.tell()
            n = min(sh.samples_per_frame, sh.shape[0] - o)
            i = jnp.arange(o, o + n)[:, None, None]
            x = jnp.exp(2j * jnp.pi * 0.05 * i)
            data = jnp.concatenate([x, 2 * x], axis=1)  # (n, 2 pol, 1)
            return jnp.broadcast_to(data, (n, 2, 3)).astype(jnp.complex64)

        sh = StreamGenerator(tone, (500, 2, 3), START, 1 * u.MHz,
                             samples_per_frame=100, dtype=np.complex64)
        labeled = SetAttribute(sh, polarization=np.array([["L"], ["R"]]))
        pw = Power(labeled)
        assert pw.shape == (500, 4, 3)
        data = np.asarray(pw.read(10))
        np.testing.assert_allclose(data[:, 0], 1.0, rtol=1e-4)  # |L|^2
        np.testing.assert_allclose(data[:, 1], 4.0, rtol=1e-4)  # |R|^2
        np.testing.assert_allclose(data[:, 2], 2.0, rtol=1e-4)  # Re(LR*)
        np.testing.assert_allclose(data[:, 3], 0.0, atol=1e-3)  # Im(LR*)


class TestPowerMetaValidation:
    """Frequency/sideband consistency across the polarization pair
    (reference test_functions.py:146-183): the two pols of one channel
    must share labels, enforced by broadcast against the output shape."""

    SIDE = np.array([[-1], [1], [-1], [1]])

    def _stream(self, **kw):
        from baseband_tasks_tpu import EmptyStreamGenerator
        return EmptyStreamGenerator((100, 4, 2), START, 1 * u.Hz,
                                    dtype=np.complex64, **kw)

    def test_frequency_mismatch_between_pols(self):
        bad = np.array([[320, 320], [320, 320],
                        [336, 336], [336, 337]]) * u.MHz
        eh = self._stream(frequency=bad, sideband=self.SIDE,
                          polarization=["R", "L"])
        with pytest.raises(ValueError):
            Power(eh)

    def test_sideband_mismatch_between_pols(self):
        freq = np.array([[320.25], [320.25], [336.25], [336.25]]) * u.MHz
        bad_side = np.array([[-1, -1], [1, -1], [-1, -1], [1, 1]])
        eh = self._stream(frequency=freq, sideband=bad_side,
                          polarization=["R", "L"])
        with pytest.raises(ValueError):
            Power(eh)

    def test_consistent_labels_pass_through(self):
        freq = np.array([[320.25], [320.25], [336.25], [336.25]]) * u.MHz
        eh = self._stream(frequency=freq, sideband=self.SIDE,
                          polarization=["R", "L"])
        pw = Power(eh)
        assert pw.shape == (100, 4, 4)
        np.testing.assert_allclose(
            np.broadcast_to(pw.frequency.to_value(u.MHz),
                            (4, 4))[:, 0],
            [320.25, 320.25, 336.25, 336.25])
        assert list(np.asarray(pw.polarization).ravel()) == \
            ["RR", "LL", "RL", "LR"]

    def test_missing_polarization(self):
        eh = self._stream()
        with pytest.raises(Exception):
            Power(eh)
