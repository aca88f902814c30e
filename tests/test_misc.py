"""Supplementary edge-case tests across subsystems."""

import jax.numpy as jnp
import numpy as np
import pytest

from baseband_tasks_tpu import (NoiseGenerator, SetAttribute, Task,
                                GetSlice, Square)
from baseband_tasks_tpu.fourier import fft_maker, FFT_MAKER_CLASSES
from baseband_tasks_tpu.utils import Time, TimeDelta, units as u

START = Time("2018-01-01T00:00:00.000000000")


def noise(shape=(4096, 2), spf=1024):
    return NoiseGenerator(shape=shape, start_time=START,
                          sample_rate=u.Quantity(1 << 20, u.Hz),
                          samples_per_frame=spf, seed=13)


class TestTimeEdges:
    def test_year_boundary(self):
        t = Time("2019-12-31T23:59:59.999999999")
        t2 = t + 2 * u.ns
        assert t2.isot.startswith("2020-01-01T00:00:00.000000001")

    def test_leap_year_feb29(self):
        t = Time("2020-02-28T23:59:59.5")
        t2 = t + 1 * u.s
        assert t2.isot.startswith("2020-02-29")

    def test_negative_timedelta_comparisons(self):
        dt = TimeDelta.from_sec(-0.5)
        assert dt < TimeDelta.from_sec(0)
        assert abs(dt).sec == pytest.approx(0.5)

    def test_array_time_isot(self):
        t = Time.from_mjd(np.array([58000.0, 58001.5]))
        isot = t.isot
        assert isot.shape == (2,)
        assert isot[1].endswith("12:00:00.000000000")


class TestFourierEdges:
    def test_inverse_of_inverse_equals(self):
        fft = fft_maker((64, 2), np.complex64, axis=0)
        assert fft.inverse().inverse() == fft

    def test_engine_equality(self):
        a = FFT_MAKER_CLASSES["xla"]()
        b = FFT_MAKER_CLASSES["xla"]()
        assert a == b

    def test_repr(self):
        fft = fft_maker((64,), np.float32)
        assert "forward" in repr(fft)
        assert "float32" in repr(fft)


class TestStreamEdges:
    def test_slice_of_slice(self):
        sh = noise()
        inner = GetSlice(sh, slice(1000, 3000))
        outer = inner[500:1500]
        assert outer.shape == (1000, 2)
        a = np.asarray(outer.read(10))
        sh2 = noise()
        sh2.seek(1500)
        b = np.asarray(sh2.read(10))
        np.testing.assert_array_equal(a, b)

    def test_task_after_slice_times(self):
        sh = noise()
        sq = Square(sh[1024:])
        assert abs((sq.start_time - START).sec - 1024 / (1 << 20)) < 1e-12

    def test_read_zero_samples(self):
        sh = noise()
        out = sh.read(0)
        assert out.shape == (0, 2)

    def test_repr_contains_chain(self):
        sq = Square(noise())
        assert "Square" in repr(sq)
        assert "NoiseGenerator" in repr(sq)

    def test_tell_in_units(self):
        sh = noise()
        sh.seek(1 << 19)
        assert sh.tell(u.ms).to_value(u.ms) == pytest.approx(500.0)

    def test_method_task_with_state(self):
        sh = noise()

        def scale_by_rate(self, data):
            return data * 0 + float(self.sample_rate.to_value(u.MHz))

        t = Task(sh, scale_by_rate)
        out = np.asarray(t.read(4))
        np.testing.assert_allclose(out.real, (1 << 20) / 1e6, rtol=1e-6)


class TestQuantityEdges:
    def test_unit_display_named(self):
        assert str(((16 * u.MHz) / 256 / 64).unit) == "MHz"
        assert str((1 / (4 * u.ms)).unit) == "kHz"  # 1/ms matches kHz

    def test_quantity_pow_and_sqrt(self):
        q = (3 * u.s) ** 2
        assert np.sqrt(q).to_value(u.s) == pytest.approx(3.0)

    def test_dm_times_cycle(self):
        from baseband_tasks_tpu.dm import dispersion_delay_constant
        d = dispersion_delay_constant * u.Quantity(10.0, u.DM)
        assert d.unit.is_equivalent(u.s * u.MHz ** 2)
