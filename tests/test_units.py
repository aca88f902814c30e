import numpy as np
import pytest

from baseband_tasks_tpu.utils import units as u


class TestUnitAlgebra:
    def test_basic_scaling(self):
        assert u.MHz.to(u.Hz) == 1e6
        assert u.kHz.to(u.MHz) == 1e-3
        assert u.ms.to(u.s) == 1e-3

    def test_compound(self):
        speed = u.m / u.s
        assert speed.powers == (1, -1, 0, 0)
        assert (u.km / u.ms).to(speed) == 1e6

    def test_power(self):
        assert (u.s ** -1).is_equivalent(u.Hz)
        assert (u.cm ** 3).to(u.m ** 3) == pytest.approx(1e-6)

    def test_dm_unit(self):
        assert u.DM.powers == (-2, 0, 0, 0)
        assert (u.pc / u.cm ** 3).to(u.DM) == pytest.approx(1.0)

    def test_incompatible_raises(self):
        with pytest.raises(u.UnitsError):
            u.Hz.to(u.s)

    def test_angle(self):
        assert u.deg.to(u.cycle) == pytest.approx(1 / 360)
        assert u.rad.to(u.cycle) == pytest.approx(1 / (2 * np.pi))


class TestQuantity:
    def test_create_and_convert(self):
        q = 16 * u.MHz
        assert q.to_value(u.Hz) == 16e6
        assert q.to(u.kHz).value == pytest.approx(16000)

    def test_arithmetic(self):
        a = 2 * u.s
        b = 500 * u.ms
        assert (a + b).to_value(u.s) == pytest.approx(2.5)
        assert (a - b).to_value(u.s) == pytest.approx(1.5)
        assert (a * (2 * u.Hz)).to_value(u.one) == pytest.approx(4.0)
        assert (1 / a).to_value(u.Hz) == pytest.approx(0.5)

    def test_rate_times_time_is_samples(self):
        n = (2 * u.s) * (16 * u.MHz)
        assert float(n) == pytest.approx(32e6)

    def test_comparison(self):
        assert 1 * u.s > 500 * u.ms
        assert 1 * u.kHz == 1000 * u.Hz
        assert (1 * u.s != 1 * u.ms)

    def test_array_values(self):
        q = np.array([1.0, 2.0, 4.0]) * u.GHz
        assert q.shape == (3,)
        np.testing.assert_allclose(q.to_value(u.MHz), [1000, 2000, 4000])
        assert q[1].to_value(u.GHz) == 2.0

    def test_numpy_ufuncs(self):
        q = np.array([1.0, -2.0]) * u.m
        np.testing.assert_allclose(np.abs(q).value, [1, 2])
        r = np.array([4.0]) * u.s
        assert np.sqrt(r * r).to_value(u.s) == pytest.approx([4.0])

    def test_trig_on_angles(self):
        assert np.cos(0.5 * u.cycle) == pytest.approx(-1.0)
        assert np.sin(90 * u.deg) == pytest.approx(1.0)

    def test_mean_min_max(self):
        q = np.array([1.0, 3.0]) * u.us
        assert np.mean(q).to_value(u.us) == pytest.approx(2.0)
        assert np.max(q).to_value(u.us) == 3.0

    def test_where_and_concat(self):
        a = np.array([1.0, 2.0]) * u.s
        b = np.array([3.0, 4.0]) * u.s
        c = np.concatenate([a, b])
        assert c.shape == (4,)
        w = np.where(np.array([True, False]), a, b)
        np.testing.assert_allclose(w.value, [1.0, 4.0])

    def test_dimensionless_to_float(self):
        q = (3 * u.km) / (1500 * u.m)
        assert float(q) == pytest.approx(2.0)
        with pytest.raises(u.UnitsError):
            float(3 * u.km)

    def test_dm_quantity(self):
        dm = 29.7 * u.DM
        assert dm.to_value(u.pc / u.cm ** 3) == pytest.approx(29.7)
