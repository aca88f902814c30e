import jax.numpy as jnp
import numpy as np
import pytest

from baseband_tasks_tpu import (Concatenate, Stack, CombineStreams,
                                SetAttribute, StreamGenerator)
from baseband_tasks_tpu.utils import Time, units as u

START = Time("2018-01-01T00:00:00.000000000")


def const_stream(value, shape=(400, 2), spf=100, start=START,
                 rate=1 * u.kHz):
    def f(sh):
        n = min(sh.samples_per_frame, sh.shape[0] - sh.tell())
        return jnp.full((n,) + sh.sample_shape, value, jnp.float32)
    return StreamGenerator(f, shape, start, rate,
                           samples_per_frame=spf, dtype=np.float32)


class TestConcatenate:
    def test_basic(self):
        a = const_stream(1.0)
        b = const_stream(2.0)
        cat = Concatenate([a, b])
        assert cat.shape == (400, 4)
        data = np.asarray(cat.read(10))
        np.testing.assert_array_equal(data[:, :2], 1.0)
        np.testing.assert_array_equal(data[:, 2:], 2.0)

    def test_attribute_combination(self):
        a = SetAttribute(const_stream(1.0), frequency=[400., 400.] * u.MHz,
                         sideband=1)
        b = SetAttribute(const_stream(2.0), frequency=[401., 401.] * u.MHz,
                         sideband=1)
        cat = Concatenate([a, b])
        np.testing.assert_allclose(cat.frequency.to_value(u.MHz),
                                   [400, 400, 401, 401])

    def test_misaligned_starts(self):
        a = const_stream(1.0)
        b = const_stream(2.0, start=START + 100 * u.ms)
        cat = Concatenate([a, b])
        # overlap: [START+0.1s, START+0.4s)
        assert cat.shape == (300, 4)
        assert abs((cat.start_time - (START + 100 * u.ms)).sec) < 1e-12

    def test_non_commensurate_raises(self):
        a = const_stream(1.0)
        b = const_stream(2.0, start=START + 0.0003301 * u.s)
        with pytest.raises(ValueError, match="aligned|overlap"):
            Concatenate([a, b])

    def test_rejects_time_axis(self):
        with pytest.raises(ValueError):
            Concatenate([const_stream(1.0), const_stream(2.0)], axis=0)


class TestStack:
    def test_new_axis(self):
        a = const_stream(1.0)
        b = const_stream(2.0)
        st = Stack([a, b])
        assert st.shape == (400, 2, 2)
        data = np.asarray(st.read(5))
        np.testing.assert_array_equal(data[:, 0], 1.0)
        np.testing.assert_array_equal(data[:, 1], 2.0)


class TestCombineStreams:
    def test_custom_combination(self):
        a = const_stream(3.0)
        b = const_stream(2.0)
        diff = CombineStreams([a, b], lambda ds: ds[0] - ds[1])
        data = np.asarray(diff.read(10))
        np.testing.assert_array_equal(data, 1.0)


class TestExtremeOffsetAlignment:
    """Stream alignment must hold exact-rational precision: collapsed
    float64 second*rate arithmetic misjudges day-scale offsets at GHz
    rates by more than the 0.01-sample tolerance."""

    def test_aligned_at_petasample_offset(self):
        from baseband_tasks_tpu.utils.time import TimeDelta
        rate = u.Quantity(1e9, u.Hz)
        n_off = 4_194_304_100_000_000           # ~48 days at 1 GHz
        t2 = START + TimeDelta.from_samples(n_off, 1e9)
        a = const_stream(1.0, shape=(n_off + 400, 2), rate=rate)
        b = const_stream(2.0, shape=(400, 2), start=t2, rate=rate)
        st = Stack([a, b])
        assert st.shape[0] == 400
        out = np.asarray(st.read(10))
        np.testing.assert_array_equal(out[:, 0], 1.0)
        np.testing.assert_array_equal(out[:, 1], 2.0)

    def test_misaligned_rejected(self):
        rate = u.Quantity(1e9, u.Hz)
        t2 = START + u.Quantity(100.0000000005, u.s)  # off by 0.5 sample
        a = const_stream(1.0, shape=(200_000_000_000, 2), rate=rate)
        b = const_stream(2.0, shape=(400, 2), start=t2, rate=rate)
        with pytest.raises(ValueError, match="not aligned"):
            Stack([a, b])
