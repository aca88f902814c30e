"""Resampling tests with pure complex tones (reference strategy:
tests/test_sampling.py PureTone phase checks)."""

import jax.numpy as jnp
import numpy as np
import pytest

from baseband_tasks_tpu import (ShiftAndResample, Resample, TimeDelay,
                                ShiftSamples, SetAttribute, StreamGenerator)
from baseband_tasks_tpu.utils import Time, units as u

START = Time("2018-01-01T00:00:00.000000000")
RATE = 1 * u.kHz


def pure_tone(nu_cycles_per_sample, shape=(4096, 2), spf=1024):
    """Complex tone exp(2 pi i nu t), nu in cycles/sample."""
    def tone(sh):
        o = sh.tell()
        n = min(sh.samples_per_frame, sh.shape[0] - o)
        # phase computed on host in real float64 (jax x64 is off)
        i = np.arange(o, o + n, dtype=np.float64)
        x = np.exp(2j * np.pi * nu_cycles_per_sample * i).astype(np.complex64)
        return jnp.broadcast_to(jnp.asarray(x)[:, None],
                                (n,) + sh.sample_shape)
    return StreamGenerator(tone, shape, START, RATE, samples_per_frame=spf,
                           dtype=np.complex64)


class TestShiftAndResample:
    @pytest.mark.parametrize("shift", [3.0, 3.75, -2.25])
    def test_tone_phase_shift(self, shift):
        nu = 0.123  # cycles per sample
        sh = pure_tone(nu)
        st = ShiftAndResample(sh, shift, samples_per_frame=1024)
        st.seek(100)
        data = np.asarray(st.read(200))
        # output sample at input-grid index q has value tone(q - shift)
        q = np.arange(100, 300) + st.pad_start
        expected = np.exp(2j * np.pi * nu * (q - shift))
        np.testing.assert_allclose(data[:, 0], expected, atol=2e-3)

    def test_shift_by_quantity(self):
        nu = 0.05
        sh = pure_tone(nu)
        st = ShiftAndResample(sh, 2.5 * u.ms, samples_per_frame=1024)  # 2.5 samples
        st.seek(50)
        data = np.asarray(st.read(50))
        q = np.arange(50, 100) + st.pad_start
        expected = np.exp(2j * np.pi * nu * (q - 2.5))
        np.testing.assert_allclose(data[:, 0], expected, atol=2e-3)

    def test_per_channel_shift(self):
        nu = 0.2
        sh = pure_tone(nu)
        st = ShiftAndResample(sh, [1.5, -0.5], samples_per_frame=1024)
        st.seek(10)
        data = np.asarray(st.read(100))
        q = np.arange(10, 110) + st.pad_start
        np.testing.assert_allclose(data[:, 0],
                                   np.exp(2j * np.pi * nu * (q - 1.5)),
                                   atol=2e-3)
        np.testing.assert_allclose(data[:, 1],
                                   np.exp(2j * np.pi * nu * (q + 0.5)),
                                   atol=2e-3)

    def test_time_labels_consistent(self):
        sh = pure_tone(0.1)
        st = ShiftAndResample(sh, 1.25, samples_per_frame=1024)
        # start time shifted by pad_start samples of the input
        assert abs((st.start_time - START).sec
                   - st.pad_start / 1000.0) < 1e-9

    def test_lo_phase_rotation(self):
        nu = 0.1
        shift = 3.5
        sh = SetAttribute(pure_tone(nu), frequency=[400., 400.] * u.MHz,
                          sideband=1)
        lo = 400 * u.MHz
        st = ShiftAndResample(sh, shift, lo=lo, samples_per_frame=1024)
        st.seek(100)
        data = np.asarray(st.read(50))
        q = np.arange(100, 150) + st.pad_start
        dt = shift / 1000.0
        extra = np.exp(-2j * np.pi * 400e6 * dt)
        expected = np.exp(2j * np.pi * nu * (q - shift)) * extra
        np.testing.assert_allclose(data[:, 0], expected, atol=2e-3)


class TestResample:
    def test_sample_lands_on_offset(self):
        nu = 0.0625
        sh = pure_tone(nu)
        target = START + 100.3 / (1 * u.kHz)
        rt = Resample(sh, target, samples_per_frame=1024)
        # pointer should be at the target time
        assert abs((rt.time - target).sec) < 1e-9
        data = np.asarray(rt.read(1))
        expected = np.exp(2j * np.pi * nu * 100.3)
        np.testing.assert_allclose(data[0, 0], expected, atol=2e-3)

    def test_fractional_sample_offset(self):
        nu = 0.03
        sh = pure_tone(nu)
        # offset must exceed the interpolation pad (64 input samples)
        rt = Resample(sh, 100.5, samples_per_frame=1024)
        data = np.asarray(rt.read(4))
        expected = np.exp(2j * np.pi * nu * (100.5 + np.arange(4)))
        np.testing.assert_allclose(data[:, 0], expected, atol=2e-3)


class TestTimeDelay:
    def test_relabel_and_phase(self):
        nu = 0.11
        sh = SetAttribute(pure_tone(nu), frequency=[400., 400.] * u.MHz,
                          sideband=1)
        delay = 2.5 * u.ms
        td = TimeDelay(sh, delay)
        assert abs((td.start_time - START).sec - 2.5e-3) < 1e-12
        data = np.asarray(td.read(10))
        raw = np.asarray(pure_tone(nu).read(10))
        factor = np.exp(-2j * np.pi * 400e6 * 2.5e-3)
        np.testing.assert_allclose(data, raw * np.complex64(factor),
                                   atol=1e-4)

    def test_requires_complex(self):
        def real_stream(sh):
            return jnp.zeros((sh.samples_per_frame,) + sh.sample_shape,
                             jnp.float32)
        sh = StreamGenerator(real_stream, (100, 2), START, RATE,
                             samples_per_frame=50, dtype=np.float32)
        with pytest.raises(ValueError):
            TimeDelay(sh, 1 * u.ms)


class TestShiftSamples:
    def test_integer_shift(self):
        def counter(sh):
            o = sh.tell()
            n = min(sh.samples_per_frame, sh.shape[0] - o)
            idx = jnp.arange(o, o + n, dtype=jnp.float32)
            return jnp.broadcast_to(idx[:, None], (n,) + sh.sample_shape)
        sh = StreamGenerator(counter, (1000, 2), START, RATE,
                             samples_per_frame=250, dtype=np.float32)
        st = ShiftSamples(sh, [3, -2], samples_per_frame=200)
        assert st.shape == (995, 2)
        data = np.asarray(st.read(10))
        # labels start at pad_start=3; channel 0 delayed 3, channel 1
        # advanced 2
        q = np.arange(10) + 3
        np.testing.assert_array_equal(data[:, 0], q - 3)
        np.testing.assert_array_equal(data[:, 1], q + 2)

    def test_rejects_fractional(self):
        sh = pure_tone(0.1)
        with pytest.raises(ValueError):
            ShiftSamples(sh, [0.5, 1])
