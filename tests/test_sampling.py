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


def tone_labels(st, n):
    """Label (in input samples since START) of the next n output samples."""
    t0 = (st.time - START).sec * RATE.to_value(u.Hz)
    return t0 + np.arange(n)


class TestShiftAndResample:
    """Physical contract (reference sampling.py:147-175): the output
    value at time label t is the input signal at t - shift; a uniform
    shift moves the label grid (no interpolation), per-channel residuals
    are sinc-interpolated."""

    @pytest.mark.parametrize("shift", [3.0, 3.75, -2.25])
    def test_tone_phase_shift(self, shift):
        nu = 0.123  # cycles per sample
        sh = pure_tone(nu)
        st = ShiftAndResample(sh, shift, samples_per_frame=1024)
        st.seek(100)
        lab = tone_labels(st, 200)
        data = np.asarray(st.read(200))
        expected = np.exp(2j * np.pi * nu * (lab - shift))
        # uniform shift = pure relabelling: exact to float roundoff
        np.testing.assert_allclose(data[:, 0], expected, atol=2e-6)

    def test_shift_by_quantity(self):
        nu = 0.05
        sh = pure_tone(nu)
        st = ShiftAndResample(sh, 2.5 * u.ms, samples_per_frame=1024)  # 2.5 samples
        st.seek(50)
        lab = tone_labels(st, 50)
        data = np.asarray(st.read(50))
        expected = np.exp(2j * np.pi * nu * (lab - 2.5))
        np.testing.assert_allclose(data[:, 0], expected, atol=2e-6)

    def test_per_channel_shift(self):
        nu = 0.2
        sh = pure_tone(nu)
        st = ShiftAndResample(sh, [1.5, -0.5], samples_per_frame=1024)
        st.seek(10)
        lab = tone_labels(st, 100)
        data = np.asarray(st.read(100))
        np.testing.assert_allclose(data[:, 0],
                                   np.exp(2j * np.pi * nu * (lab - 1.5)),
                                   atol=2e-3)
        np.testing.assert_allclose(data[:, 1],
                                   np.exp(2j * np.pi * nu * (lab + 0.5)),
                                   atol=2e-3)

    def test_time_labels_consistent(self):
        sh = pure_tone(0.1)
        st = ShiftAndResample(sh, 1.25, samples_per_frame=1024)
        # start time = input start + trimmed pad + the mean-shift grid move
        assert abs((st.start_time - START).sec
                   - (st.pad_start + 1.25) / 1000.0) < 1e-9

    def test_lo_phase_rotation(self):
        nu = 0.1
        shift = 3.5
        sh = SetAttribute(pure_tone(nu), frequency=[400., 400.] * u.MHz,
                          sideband=1)
        lo = 400 * u.MHz
        st = ShiftAndResample(sh, shift, lo=lo, samples_per_frame=1024)
        st.seek(100)
        lab = tone_labels(st, 50)
        data = np.asarray(st.read(50))
        dt = shift / 1000.0
        extra = np.exp(-2j * np.pi * 400e6 * dt)
        expected = np.exp(2j * np.pi * nu * (lab - shift)) * extra
        np.testing.assert_allclose(data[:, 0], expected, atol=2e-5)


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
        td = TimeDelay(sh, delay, lo=[400., 400.] * u.MHz)
        assert abs((td.start_time - START).sec - 2.5e-3) < 1e-12
        data = np.asarray(td.read(10))
        raw = np.asarray(pure_tone(nu).read(10))
        factor = np.exp(-2j * np.pi * 400e6 * 2.5e-3)
        np.testing.assert_allclose(data, raw * np.complex64(factor),
                                   atol=1e-4)

    def test_float_delay_is_samples_and_lo_none_skips_rotation(self):
        """Reference semantics (sampling.py:336-371): a bare float delay
        counts SAMPLES, and lo=None applies no phase rotation."""
        nu = 0.11
        sh = pure_tone(nu)
        td = TimeDelay(sh, 16, lo=None)
        rate_hz = sh.sample_rate.to_value(u.Hz)
        assert abs((td.start_time - START).sec - 16 / rate_hz) < 1e-12
        np.testing.assert_array_equal(np.asarray(td.read(10)),
                                      np.asarray(pure_tone(nu).read(10)))

    def test_attribute_overrides_stored(self):
        td = TimeDelay(pure_tone(0.2), 1.0, lo=None,
                       frequency=[500., 500.] * u.MHz, sideband=-1)
        assert np.all(td.frequency.to_value(u.MHz) == 500.)
        assert np.all(td.sideband == -1)

    def test_requires_complex(self):
        def real_stream(sh):
            return jnp.zeros((sh.samples_per_frame,) + sh.sample_shape,
                             jnp.float32)
        sh = StreamGenerator(real_stream, (100, 2), START, RATE,
                             samples_per_frame=50, dtype=np.float32)
        with pytest.raises(ValueError):
            TimeDelay(sh, 1 * u.ms, lo=None)


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

    @pytest.mark.parametrize("fshift, ishift", [
        ([1.0, 3.25], [1, 3]),
        ([3.49, -1.9], [3, -2]),
        ([-5.0, 5.25], [-5, 5])])
    def test_fractional_rounds_to_nearest(self, fshift, ishift):
        """Reference semantics (sampling.py:396,411): fractional shifts
        round to the nearest integer; a time Quantity converts first."""
        def counter(sh):
            o = sh.tell()
            n = min(sh.samples_per_frame, sh.shape[0] - o)
            idx = jnp.arange(o, o + n, dtype=jnp.float32)
            return jnp.broadcast_to(idx[:, None], (n,) + sh.sample_shape)
        sh = StreamGenerator(counter, (1000, 2), START, RATE,
                             samples_per_frame=250, dtype=np.float32)
        st_f = ShiftSamples(sh, fshift)
        st_i = ShiftSamples(sh, ishift)
        assert st_f.shape == st_i.shape
        expected = np.asarray(st_i.read(20))
        np.testing.assert_array_equal(np.asarray(st_f.read(20)), expected)
        # same shifts as a time Quantity
        st_q = ShiftSamples(sh, np.asarray(fshift) / RATE)
        np.testing.assert_array_equal(np.asarray(st_q.read(20)), expected)

    def test_wrong_shape(self):
        sh = pure_tone(0.1)
        with pytest.raises(ValueError):
            ShiftSamples(sh, np.array([[1], [2], [3]]))


class TestSeekFloat:
    """seek_float conversion semantics (reference test_sampling.py:42-76)."""

    def setup_method(self):
        def empty(sh):
            n = min(sh.samples_per_frame, sh.shape[0] - sh.tell())
            return jnp.zeros((n,) + sh.sample_shape, np.complex64)
        self.ih = StreamGenerator(empty, (2048, 3, 2), START, RATE,
                                  samples_per_frame=256,
                                  dtype=np.complex64)

    @pytest.mark.parametrize("offset", [
        0.0, 1.0, 10.5,
        10.0 * u.ms, 0.015 * u.s,
        START + 0.013 * u.s,
        [1.75, 10.5],
        np.linspace(1, 10, 6).reshape(3, 2) * u.ms,
    ])
    def test_seek_float(self, offset):
        from baseband_tasks_tpu.sampling import seek_float
        floats = seek_float(self.ih, offset)
        if isinstance(offset, Time):
            offset = (offset - self.ih.start_time).sec * u.s
        if isinstance(offset, u.Quantity):
            offset = offset.to_value(u.s) * RATE.to_value(u.Hz)
        np.testing.assert_allclose(np.asarray(floats),
                                   np.asarray(offset), rtol=1e-9)

    def test_whence(self):
        from baseband_tasks_tpu.sampling import seek_float
        self.ih.seek(5)
        assert seek_float(self.ih, 1.5, whence=1) == 6.5
        assert seek_float(self.ih, -0.5, whence=2) == 2048 - 0.5
        with pytest.raises(ValueError, match="whence"):
            seek_float(self.ih, 0.0, whence=3)

    def test_invalid(self):
        from baseband_tasks_tpu.sampling import seek_float
        with pytest.raises(Exception):
            seek_float(self.ih, object())
        with pytest.raises(u.UnitsError):
            seek_float(self.ih, 1.0 * u.m)


class TestShiftRoundTrip:
    """Shifting by +d then -d recovers the stream to the documented 0.1%
    interpolation accuracy (reference sampling.py:108-109 and the
    resample-delayed scenarios of test_sampling.py:367-388)."""

    @pytest.mark.parametrize("d", [0.25, 3.3, -7.6])
    def test_round_trip_tone(self, d):
        src = pure_tone(0.05123)
        fwd = ShiftAndResample(src, d, samples_per_frame=1024)
        back = ShiftAndResample(fwd, -d, samples_per_frame=1024)
        t0 = START + 1.0 * u.s
        back.seek(t0)
        got = np.asarray(back.read(512))
        src.seek(t0)
        expect = np.asarray(src.read(512))
        np.testing.assert_allclose(got, expect, atol=2e-3)

    def test_round_trip_noise(self):
        from baseband_tasks_tpu import NoiseGenerator
        src = NoiseGenerator(shape=(4096, 2), start_time=START,
                             sample_rate=RATE, samples_per_frame=1024,
                             seed=17, dtype=np.complex64)
        fwd = ShiftAndResample(src, 2.75, samples_per_frame=1024)
        back = ShiftAndResample(fwd, -2.75, samples_per_frame=1024)
        t0 = START + 1.0 * u.s
        back.seek(t0)
        got = np.asarray(back.read(512))
        src.seek(t0)
        expect = np.asarray(src.read(512))
        # noise has full bandwidth; edge-of-band components interpolate
        # worst (reference: better than 0.1% at default pad=64)
        assert np.abs(got - expect).max() < 1e-2
        np.testing.assert_allclose(got, expect, atol=1e-2)


class TestTimeDelayVsShiftAndResample:
    """Relabel-only TimeDelay followed by Resample onto an anchored grid
    equals ShiftAndResample doing both at once (reference
    test_sampling.py:399-427)."""

    @pytest.mark.parametrize("delay_samples", [1.0, 3.75, -2.5])
    def test_equivalence(self, delay_samples):
        nu = 0.0789
        lo = 400 * u.MHz
        delay = delay_samples / RATE
        src1 = SetAttribute(pure_tone(nu), frequency=lo, sideband=1)
        src2 = SetAttribute(pure_tone(nu), frequency=lo, sideband=1)
        anchor = START + 1.0 * u.s

        delayed = TimeDelay(src1, delay, lo=lo)
        a = Resample(delayed, anchor, samples_per_frame=1024)
        b = ShiftAndResample(src2, delay, offset=anchor, lo=lo,
                             samples_per_frame=1024)
        a.seek(anchor)
        b.seek(anchor)
        ga = np.asarray(a.read(256))
        gb = np.asarray(b.read(256))
        np.testing.assert_allclose(ga, gb, atol=2e-3)


class TestShiftSamplesVsShiftAndResample:
    """Integer shifts: the gather implementation and the sinc interpolator
    must agree exactly up to interpolation roundoff (reference
    test_sampling.py:675-691)."""

    def test_integer_equivalence(self):
        from baseband_tasks_tpu import NoiseGenerator
        src1 = NoiseGenerator(shape=(4096, 2), start_time=START,
                              sample_rate=RATE, samples_per_frame=1024,
                              seed=23, dtype=np.complex64)
        src2 = NoiseGenerator(shape=(4096, 2), start_time=START,
                              sample_rate=RATE, samples_per_frame=1024,
                              seed=23, dtype=np.complex64)
        shift = [2, -3]
        gather = ShiftSamples(src1, shift, samples_per_frame=1024)
        # anchor on the input grid so both outputs share integer labels
        sinc = ShiftAndResample(src2, shift, offset=0,
                                samples_per_frame=1024)
        t0 = START + 1.0 * u.s
        gather.seek(t0)
        sinc.seek(t0)
        gg = np.asarray(gather.read(512))
        gs = np.asarray(sinc.read(512))
        np.testing.assert_allclose(gg, gs, atol=1e-5)


class TestDelayRecovery:
    """Full receiver-chain delay recovery (reference
    test_sampling.py:264-555): simulate a sky tone observed by two
    telescopes (one with a geometric delay), mix each with a quadrature
    LO anchored in absolute time, low-pass, downsample; then undo the
    delay with TimeDelay / Resample / ShiftAndResample(lo=...) and check
    the streams agree.  sideband = [-1, +1] exercises both IF senses."""

    full_rate = 204.8 * u.kHz
    spf_full = 1024
    n_frames = 16
    downsample = 16
    sideband = np.array([-1, 1])
    phi0_mixer = -12.3456789 / 360.0    # cycles
    phi0_sig = 0.123456                 # cycles

    @classmethod
    def setup_class(cls):
        cls.rate_hz = cls.full_rate.to_value(u.Hz)
        cls.lo_hz = cls.rate_hz * (7 / 16 - cls.sideband / 128)
        cls.f_sig = cls.lo_hz + cls.sideband * cls.rate_hz / 100

        def signal(sh):
            o = sh.tell()
            n = min(sh.samples_per_frame, sh.shape[0] - o)
            t = (o + np.arange(n, dtype=np.float64))[:, None] / cls.rate_hz
            x = np.cos(2 * np.pi * (cls.f_sig * t + cls.phi0_sig))
            return jnp.asarray(x.astype(np.float32))

        cls.raw = StreamGenerator(signal,
                                  (cls.spf_full * cls.n_frames, 2),
                                  START, cls.full_rate,
                                  samples_per_frame=cls.spf_full,
                                  dtype=np.float32)

    def mix_downsample(self, task, data):
        """Quadrature mix with the absolute-time LO, low-pass, decimate."""
        data = np.asarray(data, np.float64)
        n = data.shape[0]
        off = task.ih.tell() - n
        t = ((task.ih.start_time - START).sec
             + (off + np.arange(n, dtype=np.float64)) / self.rate_hz)
        phase = 2 * np.pi * (self.lo_hz * t[:, None] + self.phi0_mixer)
        mixer = np.exp(1j * phase)
        mixed = data * np.where(self.sideband > 0,
                                np.conj(mixer), mixer)
        planes = np.stack([mixed.real, mixed.imag], axis=-1)
        ft = np.fft.rfft(planes, axis=0)
        ft[ft.shape[0] // self.downsample:] = 0
        ft *= 2.0
        filt = np.fft.irfft(ft, n=n, axis=0)[::self.downsample]
        return jnp.asarray((filt[..., 0] + 1j * filt[..., 1]
                            ).astype(np.complex64))

    def get_tel(self, delay=None, n=None):
        from baseband_tasks_tpu import Task, Channelize
        fh = self.raw
        if delay is not None:
            fh = SetAttribute(self.raw,
                              start_time=START - delay / self.full_rate)
        obs = Task(fh, lambda task, data: self.mix_downsample(task, data),
                   dtype=np.complex64,
                   sample_rate=self.full_rate / self.downsample,
                   frequency=self.lo_hz * u.Hz, sideband=self.sideband)
        return obs if n is None else Channelize(obs, n)

    def assert_tel_same(self, tel1, tel2, atol=1e-2):
        from baseband_tasks_tpu import Stack
        both = Stack((tel1, tel2), axis=1)
        assert both.size > 500
        data = np.asarray(both.read())
        np.testing.assert_allclose(data[:, 0], data[:, 1],
                                   atol=atol, rtol=0)

    @pytest.mark.parametrize("delay", (-8, 16))
    def test_time_delay(self, delay):
        tel1 = self.get_tel()
        tel2 = self.get_tel(delay=delay)
        undone = TimeDelay(tel2, delay / self.full_rate,
                           lo=self.lo_hz * u.Hz)
        self.assert_tel_same(tel1, undone)

    @pytest.mark.parametrize("delay", (-1, 15.4321))
    def test_time_delay_align(self, delay):
        tel1 = self.get_tel()
        tel2 = self.get_tel(delay=delay)
        undone = TimeDelay(tel2, delay / self.full_rate,
                           lo=self.lo_hz * u.Hz)
        aligned = Resample(undone, tel1.start_time)
        self.assert_tel_same(tel1, aligned)

    @pytest.mark.parametrize("delay", (-18.25, 0.1, 65.4321))
    def test_resample_delayed(self, delay):
        tel1 = self.get_tel()
        tel2 = self.get_tel(delay=delay)
        undone = ShiftAndResample(tel2, delay / self.full_rate,
                                  tel1.start_time, lo=self.lo_hz * u.Hz)
        self.assert_tel_same(tel1, undone)

    @pytest.mark.parametrize("delay", (-16, 32.25))
    def test_resample_delayed_channelized(self, delay):
        n = 16
        tel1 = self.get_tel(n=n)
        tel2 = self.get_tel(delay=delay, n=n)
        undone = ShiftAndResample(tel2, delay / self.full_rate,
                                  tel1.start_time, lo=self.lo_hz * u.Hz,
                                  samples_per_frame=16, pad=6)
        self.assert_tel_same(tel1, undone, atol=2e-2)


class TestShiftSamplesBroadcast:
    """shift broadcasts against the sample shape with numpy TRAILING-axis
    rules (reference sampling.py:396-398: shape (N, 1) addresses the
    one-but-last axis)."""

    def _counter(self, shape):
        def f(sh):
            o = sh.tell()
            n = min(sh.samples_per_frame, sh.shape[0] - o)
            idx = jnp.arange(o, o + n, dtype=jnp.float32)
            return jnp.broadcast_to(idx.reshape((n,) + (1,) * 2),
                                    (n,) + sh.sample_shape)
        return StreamGenerator(f, shape, START, RATE,
                               samples_per_frame=250, dtype=np.float32)

    def test_trailing_axis_shift(self):
        # (freq=3, pol=2): a plain (2,) shift must act per-POL
        sh = ShiftSamples(self._counter((1000, 3, 2)), np.array([2, 5]),
                          samples_per_frame=200)
        out = np.asarray(sh.read(100))
        expected0 = np.broadcast_to(
            (out[0, 0, 0] + np.arange(100))[:, None], (100, 3))
        np.testing.assert_array_equal(out[..., 0], expected0)
        np.testing.assert_array_equal(out[..., 1] - out[..., 0], -3)

    def test_leading_axis_shift_via_column(self):
        # shape (3, 1) addresses the freq axis
        sh = ShiftSamples(self._counter((1000, 3, 2)),
                          np.array([[0], [1], [2]]),
                          samples_per_frame=200)
        out = np.asarray(sh.read(100))
        np.testing.assert_array_equal(out[:, 0] - out[:, 1], 1)
        np.testing.assert_array_equal(out[:, 0] - out[:, 2], 2)

    def test_unbroadcastable_rejected(self):
        with pytest.raises(ValueError, match="broadcast"):
            ShiftSamples(self._counter((1000, 3, 2)), np.array([1, 2, 3]))
