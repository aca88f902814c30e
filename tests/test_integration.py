"""Integration/folding tests with analytically-checkable streams
(reference strategy: deterministic pulse trains, tests/test_integration.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from baseband_tasks_tpu import (Integrate, Fold, PulseStack,
                                StreamGenerator, NoiseGenerator)
from baseband_tasks_tpu.integration import Stack
from baseband_tasks_tpu.utils import Time, units as u

START = Time("2018-01-01T00:00:00.000000000")


def counter_stream(n=1000, spf=100, rate=1 * u.kHz, sample_shape=(2,)):
    def counter(sh):
        o = sh.tell()
        m = min(sh.samples_per_frame, sh.shape[0] - o)
        idx = jnp.arange(o, o + m, dtype=jnp.float32)
        return jnp.broadcast_to(idx[:, None], (m,) + sh.sample_shape)
    return StreamGenerator(counter, (n,) + sample_shape, START, rate,
                           samples_per_frame=spf, dtype=np.float32)


def pulse_stream(n=8000, spf=1000, rate=1 * u.kHz, period_samples=100):
    """1 kHz stream with unit impulses every period_samples samples."""
    def pulses(sh):
        o = sh.tell()
        m = min(sh.samples_per_frame, sh.shape[0] - o)
        idx = jnp.arange(o, o + m)
        return jnp.where(idx % period_samples == 0, 1.0, 0.0
                         ).astype(jnp.float32)
    return StreamGenerator(pulses, (n,), START, rate,
                           samples_per_frame=spf, dtype=np.float32)


class TestIntegrate:
    def test_integer_sample_step(self):
        sh = counter_stream()
        it = Integrate(sh, 100)
        assert it.shape == (10, 2)
        data = np.asarray(it.read())
        # average of [k*100, (k+1)*100) = k*100 + 49.5
        np.testing.assert_allclose(data[:, 0],
                                   np.arange(10) * 100 + 49.5, rtol=1e-6)

    def test_time_step(self):
        sh = counter_stream()
        it = Integrate(sh, 0.25 * u.s)  # 250 samples per bin at 1 kHz
        assert it.shape == (4, 2)
        assert it.sample_rate.to_value(u.Hz) == pytest.approx(4.0)
        data = np.asarray(it.read())
        np.testing.assert_allclose(data[:, 0],
                                   np.arange(4) * 250 + 124.5, rtol=1e-6)

    def test_whole_stream_default(self):
        sh = counter_stream()
        it = Integrate(sh)
        data = np.asarray(it.read())
        assert it.shape == (1, 2)
        np.testing.assert_allclose(data[0, 0], 499.5, rtol=1e-6)

    def test_no_average_counts(self):
        sh = counter_stream()
        it = Integrate(sh, 100, average=False)
        data = it.read()
        assert data.dtype.names == ("data", "count")
        np.testing.assert_array_equal(data["count"][:, 0], 100)
        np.testing.assert_allclose(data["data"][:, 0] / data["count"][:, 0],
                                   np.arange(10) * 100 + 49.5, rtol=1e-6)

    def test_non_integer_samples_per_bin(self):
        sh = counter_stream(n=1000)
        it = Integrate(sh, 0.128 * u.s)  # 128 samples/bin
        data = np.asarray(it.read())
        assert it.shape[0] == 7
        np.testing.assert_allclose(data[:, 0],
                                   np.arange(7) * 128 + 63.5, rtol=1e-5)

    def test_start_time_and_times(self):
        sh = counter_stream()
        it = Integrate(sh, 100)
        assert it.start_time == START
        it.seek(5)
        assert abs((it.time - START).sec - 0.5) < 1e-9


def linear_phase(f0_hz, t_ref, phi0=0.05):
    """Phase model: phi(t) = f0 * (t - t_ref) + phi0, in cycles.

    phi0 keeps synthetic impulses off exact bin boundaries, where float
    rounding direction is undefined.
    """
    def phase(t):
        dt = (t - t_ref).sec
        return u.Quantity(f0_hz * np.asarray(dt) + phi0, u.cycle)
    return phase


class TestFold:
    def test_pulse_lands_in_right_bin(self):
        # impulses every 100 samples at 1 kHz -> pulse frequency 10 Hz
        sh = pulse_stream()
        phase = linear_phase(10.0, START)
        fold = Fold(sh, 10, phase, average=False)
        data = fold.read()
        assert data.shape == (1, 10)
        counts = data["count"][0]
        sums = data["data"][0]
        # all 80 pulses are at phase 0 -> bin 0
        assert sums[0] == pytest.approx(80)
        np.testing.assert_allclose(sums[1:], 0, atol=1e-6)
        assert counts.sum() == 8000

    def test_fold_with_time_steps(self):
        sh = pulse_stream()
        phase = linear_phase(10.0, START)
        fold = Fold(sh, 10, phase, step=2 * u.s, average=False)
        data = fold.read()
        assert data.shape == (4, 10)
        np.testing.assert_allclose(data["data"][:, 0], 20, rtol=1e-6)

    def test_offset_pulse_phase(self):
        # impulses offset by 30 samples -> phase 0.3 of the 10 Hz cycle
        def pulses(sh):
            o = sh.tell()
            m = min(sh.samples_per_frame, sh.shape[0] - o)
            idx = jnp.arange(o, o + m)
            return jnp.where(idx % 100 == 30, 1.0, 0.0).astype(jnp.float32)
        sh = StreamGenerator(pulses, (4000,), START, 1 * u.kHz,
                             samples_per_frame=1000, dtype=np.float32)
        fold = Fold(sh, 10, linear_phase(10.0, START), average=False)
        data = fold.read()
        sums = data["data"][0]
        assert sums[3] == pytest.approx(40)
        assert sums.sum() == pytest.approx(40)

    def test_average_profile(self):
        sh = pulse_stream()
        fold = Fold(sh, 10, linear_phase(10.0, START), average=True)
        prof = np.asarray(fold.read())
        # bin 0 average = 80 pulses / ~800 samples ~= 0.1 (bin-boundary
        # float truncation makes per-bin counts uneven by a few %)
        assert prof[0, 0] == pytest.approx(0.1, rel=0.05)
        np.testing.assert_allclose(prof[0, 1:], 0, atol=1e-7)


class TestPulseStack:
    def test_stack_shape_and_content(self):
        # impulses at sample 30 of each 100-sample period -> phase 0.3
        def pulses(sh):
            o = sh.tell()
            m = min(sh.samples_per_frame, sh.shape[0] - o)
            idx = jnp.arange(o, o + m)
            return jnp.where(idx % 100 == 30, 1.0, 0.0).astype(jnp.float32)
        sh = StreamGenerator(pulses, (8000,), START, 1 * u.kHz,
                             samples_per_frame=1000, dtype=np.float32)
        ps = PulseStack(sh, 10, linear_phase(10.0, START, phi0=0.0),
                        average=False)
        assert ps.shape[1] == 10 and ps.shape[0] in (79, 80)
        data = ps.read(10)
        sums = data["data"]
        # each pulse profile has exactly one impulse, in phase bin 3
        np.testing.assert_allclose(sums[:, 3], 1.0, rtol=1e-6)
        np.testing.assert_allclose(sums.sum(axis=-1), 1.0, rtol=1e-6)

    def test_deprecated_stack_alias(self):
        sh = pulse_stream(n=2000)
        with pytest.warns(DeprecationWarning):
            ps = Stack(sh, 10, linear_phase(10.0, START))
        assert ps.n_phase == 10


class TestPipelineConfig1:
    """BASELINE config 1: noise -> 256-chan channelize -> square -> integrate."""

    def test_end_to_end(self):
        from baseband_tasks_tpu import Channelize, Square
        sh = NoiseGenerator(shape=(65536, 2), start_time=START,
                            sample_rate=1 * u.MHz, samples_per_frame=8192,
                            dtype=np.complex64, seed=99)
        pipeline = Integrate(Square(Channelize(sh, 256)), 64)
        assert pipeline.shape == (4, 256, 2)
        data = np.asarray(pipeline.read())
        # white noise: flat spectrum, mean power = 2 * 256 per channel
        assert data.mean() == pytest.approx(512.0, rel=0.05)
        flat = data.mean(axis=(0, 2)) / 512.0
        np.testing.assert_allclose(flat, 1.0, rtol=0.2)


class TestPipelineConfig4:
    """BASELINE config 4: stream -> dedisperse -> resample -> fold."""

    def test_full_chain(self):
        import jax
        from baseband_tasks_tpu import (Dedisperse, Disperse, Resample,
                                        SetAttribute, Square)

        period = 500  # samples at 1 MHz -> 2 kHz pulsar
        def psr(sh):
            o = sh.tell()
            n = min(sh.samples_per_frame, sh.shape[0] - o)
            i = jnp.arange(o, o + n)
            key = jax.random.fold_in(jax.random.key(1), o)
            noise = jax.random.normal(key, (n, 2)) * 0.02
            pulse = jnp.where(i % period == 200, 4.0, 0.0)
            return (noise[:, 0] + 1j * noise[:, 1] + pulse
                    ).astype(jnp.complex64)

        sh = SetAttribute(
            StreamGenerator(psr, (1 << 17,), START, 1 * u.MHz,
                            samples_per_frame=1 << 15, dtype=np.complex64),
            frequency=300 * u.MHz, sideband=1)
        observed = Disperse(sh, 0.5)          # the ISM
        dedispersed = Dedisperse(observed, 0.5)
        # anchor the sample grid on a specific absolute time
        target = dedispersed.start_time + 1000.25 / (1 * u.MHz)
        resampled = Resample(dedispersed, target, samples_per_frame=16384)
        assert abs((resampled.time - target).sec) < 1e-9
        resampled.seek(0)
        def phase(t):
            return u.Quantity(2000.0 * np.asarray((t - START).sec) + 0.02,
                              u.cycle)
        prof = np.asarray(Fold(Square(resampled), 25, phase,
                               average=True).read())
        peak = int(np.argmax(prof[0]))
        snr = prof[0].max() / np.median(prof[0])
        # pulse at sample 200 of 500 -> phase 0.4+0.02 -> bin 10/25
        assert peak == 10
        assert snr > 50


class TestPhaseInversion:
    """The iterative phase->offset inversion (reference
    integration.py:174-228): convergence tolerance and the
    non-convergent (glitch/pathological phase model) path."""

    def test_smooth_quadratic_converges_exactly(self):
        # quadratic spin-up: still solvable by the fixed-point iteration
        f0, fdot = 10.0, 0.05  # cycles/s, cycles/s^2

        def phase(t):
            dt = (t - START).sec
            return u.Quantity(f0 * dt + 0.5 * fdot * dt * dt, u.cycle)

        sh = counter_stream(n=8000, spf=1000)
        pstack = Integrate(sh, u.Quantity(1.0, u.cycle), phase)
        offs = pstack._get_offsets(np.arange(5, dtype=np.float64))
        # check phase(t(offset)) == bin index to < 1e-3 sample
        t = START + u.Quantity(np.asarray(offs) / 1000.0, u.s)
        ph = phase(t).to_value(u.cycle)
        np.testing.assert_allclose(ph - ph[0], np.arange(5), atol=2e-2)

    def test_glitch_warns_not_hangs(self):
        # a 5-cycle step discontinuity mid-stream: targets inside the
        # jump are unreachable, the iteration must give up with the
        # documented warning instead of looping or silently lying
        def phase(t):
            dt = (t - START).sec
            ph = 1.0 * dt + np.where(np.asarray(dt) > 4.0, 5.0, 0.0)
            return u.Quantity(ph, u.cycle)

        sh = counter_stream(n=8000, spf=1000)
        with pytest.warns(UserWarning, match="did not converge"):
            fold = Integrate(sh, u.Quantity(1.0, u.cycle), phase)
            fold._get_offsets(np.arange(fold.shape[0] + 1,
                                        dtype=np.float64))

    def test_nonconvergent_offsets_stay_in_bounds(self):
        def phase(t):
            dt = (t - START).sec
            return u.Quantity(
                1.0 * dt + np.where(np.asarray(dt) > 4.0, 5.0, 0.0),
                u.cycle)

        sh = counter_stream(n=8000, spf=1000)
        with pytest.warns(UserWarning, match="did not converge"):
            fold = Integrate(sh, u.Quantity(1.0, u.cycle), phase)
            offs = fold._get_offsets(np.arange(fold.shape[0] + 1,
                                               dtype=np.float64))
        assert (np.asarray(offs) >= 0).all()
        assert (np.asarray(offs) <= sh.shape[0]).all()
        assert (np.diff(np.asarray(offs)) >= 0).all()


class TestFoldPhaseClassAndSteps:
    """Reference scenarios: Fold driven by a two-double Phase model
    (test_integration.py:403-405 UsePhaseClass) and time steps shorter /
    longer than the pulse period (test_integration.py:274-331)."""

    F0 = 10.0  # pulses/s on a 1 kHz stream -> period = 100 samples

    def _phase_quantity(self):
        return lambda t: u.Quantity((t - START).sec * self.F0, u.cycle)

    def _phase_class(self):
        from baseband_tasks_tpu.phases import Phase

        def model(t):
            sec = (t - START).sec
            return Phase(sec * self.F0)
        return model

    def test_phase_class_matches_quantity(self):
        fold_q = Fold(pulse_stream(), 10, self._phase_quantity(),
                      step=1.0 * u.s, samples_per_frame=1)
        fold_p = Fold(pulse_stream(), 10, self._phase_class(),
                      step=1.0 * u.s, samples_per_frame=1)
        a = np.asarray(fold_q.read(4))
        b = np.asarray(fold_p.read(4))
        np.testing.assert_array_equal(a, b)

    def test_step_shorter_than_period(self):
        """Step = half a period: each profile holds half the phase bins
        (counts land only where samples arrived)."""
        fold = Fold(pulse_stream(), 10, self._phase_quantity(),
                    step=0.05 * u.s, samples_per_frame=1, average=False)
        out = fold.read(4)
        counts = out["count"]
        # 50 samples per step over 10 bins: each covered bin gets 5
        assert counts.sum() == 4 * 50
        # the pulse (phase 0) arrives in the even steps only
        assert out["data"][0].sum() == 1.0
        assert out["data"][1].sum() == 0.0

    def test_step_longer_than_period(self):
        """Step = 2 periods: every phase bin is covered twice."""
        fold = Fold(pulse_stream(), 10, self._phase_quantity(),
                    step=0.2 * u.s, samples_per_frame=1, average=False)
        out = fold.read(3)
        # 200 samples per step over 10 bins; boundary samples may flip
        # bins at float precision (pulses sit exactly on edges)
        assert out["count"].sum() == 3 * 200
        assert np.abs(out["count"].astype(int) - 20).max() <= 2
        # two pulses per step, at phase 0 (possibly split with the last
        # bin by edge rounding)
        np.testing.assert_array_equal(
            out["data"][:, 0] + out["data"][:, -1], 2.0)
        np.testing.assert_array_equal(out["data"][:, 1:-1], 0.0)


class TestPulseStackSlicing:
    """PulseStack with a start offset, sliced input, and sliced output
    (reference test_integration.py:436-506)."""

    F0 = 10.0

    def _phase(self):
        return lambda t: u.Quantity((t - START).sec * self.F0, u.cycle)

    def test_start_offset(self):
        ps = PulseStack(pulse_stream(), 10, self._phase(), start=100)
        out = np.asarray(ps.read(5))
        # starting exactly one period in: pulses still at phase bin 0;
        # averaged over the 10 samples in the bin -> 0.1
        np.testing.assert_allclose(out[:, 0], 0.1)
        np.testing.assert_allclose(out[:, 1:], 0.0)

    def test_sliced_input(self):
        src = pulse_stream()
        ps = PulseStack(src[200:], 10, self._phase())
        out = np.asarray(ps.read(5))
        np.testing.assert_allclose(out[:, 0], 0.1)
        np.testing.assert_allclose(out[:, 1:], 0.0)

    def test_sliced_output(self):
        ps = PulseStack(pulse_stream(), 10, self._phase())
        sl = ps[10:20]
        out = np.asarray(sl.read(10))
        assert out.shape == (10, 10)
        ps.seek(10)
        np.testing.assert_array_equal(out, np.asarray(ps.read(10)))


class TestIntegrationErrors:
    """Invalid construction raises (reference
    test_integration.py:256-263,394-401)."""

    def test_start_time_before_stream(self):
        src = pulse_stream()
        with pytest.raises(Exception):
            Integrate(src, 10, start=START - 1.0 * u.s)

    def test_bad_step_unit(self):
        with pytest.raises(Exception):
            Integrate(pulse_stream(), step=1.0 * u.m)

    def test_phase_step_requires_phase(self):
        with pytest.raises(Exception):
            Integrate(pulse_stream(), step=0.1 * u.cycle)


class TestZeroLengthWindow:
    def test_start_at_stream_end_is_legal(self):
        """start == ih.shape[0] is a legal (empty) window bound in the
        reference (integration.py:110-113); only the bin count check
        should reject it."""
        src = pulse_stream()
        with pytest.raises(ValueError, match="too short"):
            Integrate(src, 10, start=src.shape[0])
        with pytest.raises(ValueError, match="not within"):
            Integrate(src, 10, start=src.shape[0] + 1)
