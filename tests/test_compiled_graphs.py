"""CompiledPipeline generality: multi-input graphs and absorbed
reductions (Integrate/Fold/PulseStack inside the scan).

Reference semantics being matched: combining.py:11-128 (multi-stream
nodes), integration.py:174-228,380-395 (bin assignment / fold scatter).
The compiled runs must reproduce the eager Stream computation exactly
(no padded stages → zero delay) or past the warmup with delay-aligned
windows.
"""

import numpy as np
import pytest

from baseband_tasks_tpu import (Channelize, CombineStreams, Dedisperse,
                                Fold, Integrate, NoiseGenerator,
                                PulseStack, SetAttribute, Square, Stack)
from baseband_tasks_tpu.models.compiled import CompiledPipeline
from baseband_tasks_tpu.utils import Time, units as u

T0 = Time("2020-01-01T00:00:00.0")


def noise(seed, shape=(16384,), spf=2048, rate=1 * u.MHz):
    return NoiseGenerator(shape=shape, start_time=T0, sample_rate=rate,
                          samples_per_frame=spf, seed=seed)


class TestAbsorbedIntegrate:
    def test_matches_eager_exactly(self):
        tail = Integrate(Square(Channelize(noise(7), 64)), 16)
        cp = CompiledPipeline(tail)
        assert cp.reduction is tail
        assert cp.delay == 0
        n_blocks = (16384 // 64) // cp.tail_block
        blocks = cp.read_source_blocks(n_blocks)
        data, counts = cp.run_reduced(blocks)
        tail.seek(0)
        eager = tail.read(data.shape[0])
        np.testing.assert_array_equal(np.asarray(counts),
                                      np.full(data.shape[0], 16))
        np.testing.assert_allclose(np.asarray(data), eager,
                                   rtol=1e-5, atol=1e-5)

    def test_run_fn_cached_per_block_count(self):
        """Repeated run_fn calls with the same n_blocks reuse one closure
        (and its jit executable) instead of recompiling the scan."""
        tail = Integrate(Square(Channelize(noise(5), 32)), 8)
        cp = CompiledPipeline(tail)
        assert cp.run_fn(2) is cp.run_fn(2)
        assert cp.run_fn(2) is not cp.run_fn(3)
        plain = CompiledPipeline(Square(Channelize(noise(5), 32)))
        assert plain.run_fn(4) is plain.run_fn(4)

    def test_unaveraged_sums(self):
        tail = Integrate(Square(Channelize(noise(3), 32)), 8,
                         average=False)
        cp = CompiledPipeline(tail)
        n_blocks = 16384 // cp.block_samples
        blocks = cp.read_source_blocks(n_blocks)
        sums, counts = cp.run_fn(n_blocks)(blocks)
        tail.seek(0)
        eager = tail.read(sums.shape[0])
        np.testing.assert_allclose(np.asarray(sums), eager["data"],
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(counts), eager["count"][(slice(None),)
                                               + (0,) * (eager.ndim - 1)])


class TestAbsorbedFold:
    def _phase(self):
        f0 = 123.456  # cycles/s, deliberately incommensurate with rate
        return lambda t: u.Quantity((t - T0).sec * f0, u.cycle)

    def test_fold_matches_eager(self):
        tail = Fold(Square(Channelize(noise(11), 16)), 8, self._phase(),
                    samples_per_frame=1)
        cp = CompiledPipeline(tail)
        n_blocks = (16384 // 16) // cp.tail_block
        blocks = cp.read_source_blocks(n_blocks)
        data, counts = cp.run_reduced(blocks)
        tail.seek(0)
        eager = tail.read(data.shape[0])
        np.testing.assert_allclose(np.asarray(data), eager,
                                   rtol=1e-5, atol=1e-5)
        assert np.asarray(counts).sum() == 16384 // 16

    def test_fold_after_padded_stage(self):
        """Dedisperse with spf | pad → integral delay; compiled fold bins
        past the warmup must match eager fold of the delayed stream."""
        def make_src():
            return SetAttribute(noise(19, shape=(65536,), spf=8192),
                                frequency=600 * u.MHz, sideband=1)

        probe = Dedisperse(make_src(), 1.0)
        pad = probe.pad_start + probe.pad_end
        ded = Dedisperse(make_src(), 1.0, samples_per_frame=pad)
        step = u.Quantity(pad / 1e6, u.s)  # = pad samples per time bin
        tail = Fold(Square(ded), 8, self._phase(), step,
                    samples_per_frame=1, average=False)
        cp = CompiledPipeline(tail)
        assert cp.delay == pad
        n_blocks = 6
        blocks = cp.read_source_blocks(n_blocks)
        data, counts = cp.run_fn(n_blocks)(blocks)
        # compiled covers eager samples [0, n_blocks*block - delay):
        # the first n_blocks-1 time bins are complete
        n_full = n_blocks - 1
        tail.seek(0)
        eager = tail.read(n_full)
        got, cnts = np.asarray(data), np.asarray(counts)
        np.testing.assert_array_equal(cnts[:n_full],
                                      eager["count"][:n_full])
        np.testing.assert_allclose(got[:n_full], eager["data"][:n_full],
                                   rtol=1e-4, atol=1e-3)

    def test_pulsestack_matches_eager(self):
        tail = PulseStack(Square(Channelize(noise(23), 16)), 8,
                          self._phase(), samples_per_frame=1)
        cp = CompiledPipeline(tail)
        n_blocks = (16384 // 16) // cp.tail_block
        blocks = cp.read_source_blocks(n_blocks)
        data, counts = cp.run_reduced(blocks)
        tail.seek(0)
        n_pulse = min(data.shape[0], tail.shape[0])
        eager = tail.read(n_pulse)
        np.testing.assert_allclose(np.asarray(data)[:n_pulse], eager,
                                   rtol=1e-5, atol=1e-5)


class TestMultiInput:
    def test_stack_two_streams(self):
        s1, s2 = noise(31), noise(37)
        tail = Square(Stack([Channelize(s1, 64), Channelize(s2, 64)]))
        cp = CompiledPipeline(tail)
        assert len(cp.sources) == 2
        blocks = cp.read_source_blocks(4)
        out = np.asarray(cp.run_blocks(blocks))
        tail.seek(0)
        eager = np.asarray(tail.read(out.shape[0]))
        np.testing.assert_allclose(out, eager, rtol=1e-5, atol=1e-4)

    def test_combine_streams_sum(self):
        s1, s2 = noise(41), noise(43)
        tail = Square(CombineStreams([s1, s2], lambda d: d[0] + d[1]))
        cp = CompiledPipeline(tail)
        blocks = cp.read_source_blocks(4)
        out = np.asarray(cp.run_blocks(blocks))
        tail.seek(0)
        eager = np.asarray(tail.read(out.shape[0]))
        np.testing.assert_allclose(out, eager, rtol=1e-5, atol=1e-4)

    def test_combine_then_reduce(self):
        """Multi-input graph with an absorbed reduction on top."""
        s1, s2 = noise(47), noise(53)
        comb = CombineStreams([s1, s2], lambda d: d[0] + d[1])
        tail = Integrate(Square(Channelize(comb, 32)), 4)
        cp = CompiledPipeline(tail)
        n_blocks = 16384 // cp.block_samples
        blocks = cp.read_source_blocks(n_blocks)
        data, counts = cp.run_reduced(blocks)
        tail.seek(0)
        eager = tail.read(data.shape[0])
        np.testing.assert_allclose(np.asarray(data), eager,
                                   rtol=1e-5, atol=1e-4)

    def test_mismatched_delays_absorbed(self):
        """Branches with different streaming delays (one padded, one
        not) combine by shifting the less-delayed branch's source reads
        — compiled output matches eager exactly after the warmup."""
        src1 = SetAttribute(noise(59, shape=(65536,), spf=8192),
                            frequency=600 * u.MHz, sideband=1)
        s2 = noise(61, shape=(65536,), spf=8192)
        probe = Dedisperse(SetAttribute(noise(1, shape=(65536,), spf=8192),
                                        frequency=600 * u.MHz, sideband=1),
                           1.0)
        pad = probe.pad_start + probe.pad_end
        ded = Dedisperse(src1, 1.0, samples_per_frame=8192)
        tail = Square(CombineStreams(
            [ded, SetAttribute(s2)], lambda d: d[0] + d[1]))
        eager = np.asarray(tail.read(4096))
        cp = CompiledPipeline(Square(CombineStreams(
            [Dedisperse(src1, 1.0, samples_per_frame=8192),
             SetAttribute(s2)], lambda d: d[0] + d[1])))
        blocks = cp.read_source_blocks(3)
        out = np.asarray(cp.run_blocks(blocks))
        # compiled[t] = eager[t - delay]; the first `warmup` samples
        # (the slower branch's carry fill) are garbage and skipped
        w, d = cp.warmup, int(cp.delay)
        assert w == 2 * d            # branch warmup exceeds align delay
        n = min(out.shape[0] - w, 4096 - (w - d))
        got = out[w:w + n]
        ref = eager[w - d:w - d + n]
        snr_db = 10 * np.log10(float(np.sum(ref ** 2))
                               / max(float(np.sum((got - ref) ** 2)),
                                     1e-30))
        assert snr_db >= 60.0, snr_db


class TestPositionDependentTask:
    def test_method_style_task_rejected(self):
        """A Task whose callable sees the node (and thus tell()/time)
        cannot be compiled: the scan would freeze its position at the
        construction-time value and silently corrupt the data."""
        from baseband_tasks_tpu import Task

        def with_handle(fh, data):
            return data * fh.tell()

        tail = Square(Task(noise(67), with_handle))
        with pytest.raises(ValueError, match="method-style"):
            CompiledPipeline(tail)

    def test_plain_function_task_compiles(self):
        from baseband_tasks_tpu import Task

        tail = Square(Task(noise(71), lambda data: data * 2.0))
        cp = CompiledPipeline(tail)
        out = np.asarray(cp.run_blocks(cp.read_source_blocks(2)))
        tail.seek(0)
        np.testing.assert_allclose(out, np.asarray(tail.read(len(out))),
                                   rtol=1e-5, atol=1e-5)


class TestCompiledShaping:
    """GetSlice compiles to a per-source read offset; sample-shape ops
    (GetItem/Reshape/Transpose) compile as ordinary pure tasks
    (reference shaping.py:231-416)."""

    def test_getslice_midchain(self):
        from baseband_tasks_tpu.shaping import GetSlice

        src = noise(21)
        tail = Square(Channelize(GetSlice(src, slice(96, None)), 16))
        cp = CompiledPipeline(tail)
        assert cp.source_offsets == [96]
        n_blocks = 4
        out = np.asarray(cp.run_blocks(cp.read_source_blocks(n_blocks)))
        tail.seek(0)
        eager = np.asarray(tail.read(len(out)))
        np.testing.assert_allclose(out, eager, rtol=1e-5, atol=1e-5)

    def test_getslice_after_rate_change(self):
        """Slice start in post-Channelize samples maps back through the
        1/16 rate ratio to 3*16 source samples."""
        from baseband_tasks_tpu.shaping import GetSlice

        src = noise(22)
        tail = Square(GetSlice(Channelize(src, 16), slice(3, None)))
        cp = CompiledPipeline(tail)
        assert cp.source_offsets == [48]
        out = np.asarray(cp.run_blocks(cp.read_source_blocks(4)))
        tail.seek(0)
        eager = np.asarray(tail.read(len(out)))
        np.testing.assert_allclose(out, eager, rtol=1e-5, atol=1e-5)

    def test_getslice_nonintegral_start_raises(self):
        from baseband_tasks_tpu import Dechannelize
        from baseband_tasks_tpu.shaping import GetSlice

        src = NoiseGenerator(shape=(1024, 16), start_time=T0,
                             sample_rate=1 * u.kHz, samples_per_frame=64,
                             seed=5, dtype=np.complex64)
        tail = Square(GetSlice(Dechannelize(src), slice(3, None)))
        with pytest.raises(ValueError, match="whole number of source"):
            CompiledPipeline(tail)

    def test_getslice_feeding_absorbed_fold(self):
        from baseband_tasks_tpu.shaping import GetSlice

        f0 = 37.25
        phase = lambda t: u.Quantity((t - T0).sec * f0, u.cycle)
        src = noise(23)
        tail = Fold(Square(Channelize(GetSlice(src, slice(256, None)),
                                      16)), 8, phase, samples_per_frame=1)
        cp = CompiledPipeline(tail)
        n_blocks = ((16384 - 256) // 16) // cp.tail_block
        data, counts = cp.run_reduced(cp.read_source_blocks(n_blocks))
        tail.seek(0)
        eager = tail.read(data.shape[0])
        np.testing.assert_allclose(np.asarray(data), eager,
                                   rtol=1e-5, atol=1e-5)

    def test_sample_shape_ops_compile(self):
        from baseband_tasks_tpu.shaping import (GetItem, Reshape,
                                                Transpose)

        src = NoiseGenerator(shape=(4096, 6), start_time=T0,
                             sample_rate=1 * u.MHz, samples_per_frame=512,
                             seed=9, dtype=np.complex64)
        tail = Square(GetItem(Transpose(Reshape(src, (2, 3)), (2, 1)),
                              (slice(None), 1)))
        cp = CompiledPipeline(tail)
        out = np.asarray(cp.run_blocks(cp.read_source_blocks(3)))
        tail.seek(0)
        eager = np.asarray(tail.read(len(out)))
        np.testing.assert_allclose(out, eager, rtol=1e-5, atol=1e-5)


class TestCompiledStokes:
    def test_power_fold_matches_eager(self):
        """Full-Stokes detection (Power) folds through the compiled path
        exactly like the eager chain (reference functions.py:132-143 +
        integration.py:380-395)."""
        from baseband_tasks_tpu import Power

        f0 = 53.125
        phase = lambda t: u.Quantity((t - T0).sec * f0, u.cycle)
        src = NoiseGenerator(shape=(16384, 2), start_time=T0,
                             sample_rate=1 * u.MHz,
                             samples_per_frame=2048, seed=31,
                             dtype=np.complex64)
        det = Power(Channelize(src, 16), polarization=["X", "Y"])
        assert det.sample_shape == (16, 4)
        tail = Fold(det, 8, phase, samples_per_frame=1)
        cp = CompiledPipeline(tail)
        n_blocks = (16384 // 16) // cp.tail_block
        data, counts = cp.run_reduced(cp.read_source_blocks(n_blocks))
        tail.seek(0)
        eager = tail.read(data.shape[0])
        np.testing.assert_allclose(np.asarray(data), eager,
                                   rtol=1e-5, atol=1e-5)


class TestAbsorbedPhaseIntegrate:
    def test_integrate_in_phase_steps(self):
        """Integrate with a step in cycles (phase-binned integration, not
        folding): bin edges come from the host phase->offset inversion
        (reference integration.py:174-228)."""
        f0 = 11.5  # cycles/s
        phase = lambda t: u.Quantity((t - T0).sec * f0, u.cycle)
        src = noise(29, shape=(16384,), spf=2048, rate=1 * u.kHz)
        tail = Integrate(Square(Channelize(src, 16)),
                         step=u.Quantity(2.0, u.cycle), phase=phase,
                         samples_per_frame=1)
        cp = CompiledPipeline(tail)
        n_blocks = (16384 // 16) // cp.tail_block
        data, counts = cp.run_reduced(cp.read_source_blocks(n_blocks))
        tail.seek(0)
        n = min(data.shape[0], tail.shape[0])
        eager = tail.read(n)
        np.testing.assert_allclose(np.asarray(data)[:n], eager,
                                   rtol=1e-5, atol=1e-5)
