"""Masked (per-cell NaN-excluding) Integrate/Fold semantics.

Home for the ``masked=True`` coverage across every execution path —
eager, CompiledPipeline, ShardedPipeline, StreamRunner — moved here
from test_rfi.py so the feature's own module owns its tests (the RFI
excision chain is just one producer of NaN-flagged cells).

Convention pinned here: a fully-flagged cell (count == 0) averages to
NaN in every path — not a silent 0.0 masquerading as measured zero
power (advisor finding, round 4).
"""

import numpy as np
import pytest

from baseband_tasks_tpu import (Channelize, ExciseSpectralKurtosis,
                                Fold, Integrate, NoiseGenerator, Square,
                                StreamGenerator)
from baseband_tasks_tpu.utils import Time, units as u

T0 = Time("2020-01-01")


def noise(shape=(1 << 14, 8), seed=3, dtype=np.complex64):
    return NoiseGenerator(shape=shape, start_time=T0,
                          sample_rate=1 * u.MHz, samples_per_frame=4096,
                          seed=seed, dtype=dtype)


class TestMaskedIntegration:
    """fill=nan excision + Integrate/Fold(masked=True): flagged cells
    are excluded per cell instead of biasing averages low."""

    def _nan_stream(self, n=4096, spf=512, nchan=4):
        # channel 1 is NaN in the first half of every frame
        def fn(sh):
            i0 = sh.tell()
            rng = np.random.default_rng(1000 + i0)
            d = rng.standard_normal((spf, nchan)).astype(np.float32) + 3.0
            d[:spf // 2, 1] = np.nan
            return d

        return StreamGenerator(fn, shape=(n, nchan), start_time=T0,
                               sample_rate=1 * u.kHz,
                               samples_per_frame=spf, dtype=np.float32)

    def test_integrate_masked_counts_and_mean(self):
        sh = self._nan_stream()
        out = Integrate(sh, 1024, masked=True, average=False).read(4)
        # counts carry the sample shape; channel 1 kept only half
        assert out["count"].shape == (4, 4)
        np.testing.assert_array_equal(out["count"][:, 0], 1024)
        np.testing.assert_array_equal(out["count"][:, 1], 512)
        # sums exclude the NaNs: the average is ~3, not ~1.5
        mean = out["data"] / out["count"]
        assert np.all(np.abs(mean - 3.0) < 0.2)
        # averaged read agrees
        sh2 = self._nan_stream()
        avg = Integrate(sh2, 1024, masked=True).read(4)
        np.testing.assert_allclose(np.asarray(avg), mean, rtol=1e-6)

    def test_unmasked_would_be_nan(self):
        out = Integrate(self._nan_stream(), 1024, average=False).read(4)
        assert np.isnan(out["data"][:, 1]).all()
        assert np.isfinite(out["data"][:, 0]).all()

    def test_fold_masked(self):
        f0 = 125.0  # cycles/s at 1 kHz sampling -> 8 samples per cycle
        phase = lambda t: u.Quantity((t - T0).sec * f0, u.cycle)  # noqa
        out = Fold(self._nan_stream(), 8, phase,
                   u.Quantity(1.024, u.s), masked=True,
                   average=False).read(4)
        assert out["count"].shape == (4, 8, 4)
        # per-channel totals over phase bins: channel 1 kept only half
        # (per-bin counts jitter with phase-edge rounding)
        np.testing.assert_array_equal(out["count"].sum(1)[:, 0], 1024)
        np.testing.assert_array_equal(out["count"].sum(1)[:, 1], 512)
        mean = out["data"] / np.maximum(out["count"], 1)
        assert np.all(np.abs(mean - 3.0) < 0.5)

    def test_excise_fill_nan_end_to_end(self):
        """Channelize -> Excise(fill=nan) -> Square -> masked Integrate:
        the contaminated channel's average stays at the thermal level
        instead of being biased low by zero-fill."""

        def tone_plus_noise(sh):
            i0 = sh.tell()
            rng = np.random.default_rng(7 + i0)
            d = (rng.standard_normal((4096, 2))
                 + 1j * rng.standard_normal((4096, 2))).astype(np.complex64)
            # strong CW at the center of channel 5 of 16, pol 0,
            # present only in every other 1024-sample stretch
            t = i0 + np.arange(4096)
            on = ((t // 1024) % 2 == 0)
            d[:, 0] += (8.0 * on * np.exp(2j * np.pi * (5 / 16) * t)
                        ).astype(np.complex64)
            return d

        src = StreamGenerator(tone_plus_noise, shape=(1 << 15, 2),
                              start_time=T0, sample_rate=1 * u.MHz,
                              samples_per_frame=4096,
                              dtype=np.complex64)
        chain = Square(ExciseSpectralKurtosis(
            Channelize(src, 16), 64, threshold=3.0, fill=np.nan))
        out = Integrate(chain, 128, masked=True, average=False).read(8)
        counts = out["count"]
        assert counts.shape == (8, 16, 2)
        # the CW channel lost blocks; a quiet channel kept ~everything
        assert counts[..., 5, 0].sum() < 0.8 * counts[..., 3, 0].sum()
        mean = out["data"] / np.maximum(counts, 1)
        # masked average of the kept cells stays near the thermal power
        # (2 per channelized complex sample for unit-variance noise,
        # scaled by the unnormalized FFT's n=16)
        thermal = np.median(mean[..., 3, :])
        assert np.abs(np.median(mean[..., 5, 0]) / thermal - 1) < 0.25

    def test_compiled_masked_fold_matches_eager(self):
        from baseband_tasks_tpu.models.compiled import CompiledPipeline
        f0 = 123.456
        phase = lambda t: u.Quantity((t - T0).sec * f0, u.cycle)  # noqa

        def make():
            src = noise(shape=(1 << 15,), seed=11)
            chain = Square(ExciseSpectralKurtosis(
                Channelize(src, 16), 32, threshold=2.5, fill=np.nan))
            return Fold(chain, 8, phase, u.Quantity(2048 * 16 / 1e6, u.s),
                        samples_per_frame=1, masked=True, average=False)

        tail = make()
        ref = tail.read()
        cp = CompiledPipeline(make())
        blocks = np.asarray(cp.read_source_blocks(
            (1 << 15) // cp.block_samples))
        sums, counts = cp.run_fn(blocks.shape[0])(blocks)
        assert np.asarray(counts).shape == ref["count"].shape
        np.testing.assert_array_equal(np.asarray(counts)[1:-1],
                                      ref["count"][1:-1])
        np.testing.assert_allclose(np.asarray(sums)[1:-1],
                                   ref["data"][1:-1], rtol=1e-4, atol=1e-3)

    def test_sharded_masked_matches_single_device(self):
        import jax
        from baseband_tasks_tpu.models.compiled import CompiledPipeline
        from baseband_tasks_tpu.models.sharded import ShardedPipeline
        from jax.sharding import Mesh
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("need 8 devices")
        f0 = 123.456
        phase = lambda t: u.Quantity((t - T0).sec * f0, u.cycle)  # noqa
        src = noise(shape=(1 << 16,), seed=13)
        chain = Square(ExciseSpectralKurtosis(
            Channelize(src, 16), 32, threshold=2.5, fill=np.nan))
        tail = Fold(chain, 8, phase, u.Quantity(4096 * 16 / 1e6, u.s),
                    samples_per_frame=1, masked=True, average=False)
        cp = CompiledPipeline(tail)
        blocks = np.asarray(cp.read_source_blocks(8))
        ref = cp.run_blocks(blocks)
        got = ShardedPipeline(cp, Mesh(np.asarray(devs[:8]),
                                       ("time",))).run_blocks(blocks)
        np.testing.assert_array_equal(np.asarray(got[1]),
                                      np.asarray(ref[1]))
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                                   rtol=1e-6, atol=1e-6)

    def test_streamrunner_masked_matches_eager(self):
        """StreamRunner's absorbed reduction must honor masked=True
        (code-review finding: it summed NaNs and counted per row)."""
        from baseband_tasks_tpu.models import StreamRunner
        from baseband_tasks_tpu.models.compiled import CompiledPipeline
        f0 = 123.456
        phase = lambda t: u.Quantity((t - T0).sec * f0, u.cycle)  # noqa

        def make():
            src = noise(shape=(1 << 15,), seed=21)
            chain = Square(ExciseSpectralKurtosis(
                Channelize(src, 16), 32, threshold=2.5, fill=np.nan))
            return Fold(chain, 8, phase,
                        u.Quantity(2048 * 16 / 1e6, u.s),
                        samples_per_frame=1, masked=True, average=False)

        ref = make().read()
        cp = CompiledPipeline(make())
        runner = StreamRunner(cp)
        sums, counts = runner.run((1 << 15) // cp.block_samples)
        assert np.asarray(counts).shape == ref["count"].shape
        np.testing.assert_array_equal(np.asarray(counts)[1:-1],
                                      ref["count"][1:-1])
        assert np.isfinite(np.asarray(sums)).all()
        np.testing.assert_allclose(np.asarray(sums)[1:-1],
                                   ref["data"][1:-1], rtol=1e-4,
                                   atol=1e-3)


class TestFullyFlaggedCells:
    """count == 0 cells average to NaN, in every execution path."""

    def _dead_channel_stream(self, n=4096, spf=512, nchan=4):
        # channel 2 is NaN EVERYWHERE: no valid sample ever lands in it
        def fn(sh):
            i0 = sh.tell()
            rng = np.random.default_rng(50 + i0)
            d = rng.standard_normal((spf, nchan)).astype(np.float32) + 3.0
            d[:, 2] = np.nan
            return d

        return StreamGenerator(fn, shape=(n, nchan), start_time=T0,
                               sample_rate=1 * u.kHz,
                               samples_per_frame=spf, dtype=np.float32)

    def test_eager_integrate_nan(self):
        avg = np.asarray(Integrate(self._dead_channel_stream(), 1024,
                                   masked=True).read(4))
        assert np.isnan(avg[:, 2]).all()
        assert np.isfinite(avg[:, [0, 1, 3]]).all()
        # unaveraged read still reports sum 0 / count 0 for the cell
        out = Integrate(self._dead_channel_stream(), 1024, masked=True,
                        average=False).read(4)
        np.testing.assert_array_equal(out["count"][:, 2], 0)
        np.testing.assert_array_equal(out["data"][:, 2], 0.0)

    def test_eager_fold_nan(self):
        f0 = 125.0
        phase = lambda t: u.Quantity((t - T0).sec * f0, u.cycle)  # noqa
        avg = np.asarray(Fold(self._dead_channel_stream(), 8, phase,
                              u.Quantity(1.024, u.s), masked=True).read(4))
        assert np.isnan(avg[..., 2]).all()
        assert np.isfinite(avg[..., 0]).all()

    def test_compiled_run_reduced_nan(self):
        from baseband_tasks_tpu.models.compiled import CompiledPipeline
        # ~81 samples/cycle at 1 MHz: every phase bin fills in each
        # 4096-sample fold step, so only the dead channel goes NaN
        f0 = 12345.6
        phase = lambda t: u.Quantity((t - T0).sec * f0, u.cycle)  # noqa

        def nan_chan(sh):
            i0 = sh.tell()
            rng = np.random.default_rng(80 + i0)
            d = rng.standard_normal((4096, 4)).astype(np.float32) + 1.0
            d[:, 3] = np.nan
            return d

        src = StreamGenerator(nan_chan, shape=(1 << 14, 4), start_time=T0,
                              sample_rate=1 * u.MHz,
                              samples_per_frame=4096, dtype=np.float32)
        tail = Fold(Square(src), 8, phase, u.Quantity(4096 / 1e6, u.s),
                    samples_per_frame=1, masked=True)
        cp = CompiledPipeline(tail, block_samples=4096)
        blocks = np.asarray(cp.read_source_blocks(4))
        out, counts = cp.run_reduced(blocks)
        out, counts = np.asarray(out), np.asarray(counts)
        np.testing.assert_array_equal(counts[..., 3], 0)
        assert np.isnan(out[..., 3]).all()
        assert np.isfinite(out[..., 0]).all()
        # matches the eager averaged read bin for bin
        ref = np.asarray(tail.read())
        np.testing.assert_array_equal(np.isnan(out), np.isnan(ref))
        np.testing.assert_allclose(out[np.isfinite(out)],
                                   ref[np.isfinite(ref)], rtol=1e-4,
                                   atol=1e-3)
