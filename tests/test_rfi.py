"""Spectral-kurtosis RFI detection/excision (beyond the reference,
which has no RFI module).  The estimator is pinned to its closed-form
clean-noise statistics (E[SK]=1, Var[SK]=2(d+1)/(n d)) and to the two
canonical contamination signatures: CW (SK < 1) and impulsive (SK > 1)."""

import numpy as np
import pytest

from baseband_tasks_tpu import (Channelize, ExciseSpectralKurtosis,
                                NoiseGenerator, SpectralKurtosis,
                                StreamGenerator)
from baseband_tasks_tpu.rfi import sk_sigma, spectral_kurtosis
from baseband_tasks_tpu.utils import Time, units as u

T0 = Time("2020-01-01")


def noise(shape=(1 << 14, 8), seed=3, dtype=np.complex64):
    return NoiseGenerator(shape=shape, start_time=T0,
                          sample_rate=1 * u.MHz, samples_per_frame=4096,
                          seed=seed, dtype=dtype)


class TestEstimator:
    def test_clean_noise_statistics(self):
        rng = np.random.default_rng(1)
        n, k = 128, 512
        z = (rng.standard_normal((k * n, 4))
             + 1j * rng.standard_normal((k * n, 4))) / np.sqrt(2)
        sk = np.asarray(spectral_kurtosis(np.abs(z) ** 2, n))
        assert sk.shape == (k, 4)
        # E[SK] = 1, sigma = sqrt(4/n); mean of k*4 values ~ sigma/45
        assert abs(sk.mean() - 1.0) < 4 * sk_sigma(n) / np.sqrt(4 * k)
        assert sk.std() == pytest.approx(sk_sigma(n), rel=0.15)

    def test_real_voltage_statistics(self):
        rng = np.random.default_rng(2)
        n, k = 128, 1024
        x = rng.standard_normal((k * n,))
        sk = np.asarray(spectral_kurtosis(x ** 2, n, d=0.5))
        assert abs(sk.mean() - 1.0) < 4 * sk_sigma(n, 0.5) / np.sqrt(k)
        assert sk.std() == pytest.approx(sk_sigma(n, 0.5), rel=0.15)

    def test_cw_depresses_sk(self):
        rng = np.random.default_rng(3)
        n = 256
        z = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
            / np.sqrt(2)
        p_clean = np.abs(z) ** 2
        p_cw = np.abs(z + 10.0) ** 2  # strong constant carrier
        sk_cw = np.asarray(spectral_kurtosis(p_cw, n)).item()
        assert sk_cw < 1 - 3 * sk_sigma(n)
        sk_clean = np.asarray(spectral_kurtosis(p_clean, n)).item()
        assert abs(sk_clean - 1) < 4 * sk_sigma(n)

    def test_impulse_raises_sk(self):
        rng = np.random.default_rng(4)
        n = 256
        z = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
            / np.sqrt(2)
        z[5] += 40.0  # single strong spike
        sk = np.asarray(spectral_kurtosis(np.abs(z) ** 2, n)).item()
        assert sk > 1 + 3 * sk_sigma(n)

    def test_zero_block_is_unflagged(self):
        sk = np.asarray(spectral_kurtosis(np.zeros(64), 64))
        assert sk == pytest.approx(1.0)

    def test_validation(self):
        with pytest.raises(ValueError, match="multiple"):
            spectral_kurtosis(np.ones(100), 64)
        with pytest.raises(ValueError, match="at least 2"):
            spectral_kurtosis(np.ones(64), 1)


class TestSpectralKurtosisTask:
    def test_stream_statistics_and_metadata(self):
        src = noise()
        sk = SpectralKurtosis(src, 256)
        assert sk.shape == (64, 8)
        assert sk.dtype == np.float32
        assert float(sk.sample_rate.to_value(u.kHz)) \
            == pytest.approx(1000 / 256)
        assert abs((sk.start_time - T0).sec) < 1e-12
        out = np.asarray(sk.read(64))
        assert abs(out.mean() - 1.0) < 4 * sk.sigma / np.sqrt(out.size)
        assert out.std() == pytest.approx(sk.sigma, rel=0.2)

    def test_real_input_uses_half_dof(self):
        src = noise(dtype=np.float32, seed=5)
        sk = SpectralKurtosis(src, 256)
        assert sk.sigma == pytest.approx(sk_sigma(256, 0.5))
        out = np.asarray(sk.read(32))
        assert out.std() == pytest.approx(sk.sigma, rel=0.25)


class TestExcise:
    def test_clean_noise_mostly_kept(self):
        src = noise(seed=7)
        ex = ExciseSpectralKurtosis(src, 256, threshold=3.0)
        assert ex.shape == src.shape
        assert ex.sample_rate == src.sample_rate
        src.seek(0)
        data = np.asarray(src.read(1 << 14))
        out = np.asarray(ex.read(1 << 14))
        zeroed = np.all(out.reshape(-1, 256, 8) == 0, axis=1)
        # two-sided 3-sigma false-alarm: ~0.3%; allow generous slack
        assert zeroed.mean() < 0.02
        kept = out != 0
        np.testing.assert_array_equal(out[kept], data[kept])

    def test_contaminated_channel_is_excised(self):
        # One channel carries strong 25%-duty bursts, the rest is clean.
        # (Not 50%: a half-duty square wave is the classic SK blind spot
        # — its SK is ~1 by construction.)
        def burst_fn(handle):
            rng = np.random.default_rng(handle.tell())
            z = ((rng.standard_normal((handle.samples_per_frame, 8))
                  + 1j * rng.standard_normal((handle.samples_per_frame, 8)))
                 / np.sqrt(2)).astype(np.complex64)
            t = handle.tell() + np.arange(handle.samples_per_frame)
            on = ((t // 32) % 4 == 0).astype(np.complex64)
            z[:, 3] += 12.0 * on
            return z

        src = StreamGenerator(burst_fn, shape=(1 << 13, 8),
                              start_time=T0, sample_rate=1 * u.MHz,
                              samples_per_frame=4096,
                              dtype=np.complex64)
        ex = ExciseSpectralKurtosis(src, 256, threshold=3.0)
        out = np.asarray(ex.read(1 << 13))
        blocks = out.reshape(-1, 256, 8)
        zeroed = np.all(blocks == 0, axis=1)
        assert zeroed[:, 3].mean() > 0.9          # RFI channel removed
        # neighbours mostly kept (SK is right-skewed at M=256, so the
        # 3-sigma false-alarm rate sits a few times above the Gaussian
        # 0.3%; bound it loosely)
        assert zeroed[:, :3].mean() < 0.05
        assert zeroed[:, 4:].mean() < 0.05

    def test_partial_tail_block(self):
        src = noise(shape=(1000, 4), seed=9)
        ex = ExciseSpectralKurtosis(src, 256, samples_per_frame=512)
        out = np.asarray(ex.read(1000))  # 3 full blocks + 232 tail
        assert out.shape == (1000, 4)
        # tail judged with its own M: clean noise passes through
        assert not np.all(out[768:] == 0)

    def test_chained_after_channelize(self):
        src = noise(shape=(1 << 14,), seed=11)
        ch = Channelize(src, 64)
        ex = ExciseSpectralKurtosis(ch, 32)
        out = np.asarray(ex.read(128))
        assert out.shape == (128, 64)
        zeroed = np.all(out.reshape(-1, 32, 64) == 0, axis=1)
        assert zeroed.mean() < 0.03

    def test_validation(self):
        src = noise()
        with pytest.raises(ValueError, match="multiple"):
            ExciseSpectralKurtosis(src, 256, samples_per_frame=1000)
        with pytest.raises(ValueError, match="at least 2"):
            ExciseSpectralKurtosis(src, 1)

    def test_compiled_chain_matches_eager(self):
        """Excision inside a compiled scan: the _task_granularity hook
        makes the scan cut the stream on the SK decision-block grid, so
        compiled == eager flag-for-flag."""
        from baseband_tasks_tpu import Square
        from baseband_tasks_tpu.models.compiled import CompiledPipeline

        src = noise(shape=(1 << 14,), seed=21)
        tail = Square(ExciseSpectralKurtosis(Channelize(src, 64), 48))
        cp = CompiledPipeline(tail)
        # 48-spectra decision blocks force 64*48-sample source blocks
        assert cp.block_samples % (64 * 48) == 0
        src.seek(0)
        n_blocks = (1 << 14) // cp.block_samples
        blocks = np.stack([np.asarray(src.read(cp.block_samples))
                           for _ in range(n_blocks)])
        out = np.asarray(cp.run_blocks(blocks))
        tail.seek(0)
        eager = np.asarray(tail.read(len(out)))
        np.testing.assert_allclose(out, eager, rtol=1e-4, atol=1e-4)
        # the excision actually did something in this window
        assert np.any(eager == 0)


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
        from baseband_tasks_tpu import Integrate
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
        from baseband_tasks_tpu import Integrate
        out = Integrate(self._nan_stream(), 1024, average=False).read(4)
        assert np.isnan(out["data"][:, 1]).all()
        assert np.isfinite(out["data"][:, 0]).all()

    def test_fold_masked(self):
        from baseband_tasks_tpu import Fold
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
        from baseband_tasks_tpu import Integrate, Square

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
        from baseband_tasks_tpu import Fold, Square
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
        from baseband_tasks_tpu import Fold, Square
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
        from baseband_tasks_tpu import Fold, Square
        from baseband_tasks_tpu.models import StreamRunner
        from baseband_tasks_tpu.models.compiled import CompiledPipeline
        from baseband_tasks_tpu.utils import units as u
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
