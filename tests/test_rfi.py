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
# The masked=True Integrate/Fold coverage (eager/compiled/sharded/
# StreamRunner) lives in tests/test_masked.py — the feature's own home;
# the excision chain here is just one producer of NaN-flagged cells.
