"""Fast Folding Algorithm (beyond the reference, which has no period
search).  The stage combination is pinned by the m=2 closed form, the
s=0 trial must equal the plain column sum, and a drifting pulse train
must be recovered coherently at the right trial period."""

import numpy as np
import pytest

from baseband_tasks_tpu.models.ffa import FastFoldingSearch, ffa_fold
from baseband_tasks_tpu.utils import units as u


def rot_back(row, k):
    """rot(b, k)[phi] = b[(phi + k) mod p] — the module's convention."""
    return np.roll(row, -k)


class TestFoldCore:
    def test_m2_closed_form(self):
        rng = np.random.default_rng(1)
        p = 16
        x = rng.standard_normal((2 * p,)).astype(np.float32)
        out = np.asarray(ffa_fold(x, p))
        r0, r1 = x[:p], x[p:]
        np.testing.assert_allclose(out[0], r0 + r1, rtol=1e-6)
        np.testing.assert_allclose(out[1], r0 + rot_back(r1, 1), rtol=1e-6)

    def test_s0_is_column_sum(self):
        rng = np.random.default_rng(2)
        p, m = 21, 16
        x = rng.standard_normal((m * p,)).astype(np.float32)
        out = np.asarray(ffa_fold(x, p))
        assert out.shape == (m, p)
        np.testing.assert_allclose(out[0], x.reshape(m, p).sum(0),
                                   rtol=1e-5, atol=1e-5)

    def test_total_power_conserved(self):
        rng = np.random.default_rng(3)
        p, m = 32, 8
        x = rng.standard_normal((m * p,)).astype(np.float32)
        out = np.asarray(ffa_fold(x, p))
        # every trial is a sum of all m*p samples, each used once
        np.testing.assert_allclose(out.sum(-1), np.full(m, x.sum()),
                                   rtol=1e-5)

    @pytest.mark.parametrize("s_true", [0, 3, 7, 15])
    def test_drifting_pulse_recovered(self, s_true):
        p, m = 64, 16
        amp = 5.0
        x = np.zeros((m * p,), np.float32)
        # pulse drifts by s_true samples over the m segments: period
        # p + s_true/(m-1); segment i has its pulse LATER by ~i*dp
        dp = s_true / (m - 1)
        for i in range(m):
            x[i * p + (3 + int(round(i * dp))) % p] = amp
        out = np.asarray(ffa_fold(x, p))
        peaks = out.max(-1)
        best = int(peaks.argmax())
        # the right trial recovers (nearly) the coherent sum; rounding
        # in the stage ladder may split at most a little power
        assert abs(best - s_true) <= 1
        assert peaks[best] >= 0.85 * m * amp
        # a far-off trial smears the pulse across phases
        far = (s_true + m // 2) % m
        assert peaks[far] <= 0.6 * m * amp

    def test_batch_axis(self):
        rng = np.random.default_rng(4)
        p, m = 16, 8
        x = rng.standard_normal((3, m * p)).astype(np.float32)
        out = np.asarray(ffa_fold(x, p))
        assert out.shape == (3, m, p)
        one = np.asarray(ffa_fold(x[1], p))
        np.testing.assert_allclose(out[1], one, rtol=1e-6)

    def test_crop_to_pow2_periods(self):
        p = 10
        x = np.ones((p * 13,), np.float32)   # 13 periods -> m=8 used
        out = np.asarray(ffa_fold(x, p))
        assert out.shape == (8, p)

    def test_too_short_raises(self):
        with pytest.raises(ValueError, match="at least 2 periods"):
            ffa_fold(np.ones(17, np.float32), 16)


class TestSearch:
    def _pulse_train(self, p, m, dp, width=2, amp=1.0, noise=1.0, seed=5):
        rng = np.random.default_rng(seed)
        x = noise * rng.standard_normal((m * p,)).astype(np.float32)
        for i in range(m):
            ph = (5 + int(round(i * dp))) % p
            for k in range(width):
                x[i * p + (ph + k) % p] += amp
        return x

    def test_snr_flat_on_noise(self):
        rng = np.random.default_rng(6)
        f = FastFoldingSearch(64, 64 * 32)
        s = np.asarray(f.snr(rng.standard_normal(64 * 32)
                             .astype(np.float32)))
        assert s.shape == (32,)
        assert s.max() < 7.0          # no false alarm at survey threshold

    def test_candidate_found_at_right_period(self):
        p, m = 64, 32
        s_true = 9
        x = self._pulse_train(p, m, s_true / (m - 1), amp=1.5)
        f = FastFoldingSearch(p, p * m, sample_rate=1 * u.kHz)
        cands = f.candidates(x, threshold=7.0)
        assert cands, "pulse train not detected"
        best = cands[0]
        assert abs(best["trial"] - s_true) <= 1
        expect = (p + s_true / (m - 1)) / 1e3
        assert abs(best["period"].to_value(u.s) - expect) < 2e-3 / (m - 1)

    def test_trial_periods_samples(self):
        f = FastFoldingSearch(100, 100 * 8)
        ps = f.trial_periods
        assert ps[0] == 100 and abs(ps[-1] - 101) < 1e-9

    def test_validation(self):
        with pytest.raises(ValueError, match="at least 2 samples"):
            FastFoldingSearch(1, 100)
        with pytest.raises(ValueError, match="fewer than 2"):
            FastFoldingSearch(64, 100)
        f = FastFoldingSearch(16, 16 * 4)
        with pytest.raises(ValueError, match="single time series"):
            f.candidates(np.zeros((2, 64), np.float32))


class TestSurvey:
    def _train(self, period, n, width=2, amp=1.2, seed=8):
        rng = np.random.default_rng(seed)
        x = rng.standard_normal(n).astype(np.float32)
        ph = 3.0
        while ph < n:
            for k in range(width):
                if int(ph) + k < n:
                    x[int(ph) + k] += amp
            ph += period
        return x

    @pytest.mark.parametrize("period,p_range",
                             [(37.4, (32, 64)), (75.25, (32, 128))])
    def test_survey_finds_period_across_octaves(self, period, p_range):
        from baseband_tasks_tpu.models.ffa import ffa_survey
        x = self._train(period, 1 << 13)
        cands = ffa_survey(x, *p_range, threshold=7.0)
        assert cands, f"period {period} not detected"
        # an exact sub-/harmonic fold is phase-coherent too (the classic
        # FFA ambiguity), so assert the candidate CLOSEST to the truth
        # is present and on target, not that it ranks first
        best = min(cands, key=lambda c: abs(c["period"] - period))
        assert abs(best["period"] - period) / period < 0.02, \
            (best, period)

    def test_survey_units_and_validation(self):
        from baseband_tasks_tpu.models.ffa import ffa_survey
        from baseband_tasks_tpu.utils import units as u
        x = self._train(40.0, 1 << 13)
        cands = ffa_survey(x, 32, 64, sample_rate=1 * u.kHz,
                           threshold=7.0)
        assert cands and abs(cands[0]["period"].to_value(u.s)
                             - 0.040) < 0.001
        with pytest.raises(ValueError, match="single time series"):
            ffa_survey(np.zeros((2, 64), np.float32), 8, 16)
        with pytest.raises(ValueError, match="p_min"):
            ffa_survey(x, 64, 32)
