"""DM-trial search: a dispersed pulse must peak at its own trial DM and
at the correct (reference-frequency) arrival time."""

import numpy as np
import pytest

from baseband_tasks_tpu.models import DMTrialSearch
from baseband_tasks_tpu import DispersionMeasure
from baseband_tasks_tpu.utils import units as u


def dispersed_pulse(dm_true, freq_mhz, rate_hz, n, t0, width=2.0,
                    ref=None):
    """Per-channel Gaussian pulses delayed by the dispersion law."""
    dm = DispersionMeasure(dm_true)
    freq = u.Quantity(freq_mhz, u.MHz)
    ref = ref if ref is not None else u.Quantity(freq_mhz.max(), u.MHz)
    tau = dm.time_delay(freq, ref).to_value(u.s) * rate_hz
    t = np.arange(n)[:, None]
    prof = np.exp(-0.5 * ((t - (t0 + tau[None, :])) / width) ** 2)
    return prof.astype(np.float32)


class TestDMTrialSearch:
    def setup_method(self):
        self.freq = np.linspace(1400.0, 1500.0, 64)
        self.rate = 1000.0
        self.trials = np.linspace(0.0, 100.0, 41)  # includes 60.0
        self.n = 4096

    def test_peak_at_true_dm(self):
        dm_true = 60.0
        s = DMTrialSearch(u.Quantity(self.freq, u.MHz),
                          u.Quantity(self.rate, u.Hz),
                          self.trials, self.n)
        power = dispersed_pulse(dm_true, self.freq, self.rate, self.n,
                                t0=500.0)
        out = np.asarray(s.search(power))
        assert out.shape == (self.n, len(self.trials))
        valid = out[:self.n - s.max_delay_samples]
        t_peak, j_peak = np.unravel_index(np.argmax(valid), valid.shape)
        assert self.trials[j_peak] == pytest.approx(dm_true, abs=2.6)
        # at the right trial, the pulse lands at the reference-frequency
        # arrival time t0
        assert abs(t_peak - 500) <= 2
        # detection contrast: peak trial much brighter than DM=0
        j0 = 0
        assert valid[:, j_peak].max() > 3 * valid[:, j0].max()

    def test_zero_dm_pulse(self):
        s = DMTrialSearch(u.Quantity(self.freq, u.MHz),
                          u.Quantity(self.rate, u.Hz),
                          self.trials, self.n)
        power = dispersed_pulse(0.0, self.freq, self.rate, self.n,
                                t0=1000.0)
        out = np.asarray(s.search(power))
        valid = out[:self.n - s.max_delay_samples]
        t_peak, j_peak = np.unravel_index(np.argmax(valid), valid.shape)
        assert j_peak == 0
        assert abs(t_peak - 1000) <= 2

    def test_fractional_shift_beats_rounding(self):
        """The FFT phase shifts realign fractional delays exactly: the
        recovered peak amplitude approaches n_chan x single-channel."""
        dm_true = 37.5
        trials = np.asarray([37.5])
        s = DMTrialSearch(u.Quantity(self.freq, u.MHz),
                          u.Quantity(self.rate, u.Hz), trials, self.n)
        power = dispersed_pulse(dm_true, self.freq, self.rate, self.n,
                                t0=300.0, width=1.0)
        out = np.asarray(s.search(power))[:self.n - s.max_delay_samples]
        # each channel contributes a unit-peak Gaussian; perfect
        # realignment sums to ~64
        assert out.max() > 0.9 * 64

    def test_stream_interface(self):
        from baseband_tasks_tpu import StreamGenerator
        from baseband_tasks_tpu.utils import Time
        import jax.numpy as jnp
        dm_true = 60.0
        n_total = 12288
        power_full = dispersed_pulse(dm_true, self.freq, self.rate,
                                     n_total, t0=6000.0)

        def f(sh):
            o = sh.tell()
            m = min(sh.samples_per_frame, sh.shape[0] - o)
            return jnp.asarray(power_full[o:o + m])

        sh = StreamGenerator(f, (n_total, 64),
                             Time("2020-01-01T00:00:00.0"),
                             u.Quantity(self.rate, u.Hz),
                             samples_per_frame=2048, dtype=np.float32)
        s = DMTrialSearch(u.Quantity(self.freq, u.MHz),
                          u.Quantity(self.rate, u.Hz),
                          self.trials, self.n)
        out = s.search_stream(sh)
        assert out.shape[0] >= n_total - self.n
        t_peak, j_peak = np.unravel_index(np.argmax(out), out.shape)
        assert self.trials[j_peak] == pytest.approx(dm_true, abs=2.6)
        assert abs(t_peak - 6000) <= 2

    def test_rejects_too_short_block(self):
        with pytest.raises(ValueError, match="maximum trial delay"):
            DMTrialSearch(u.Quantity(self.freq, u.MHz),
                          u.Quantity(self.rate, u.Hz),
                          [2000.0], 512)

    def test_detect_boxcar_snr(self):
        """A wide (8-sample) dispersed pulse must be detected with the
        matching boxcar at the right trial and time, at high S/N."""
        dm_true = 60.0
        s = DMTrialSearch(u.Quantity(self.freq, u.MHz),
                          u.Quantity(self.rate, u.Hz),
                          self.trials, self.n)
        rng = np.random.default_rng(3)
        power = dispersed_pulse(dm_true, self.freq, self.rate, self.n,
                                t0=700.0, width=4.0) * 0.5
        power += rng.standard_normal(power.shape).astype(np.float32) * 0.3
        snr, bw = s.detect(power)
        t, j = np.unravel_index(np.argmax(snr), snr.shape)
        assert self.trials[j] == pytest.approx(dm_true, abs=2.6)
        assert abs(t - 700) <= 12          # boxcar start near the pulse
        assert snr[t, j] > 8.0             # strong detection
        assert bw[t, j] >= 4               # picked a matched-width boxcar

    def test_candidates_cluster_two_pulses(self):
        """Two pulses at different times/DMs come back as exactly two
        clustered candidates, strongest first, each absorbing its own
        neighbourhood of threshold crossings."""
        s = DMTrialSearch(u.Quantity(self.freq, u.MHz),
                          u.Quantity(self.rate, u.Hz),
                          self.trials, self.n)
        rng = np.random.default_rng(5)
        power = (dispersed_pulse(60.0, self.freq, self.rate, self.n,
                                 t0=700.0, width=4.0) * 0.8
                 + dispersed_pulse(20.0, self.freq, self.rate, self.n,
                                   t0=2000.0, width=2.0) * 0.4)
        power += rng.standard_normal(power.shape).astype(np.float32) * 0.3
        cands = s.candidates(power, threshold=8.0)
        assert len(cands) == 2
        assert cands[0]["snr"] >= cands[1]["snr"]
        # the S/N-peak trial can sit a few steps off the true DM
        # (boxcar widening vs smearing trade); DM *accuracy* is pinned
        # by test_peak_at_true_dm — here we check the clustering
        by_dm = sorted(cands, key=lambda c: c["dm"])
        assert by_dm[0]["dm"] == pytest.approx(20.0, abs=10.0)
        assert abs(by_dm[0]["time_sample"] - 2000) <= 12
        assert by_dm[1]["dm"] == pytest.approx(60.0, abs=10.0)
        assert abs(by_dm[1]["time_sample"] - 700) <= 12
        assert all(c["n_hits"] >= 1 for c in cands)

    def test_candidates_empty_below_threshold(self):
        s = DMTrialSearch(u.Quantity(self.freq, u.MHz),
                          u.Quantity(self.rate, u.Hz),
                          self.trials, self.n)
        rng = np.random.default_rng(6)
        noise = rng.standard_normal((self.n, 64)).astype(np.float32)
        assert s.candidates(noise, threshold=12.0) == []
