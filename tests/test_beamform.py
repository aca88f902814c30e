"""Tied-array beamforming (models/beamform.py): coherent-gain physics,
delay alignment through the shared correlator machinery, incoherent
mode, and weight validation."""

import numpy as np
import pytest

import jax.numpy as jnp

from baseband_tasks_tpu import (Noise, NoiseGenerator, SetAttribute,
                                StreamGenerator)
from baseband_tasks_tpu.models import (BeamformStations, fx_correlate,
                                       tied_array_beam)
from baseband_tasks_tpu.utils import Time, units as u

START = Time("2018-01-01T00:00:00.000000000")
RATE = 1 * u.MHz
N = 1 << 14
N_CHAN = 16


def sky(seed=4):
    return NoiseGenerator(shape=(N,), start_time=START, sample_rate=RATE,
                          samples_per_frame=4096, seed=seed,
                          dtype=np.complex64)


def noisy_station(sky_seed, noise_seed, snr_amp=1.0):
    """Common sky signal + independent receiver noise."""
    common = Noise(sky_seed)
    own = Noise(noise_seed)

    def gen(fh):
        return snr_amp * common(fh) + own(fh)

    return StreamGenerator(gen, (N,), START, RATE,
                           samples_per_frame=4096, dtype=np.complex64)


class TestBeamformStations:
    def test_coherent_sum_identity(self):
        """Identical stations, uniform weights: beam == one station."""
        beam = tied_array_beam([sky(), sky()], N_CHAN)
        one = tied_array_beam([sky()], N_CHAN)
        a = np.asarray(beam.read(64))
        b = np.asarray(one.read(64))
        assert a.shape == (64, N_CHAN)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_coherent_gain_over_incoherent(self):
        """4 stations with independent noise: the coherent beam's
        signal-to-noise (power ratio vs a no-signal beam) improves on a
        single dish ~n_st times; incoherent improves the variance but
        not the per-spectrum mean power ratio."""
        n_st = 4
        stations = [noisy_station(1, 10 + k) for k in range(n_st)]
        silent = [noisy_station(1, 10 + k, snr_amp=0.0)
                  for k in range(n_st)]
        coh = tied_array_beam(stations, N_CHAN)
        coh0 = tied_array_beam(silent, N_CHAN)
        p = np.abs(np.asarray(coh.read(512))) ** 2
        p0 = np.abs(np.asarray(coh0.read(512))) ** 2
        # signal+noise over noise-only: 1 + n_st * (s/n) with s/n = 1
        ratio = p.mean() / p0.mean()
        assert 0.8 * (1 + n_st) < ratio < 1.2 * (1 + n_st)

    def test_incoherent_mode(self):
        n_st = 3
        stations = [noisy_station(1, 20 + k) for k in range(n_st)]
        inc = tied_array_beam(stations, N_CHAN, mode="incoherent")
        assert inc.dtype.kind == "f"
        p = np.asarray(inc.read(256))
        # uniform 1/n weights: mean detected power == one station's
        # mean power (signal 1 + noise 1 per component -> 2 * n_chan)
        assert abs(p.mean() / (2 * 2 * N_CHAN) - 1) < 0.15

    def test_delay_alignment_recovers_coherence(self):
        """A 5.25-sample relative delay destroys coherence unless
        compensated (same machinery as fx_correlate)."""
        delay = 5.25
        s0 = SetAttribute(sky(), start_time=START)
        s1 = SetAttribute(sky(), start_time=START + delay / RATE)
        delays = [0 * u.s, delay / RATE]
        good = tied_array_beam([s0, s1], N_CHAN, delays=delays,
                               method="phase")
        # mis-compensating by 2.5 samples still aligns the stack grid
        # but decoheres the channels (sinc(2.5) ~ 0.13 mean phasor)
        bad = tied_array_beam([s0, s1], N_CHAN,
                              delays=[0 * u.s, (delay - 2.5) / RATE],
                              method="phase")
        pg = np.abs(np.asarray(good.read(128))) ** 2
        pb = np.abs(np.asarray(bad.read(128))) ** 2
        # aligned: |x + x|^2 = 4 |x|^2 * (1/2)^2 = |x|^2; misaligned
        # channels decohere by the fractional-delay phase spread
        single = np.abs(np.asarray(
            tied_array_beam([sky()], N_CHAN).read(128))) ** 2
        assert pg.mean() > 0.95 * single.mean()
        assert pb.mean() < 0.75 * single.mean()

    def test_per_channel_weights_and_validation(self):
        w = np.ones((2, N_CHAN), np.complex64) * 0.5
        beam = tied_array_beam([sky(), sky()], N_CHAN, weights=w)
        one = tied_array_beam([sky()], N_CHAN)
        np.testing.assert_allclose(np.asarray(beam.read(32)),
                                   np.asarray(one.read(32)),
                                   rtol=1e-5, atol=1e-5)
        stacked_like = tied_array_beam([sky(), sky()], N_CHAN)
        with pytest.raises(ValueError, match="stations"):
            tied_array_beam([sky(), sky()], N_CHAN,
                            weights=np.ones(3))
        with pytest.raises(ValueError, match="stations"):
            tied_array_beam([sky(), sky()], N_CHAN, weights=0.25)
        with pytest.raises(ValueError, match="real"):
            tied_array_beam([sky(), sky()], N_CHAN,
                            weights=np.ones(2, np.complex64),
                            mode="incoherent")
        assert stacked_like.shape[1] == N_CHAN

    def test_beam_feeds_correlator_consistency(self):
        """Autocorrelation of the 2-station coherent beam equals the
        (0,0)+(0,1)+(1,0)+(1,1) visibility combination / 4."""
        stations = [noisy_station(1, 30), noisy_station(1, 31)]
        beam = tied_array_beam(stations, N_CHAN)
        bp = (np.abs(np.asarray(beam.read(256))) ** 2).mean(0)
        vis = fx_correlate(stations, N_CHAN, 256, average=True)
        v = np.asarray(vis.read(1))[0]
        # packed upper triangle: (0,0), (0,1), (1,1)
        combo = (v[0].real + v[2].real + 2 * v[1].real) / 4.0
        np.testing.assert_allclose(bp, combo, rtol=0.05, atol=0.1)
