"""Tied-array beamforming with a correlator-derived calibration loop.

A 4-station array observes a common 'sky' with independent receiver
noise and unknown per-station complex gains (geometric delays — handled
by the same machinery via ``delays=`` — are zero here to keep the gain
algebra front and centre; tests/test_beamform.py covers the delays).
The pipeline mirrors a real phased-array backend:

  1. correlate a calibrator scan (`fx_correlate`) against the reference
     station to solve the RELATIVE complex gains
     (V_0k = g_0 conj(g_k) S, so r_k = g_k/g_0 comes from
     conj(V_0k / V_00) times the reference autocorrelation's noise
     bias);
  2. invert them into beamforming weights w_k = 1 / (n_st r_k);
  3. form the coherent tied-array beam (`tied_array_beam`).

The figure of merit is the beam's sky purity — the fraction of beam
power correlated with the true sky signal: coherent summation keeps the
signal amplitude while averaging the receiver noise down by n_st, so
the calibrated beam is purer than any single dish; without calibration
the random gain phases partially decohere the signal.

Run on CPU:  JAX_PLATFORMS=cpu python examples/tied_array.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from baseband_tasks_tpu import Channelize, Noise, StreamGenerator
from baseband_tasks_tpu.models import fx_correlate, tied_array_beam
from baseband_tasks_tpu.utils import Time, units as u

T0 = Time("2024-05-05T00:00:00.0")
RATE = 4 * u.MHz
N = 1 << 16
N_CHAN = 64
N_ST = 4
NOISE_AMP = 0.7
RNG = np.random.default_rng(42)

# unknown per-station complex gains (amplitude + phase errors)
GAINS = (RNG.normal(1.0, 0.15, N_ST)
         * np.exp(2j * np.pi * RNG.uniform(-0.5, 0.5, N_ST))
         ).astype(np.complex64)


def station(k, seed=1):
    """Common sky + receiver noise, scaled by the station gain."""
    common = Noise(seed)
    own = Noise(100 + k)
    g = GAINS[k]

    def gen(fh):
        return g * (common(fh) + NOISE_AMP * own(fh))

    return StreamGenerator(gen, (N,), T0, RATE, samples_per_frame=4096,
                           dtype=np.complex64)


def sky_spectra(count):
    """Channelized clean sky, for the purity metric."""
    sky = StreamGenerator(Noise(1), (N,), T0, RATE,
                          samples_per_frame=4096, dtype=np.complex64)
    return np.asarray(Channelize(sky, N_CHAN).read(count))


def purity(beam_spectra, sky):
    """|<B S*>|^2 / (<|B|^2><|S|^2>): fraction of beam power that is
    sky signal."""
    num = np.abs(np.mean(beam_spectra * np.conj(sky))) ** 2
    return float(num / (np.mean(np.abs(beam_spectra) ** 2)
                        * np.mean(np.abs(sky) ** 2)))


def main():
    stations = [station(k) for k in range(N_ST)]

    # -- 1. calibrator scan: visibilities against station 0 -----------
    vis = fx_correlate(stations, N_CHAN, 256,
                       baselines=[(0, k) for k in range(N_ST)])
    v = np.asarray(vis.read(1))[0].mean(axis=1)   # (n_st,) averaged
    # V_00 = |g_0|^2 S (1 + a^2); V_0k = g_0 conj(g_k) S  (k != 0)
    noise_bias = 1.0 + NOISE_AMP ** 2
    r = np.conj(v / v[0]) * noise_bias            # r_k = g_k / g_0
    r[0] = 1.0
    weights = (1.0 / (N_ST * r)).astype(np.complex64)

    # -- 2. beams ------------------------------------------------------
    cal = tied_array_beam(stations, N_CHAN, weights=weights)
    raw = tied_array_beam(stations, N_CHAN)        # uniform weights
    one = tied_array_beam([stations[0]], N_CHAN)

    count = 512
    sky = sky_spectra(count)
    p_cal = purity(np.asarray(cal.read(count)), sky)
    p_raw = purity(np.asarray(raw.read(count)), sky)
    p_one = purity(np.asarray(one.read(count)), sky)

    a2 = NOISE_AMP ** 2
    expect_one = 1.0 / (1 + a2)
    expect_cal = 1.0 / (1 + a2 / N_ST)
    print(f"sky purity, single dish       : {p_one:.3f}  "
          f"(expected {expect_one:.3f})")
    print(f"sky purity, uncalibrated beam : {p_raw:.3f}  "
          f"(noise still averages down, but the random gain phases "
          f"partially decohere the signal)")
    print(f"sky purity, calibrated beam   : {p_cal:.3f}  "
          f"(expected {expect_cal:.3f} — noise averaged down "
          f"{N_ST}x)")
    assert abs(p_one - expect_one) < 0.1
    assert abs(p_cal - expect_cal) < 0.05
    assert p_cal > p_raw and p_cal > p_one
    print("calibration loop closed: correlate -> weights -> beam")


if __name__ == "__main__":
    main()
