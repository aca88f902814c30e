"""Blind binary-pulsar search: acceleration search + FFA, sharded.

A pulsar in a compact binary drifts in apparent spin frequency; a plain
FFT search smears its power over ``z = f_dot T^2`` Fourier bins.  This
example runs the two standard recoveries end to end on simulated
detected power, then spreads their trial banks over every available
device:

  detected power time series (pulses at f0, drifting by z_true bins)
    -> FourierDomainAccelSearch     (f, z) matched-filter map
       .harmonic_sum                recover non-sinusoidal pulse power
       .candidates                  thresholded (f, z) detections
    -> FastFoldingSearch            long-period check of the same data
    -> *_sharded                    the same searches on a device mesh
                                    (trial banks spread, zero comm)

Run on CPU:  JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/binary_search.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from jax.sharding import Mesh

from baseband_tasks_tpu.models import (FastFoldingSearch,
                                       FourierDomainAccelSearch)
from baseband_tasks_tpu.utils import units as u

RATE = 1 * u.kHz
N = 1 << 15                     # 32.768 s of detected power at 1 kHz
F0 = 300.0                      # Hz-scale: 300 cycles over the block
Z_TRUE = 12.0                   # drift in Fourier bins over the block
DUTY = 0.1                      # pulse duty cycle


def simulate():
    rng = np.random.default_rng(42)
    t = np.arange(N) / N                      # unit observation
    phase = (F0 * t + 0.5 * Z_TRUE * t ** 2) % 1.0
    pulses = (phase < DUTY).astype(np.float32)
    return pulses + rng.standard_normal(N).astype(np.float32) * 0.5


def main():
    x = simulate()

    # -- acceleration search ------------------------------------------
    search = FourierDomainAccelSearch(N, RATE, z_max=32, z_step=2,
                                      seg_len=1024)
    zmap = np.asarray(search.search(x))
    hmap = search.harmonic_sum(zmap, n_harm=4)
    i, j = np.unravel_index(np.argmax(hmap[16:]), hmap[16:].shape)
    f_hz = (i + 16) * RATE.to_value(u.Hz) / N
    z_found = search.z_values[j]
    print(f"accel search: f = {f_hz:.4f} Hz, z = {z_found:+.0f} bins "
          f"(true {F0 * RATE.to_value(u.Hz) / N:.4f} Hz, {Z_TRUE:+.0f})")
    assert abs(f_hz - F0 * RATE.to_value(u.Hz) / N) < 0.01
    assert abs(z_found - Z_TRUE) <= 2.0

    cands = search.candidates(x, threshold=25.0)
    assert cands, "no candidates above threshold"
    print(f"candidates: {len(cands)}, strongest at "
          f"{cands[0][0].to_value(u.Hz):.4f} Hz, z={cands[0][1]:+.0f}, "
          f"power {cands[0][2]:.0f}")

    # -- FFA cross-check at the fundamental period --------------------
    p_samples = int(round(N / F0))            # ~109 samples/period
    ffa = FastFoldingSearch(p_samples, N, sample_rate=RATE)
    ffa_cands = ffa.candidates(x, threshold=8.0)
    if ffa_cands:
        print(f"ffa: best period {ffa_cands[0]['period']} "
              f"(S/N {ffa_cands[0]['snr']:.1f})")

    # -- the same searches, sharded over every device -----------------
    devs = np.asarray(jax.devices())
    mesh = Mesh(devs, ("bank",))
    zmap_s = np.asarray(search.search_sharded(x, mesh, axis_name="bank"))
    np.testing.assert_allclose(zmap_s, zmap, rtol=1e-4, atol=1e-4)
    batch = np.stack([x] * max(len(devs), 2))     # e.g. DM trials/beams
    snr_s = np.asarray(ffa.snr_sharded(batch, mesh, axis_name="bank"))
    assert snr_s.shape == (batch.shape[0], ffa.m)
    print(f"sharded over {len(devs)} device(s): accel map equal, "
          f"FFA batch {snr_s.shape} - binary search closed OK")


if __name__ == "__main__":
    main()
