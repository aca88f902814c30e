"""Production-path example: compile a whole chain (dedisperse -> detect
-> fold) into ONE jitted scan and run it over stacked source blocks.

The lazy Stream API (examples/pulsar_pipeline.py) drives each node from
the host per frame — right for exploration.  For throughput, wrap the
same chain in :class:`CompiledPipeline`: every stage's kernel fuses into
a single per-block step, overlap-save pads become scan state, and a
trailing Fold is absorbed as an on-device segment-sum driven by
host-precomputed (two-double precision) phase bins.

Run on CPU:  JAX_PLATFORMS=cpu python examples/compiled_fold.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from baseband_tasks_tpu import (Dedisperse, Disperse, Fold, Noise,
                                SetAttribute, Square, StreamGenerator)
from baseband_tasks_tpu.models.compiled import CompiledPipeline
from baseband_tasks_tpu.utils import Time, units as u

T0 = Time("2020-01-01T00:00:00.0")
F0 = 101.37  # pulsar spin frequency, cycles/s
RATE = u.Quantity(1, u.MHz)


def phase(t):
    """Phase model: cycles since T0 (a Polyco/PintPhase drop-in)."""
    return u.Quantity((t - T0).sec * F0, u.cycle)


def make_source(seed=42):
    """Noise + a 1%-duty-cycle pulsar at F0 (sharp, pre-ISM).

    Pulses are injected in the SOURCE generator: anything that depends
    on absolute stream position must live in the source, because the
    compiled scan freezes per-node positions (a position-dependent
    `Task` callable is rejected by CompiledPipeline for this reason).
    """
    noise = Noise(seed)

    def pulsar(fh):
        data = noise(fh)
        i0 = fh.tell()
        t = np.arange(i0, i0 + len(data)) / 1e6
        ph = (t * F0) % 1.0
        amp = np.where(ph < 0.01, 30.0, 0.0).astype(np.float32)
        return data + amp

    gen = StreamGenerator(pulsar, (1 << 20,), T0, RATE,
                          samples_per_frame=1 << 14)
    return SetAttribute(gen, frequency=600 * u.MHz, sideband=1)


def main():
    # Disperse plays the interstellar medium; Dedisperse undoes it
    # coherently.  Both compile into the same scan (equal frame sizes).
    dm = 5.0
    # 8295 + the 705-sample dispersion pad = 9000, an FFT-fast length
    ism = Disperse(make_source(), dm, samples_per_frame=8295)
    chain = Fold(Square(Dedisperse(ism, dm, samples_per_frame=8295)),
                 64, phase, samples_per_frame=1)
    cp = CompiledPipeline(chain)
    print(f"block={cp.block_samples} samples, delay={cp.delay}, "
          f"caches as args={len(cp.cached_step()[1])}")

    n_blocks = (1 << 20) // cp.block_samples
    blocks = cp.read_source_blocks(n_blocks)
    profile, counts = cp.run_reduced(blocks)   # ONE compiled scan
    prof = np.asarray(profile)[0]

    off = prof[prof < np.median(prof) * 2]
    snr = (prof.max() - off.mean()) / (off.std() + 1e-30)
    print(f"folded {int(np.asarray(counts).sum())} samples into 64 bins; "
          f"peak bin {int(prof.argmax())}, S/N = {snr:.1f}")
    assert snr > 10.0, "pulse should stand out after dedispersion+fold"
    print("ok")


if __name__ == "__main__":
    main()
