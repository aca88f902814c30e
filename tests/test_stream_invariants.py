"""Property-style invariants over randomly composed task chains.

Whatever the chain, a stream must satisfy: read-all == concat of chunked
reads (any chunking), seek(k); read(n) == read_all[k:k+n], and repr/shape
metadata must stay consistent.  This exercises frame caching, partial
last frames (`_ih_stop`), and `PaddedTaskBase` end-of-stream re-reads
across operator combinations the dedicated tests don't enumerate.
"""

import numpy as np
import pytest

from baseband_tasks_tpu import (Channelize, Convolve, Dedisperse, Disperse,
                                GetSlice, NoiseGenerator, Real2Complex,
                                SetAttribute, ShiftSamples, Square)
from baseband_tasks_tpu.utils import Time, units as u

START = Time("2021-01-01T00:00:00.000000000")


def base_stream(seed):
    sh = NoiseGenerator(shape=(16384, 4), start_time=START,
                        sample_rate=64 * u.kHz, samples_per_frame=2048,
                        dtype=np.complex64, seed=seed)
    return SetAttribute(sh, frequency=[400., 400.1, 400.2, 400.3] * u.MHz,
                        sideband=1)


def random_chain(rng):
    sh = base_stream(int(rng.integers(1 << 30)))
    n_ops = rng.integers(1, 4)
    for _ in range(n_ops):
        op = rng.choice(["conv", "shift", "disp", "chan", "square",
                         "slice"])
        try:
            if op == "conv":
                r = np.zeros(int(rng.integers(3, 17)), np.complex64)
                r[0] = 1.0
                r[-1] = 0.3
                sh = Convolve(sh, r)
            elif op == "shift":
                sh = ShiftSamples(sh, rng.integers(-5, 6, size=4))
            elif op == "disp":
                sh = Disperse(sh, 1e-3)
            elif op == "chan" and sh.shape[0] >= 4096:
                sh = Channelize(sh, 8)
            elif op == "square":
                sh = Square(sh)
            elif op == "slice":
                n = sh.shape[0]
                if n > 64:
                    sh = GetSlice(sh, slice(3, n - 7))
        except (ValueError, AssertionError):
            continue
    return sh


@pytest.mark.parametrize("seed", range(6))
def test_chunked_reads_match_full_read(seed):
    rng = np.random.default_rng(seed)
    sh = random_chain(rng)
    n = min(sh.shape[0], 3000)
    sh.seek(0)
    full = np.asarray(sh.read(n))
    # chunked
    sh.seek(0)
    parts = []
    got = 0
    while got < n:
        step = int(rng.integers(1, 700))
        step = min(step, n - got)
        parts.append(np.asarray(sh.read(step)))
        got += step
    np.testing.assert_allclose(np.concatenate(parts), full,
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed", range(6, 10))
def test_seek_read_matches_slice(seed):
    rng = np.random.default_rng(seed)
    sh = random_chain(rng)
    n = min(sh.shape[0], 2000)
    sh.seek(0)
    full = np.asarray(sh.read(n))
    for _ in range(4):
        k = int(rng.integers(0, max(n - 32, 1)))
        m = int(rng.integers(1, min(256, n - k) + 1))
        sh.seek(k)
        assert sh.tell() == k
        piece = np.asarray(sh.read(m))
        np.testing.assert_allclose(piece, full[k:k + m],
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed", range(10, 13))
def test_tail_reads(seed):
    """The partial last frame must agree between one-shot and incremental
    reads ending exactly at the stream end."""
    rng = np.random.default_rng(seed)
    sh = random_chain(rng)
    n = sh.shape[0]
    sh.seek(max(n - 97, 0))
    tail = np.asarray(sh.read())
    sh.seek(0)
    full = np.asarray(sh.read())
    np.testing.assert_allclose(tail, full[max(n - 97, 0):],
                               rtol=1e-5, atol=1e-5)
    assert len(full) == n
