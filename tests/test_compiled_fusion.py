"""Compiled-pipeline pair fusions and the planes-interchange step.

The peephole fusions (models/compiled.py) absorb a lane-axis mix into
the pallas spectral-filter kernels:

* Disperse(engine='pallas') → Dechannelize   (post inverse-DFT)
* Dechannelize → InversePolyphaseFilterBank  (pre inverse-DFT)

These tests check, on the CPU backend (pallas interpret mode), that the
fused compiled execution reproduces the eager Stream computation, in
both the complex-interchange and planes-interchange steps.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from baseband_tasks_tpu import (Dechannelize, Dedisperse,
                                InversePolyphaseFilterBank,
                                NoiseGenerator, PolyphaseFilterBank,
                                SetAttribute, sinc_hamming)
from baseband_tasks_tpu.models.compiled import CompiledPipeline
from baseband_tasks_tpu.utils import Time, units as u

T0 = Time("2020-01-01T00:00:00.0")


def _chan_noise(seed, n_chan=8, n=1 << 14):
    freq = (400 + (np.arange(n_chan) - n_chan / 2) * 0.25) * u.MHz
    return SetAttribute(
        NoiseGenerator(shape=(n, n_chan), start_time=T0,
                       sample_rate=250 * u.kHz, samples_per_frame=2048,
                       seed=seed),
        frequency=freq, sideband=1)


def _run_compiled(cp, n_blocks, planes=False, stream_scale=None):
    blocks = cp.read_source_blocks(n_blocks)
    if planes:
        step_c, caches = cp.cached_planes_step()
        carry = cp.init_carry(planes=True)
        outs = []
        for k in range(n_blocks):
            x = np.asarray(blocks[k])
            pair = (jnp.asarray(x.real), jnp.asarray(x.imag)
                    if np.iscomplexobj(x) else None)
            carry, y = step_c(carry, pair, stream_scale, caches)
            yr, yi = y
            outs.append(np.asarray(yr) + (1j * np.asarray(yi)
                                          if yi is not None else 0))
        return np.concatenate(outs, axis=0)
    step_c, caches = cp.cached_step()
    carry = cp.init_carry()
    outs = []
    for k in range(n_blocks):
        carry, y = step_c(carry, blocks[k], caches)
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=0)


def _compare_eager(got, cp, tail, rtol=1e-3, atol=2e-3):
    """Compiled sample k (k >= warmup) equals eager sample k - delay."""
    delay = int(cp.delay)
    tail.seek(0)
    eager = np.asarray(tail.read(got.shape[0] - delay))
    np.testing.assert_allclose(got[cp.warmup:],
                               eager[cp.warmup - delay:],
                               rtol=rtol, atol=atol)


class TestDisperseDechanFusion:
    def _make(self, fuse=True):
        src = _chan_noise(3)
        ded = Dedisperse(src, 5.0, samples_per_frame=1024,
                         engine="pallas")
        tail = Dechannelize(ded)
        return CompiledPipeline(tail, fuse=fuse), tail

    def test_fusion_applied(self):
        cp, _ = self._make()
        assert any(getattr(st, "fused", None) is not None
                   for st in cp.stages)
        assert any(getattr(st, "skip", False) for st in cp.stages)

    def test_matches_eager_exact(self):
        # spf dividing the pad makes streaming windows coincide with
        # eager frames -> agreement to float roundoff (module docstring)
        src = _chan_noise(4)
        with pytest.warns(Warning, match="efficiency"):
            ded = Dedisperse(src, 5.0, samples_per_frame=1,
                             engine="pallas")
        assert (ded.pad_start + ded.pad_end) % ded.samples_per_frame == 0
        tail = Dechannelize(ded)
        cp = CompiledPipeline(tail)
        # warmup spans delay = pad samples -> several blocks
        n_blocks = cp.warmup // cp.tail_block + 4
        got = _run_compiled(cp, n_blocks)
        _compare_eager(got, cp, tail, rtol=1e-4, atol=1e-4)

    def test_planes_matches_complex(self):
        cp, _ = self._make()
        a = _run_compiled(cp, 3, planes=False)
        b = _run_compiled(cp, 3, planes=True)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_matches_unfused(self):
        cp_f, _ = self._make(fuse=True)
        cp_u, _ = self._make(fuse=False)
        a = _run_compiled(cp_f, 2)
        b = _run_compiled(cp_u, 2)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    def test_stream_path_with_scale(self):
        # the streaming fused stage consumes the scale in-kernel; a
        # pre-scaled unfused run must agree on block 0 (zero carries on
        # both sides make the windows identical)
        cp, _ = self._make()
        blocks = cp.read_source_blocks(1)
        x = np.asarray(blocks[0])
        step_c, caches = cp.cached_planes_step()
        _, (yr, yi) = step_c(cp.init_carry(planes=True),
                             (jnp.asarray(x.real), jnp.asarray(x.imag)),
                             jnp.float32(0.5), caches)
        _, (zr, zi) = step_c(cp.init_carry(planes=True),
                             (jnp.asarray(0.5 * x.real),
                              jnp.asarray(0.5 * x.imag)), None, caches)
        np.testing.assert_allclose(np.asarray(yr), np.asarray(zr),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(yi), np.asarray(zi),
                                   rtol=1e-4, atol=1e-5)


class TestDechanInvPFBFusion:
    def _make(self, fuse=True):
        n, n_tap = 32, 4
        h = sinc_hamming(n_tap, n)
        src = NoiseGenerator(shape=(1 << 16, 2), start_time=T0,
                             sample_rate=1 * u.MHz,
                             samples_per_frame=8192, seed=5)
        # the pallas inversion grows its window to 512 spectra rows with
        # 32-row pads -> 448-row frames; the FIR must match
        pfb = PolyphaseFilterBank(src, h, samples_per_frame=448)
        inv = InversePolyphaseFilterBank(
            pfb, h, sn=1e3, pad_start=16, pad_end=16,
            samples_per_frame=224, dtype=src.dtype, engine="pallas")
        assert inv.samples_per_frame == 448 * n
        return CompiledPipeline(inv), inv

    def test_fusion_applied(self):
        cp, inv = self._make()
        fused = [st for st in cp.stages
                 if getattr(st, "fused", None) is not None]
        assert len(fused) == 1
        # the carry moved to the spectra domain
        assert fused[0].pad == (inv.pad_start + inv.pad_end) // inv._n
        assert fused[0].in_sample_shape[0] == inv._n

    @pytest.mark.parametrize("planes", [False, True])
    def test_roundtrip_recovery(self, planes):
        """The compiled fused chain recovers the raw stream (same bar as
        the eager round-trip test)."""
        cp, inv = self._make()
        src = cp.source
        src.seek(0)
        raw = np.asarray(src.read(None))
        src.seek(0)
        n_blocks = 4
        got = _run_compiled(cp, n_blocks, planes=planes)
        # compiled sample k (past warmup) = eager sample k - delay;
        # eager sample j = raw[j + lead] with the start_time offset
        lead = int(round(float(((inv.start_time - T0).sec) * 1e6)))
        delay = int(cp.delay)
        k0 = cp.warmup
        expect = raw[lead + k0 - delay: lead + got.shape[0] - delay]
        err = (np.mean(np.abs(got[k0:] - expect) ** 2)
               / np.mean(np.abs(expect) ** 2))
        # 32-row pads at sn=1e3 leave ~6e-4 Wiener edge leakage — the
        # same level the eager windows show averaged over a full frame
        # (it decays ~16x per pad doubling; production sizings use
        # 128-row pads, cf. reference pfb.py:170-181)
        assert err < 1.5e-3

    def test_planes_matches_complex(self):
        cp, _ = self._make()
        a = _run_compiled(cp, 3, planes=False)
        b = _run_compiled(cp, 3, planes=True)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_matches_unfused(self):
        a = _run_compiled(self._make()[0], 2)
        b = _run_compiled(CompiledPipeline(self._make()[1], fuse=False),
                          2)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


class TestConvolveStream:
    """Pallas Convolve in the planes-interchange step: the streaming
    task_stream form (in-kernel window assembly + trim) must match the
    complex path and the eager stream."""

    def _make(self):
        rng = np.random.default_rng(8)
        r = (rng.standard_normal(33)
             + 1j * rng.standard_normal(33)).astype(np.complex64) * 0.2
        from baseband_tasks_tpu import Convolve
        src = NoiseGenerator(shape=(1 << 14, 8), start_time=T0,
                             sample_rate=1 * u.MHz,
                             samples_per_frame=4096,
                             dtype=np.complex64, seed=13)
        conv = Convolve(src, r, samples_per_frame=1024, engine="pallas")
        return CompiledPipeline(conv), conv

    def test_planes_matches_complex(self):
        cp, _ = self._make()
        a = _run_compiled(cp, 3, planes=False)
        b = _run_compiled(cp, 3, planes=True)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_matches_eager(self):
        # convolution responses are finite: pads fully contain them, so
        # streaming windows equal eager output exactly past warmup
        cp, conv = self._make()
        got = _run_compiled(cp, 3, planes=True)
        _compare_eager(got, cp, conv, rtol=1e-4, atol=1e-4)
