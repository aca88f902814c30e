"""ops/pfb_pallas (fused forward-PFB kernel) and the matmul-precision
knob (ops/dft_matmul.set_matmul_precision / kernel_dot)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from baseband_tasks_tpu.ops.dft_matmul import (_expanded_mats,
                                               kernel_dot,
                                               matmul_precision,
                                               set_matmul_precision)
from baseband_tasks_tpu.ops.pfb_pallas import (choose_block_rows,
                                               forward_geometry_ok,
                                               pfb_forward_stream)

RNG = np.random.default_rng(7)


def _ref_forward(win_r, win_i, taps, n, reps, m):
    """FIR rows then DFT over the channel axis, plain numpy."""
    n_tap = taps.shape[0]

    def fir(x):
        acc = taps[0] * x[:m]
        for t in range(1, n_tap):
            acc = acc + taps[t] * x[t:t + m]
        return acc
    z = (fir(win_r) + 1j * fir(win_i)).reshape(m, n, reps)
    Z = np.fft.fft(z, axis=1).reshape(m, n * reps)
    return Z.real.astype(np.float32), Z.imag.astype(np.float32)


class TestForwardKernel:
    n, reps, n_tap, m = 16, 2, 8, 48

    @pytest.fixture(autouse=True)
    def _full_precision(self):
        # these tests pin streaming-carry MECHANICS against an exact
        # f32 numpy reference at tight tolerances; run them at
        # 'highest' so the default three-pass bf16 emulation's ~1e-4
        # absolute error (validated separately in TestPrecisionKnob)
        # doesn't blur the comparison
        with set_matmul_precision("highest"):
            yield

    def setup_method(self):
        self.L = self.n * self.reps
        h = RNG.standard_normal((self.n_tap, self.n)).astype(np.float32)
        self.taps = np.repeat(h, self.reps, axis=1)
        self.fr, self.fi = _expanded_mats(self.n, self.reps, "forward")

    def _blocks(self, seed=0):
        r = np.random.default_rng(seed)
        return (r.standard_normal((self.m, self.L)).astype(np.float32),
                r.standard_normal((self.m, self.L)).astype(np.float32))

    def test_two_streaming_steps_with_scale(self):
        """Step outputs equal the windowed reference; the carry keeps
        its own iteration's scale."""
        k = self.n_tap - 1
        c0 = np.zeros((k, self.L), np.float32)
        x1r, x1i = self._blocks(1)
        x2r, x2i = self._blocks(2)
        s1, s2 = np.float32(1.25), np.float32(0.75)
        y1 = pfb_forward_stream(c0, c0, x1r, x1i, self.taps,
                                self.fr, self.fi, n_tap=self.n_tap,
                                scale=s1, block_rows=8)
        e1 = _ref_forward(np.concatenate([c0, x1r * s1]),
                          np.concatenate([c0, x1i * s1]),
                          self.taps, self.n, self.reps, self.m)
        np.testing.assert_allclose(np.asarray(y1[0]), e1[0],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(y1[1]), e1[1],
                                   rtol=1e-4, atol=1e-4)
        c1r, c1i = x1r[-k:] * s1, x1i[-k:] * s1
        y2 = pfb_forward_stream(c1r, c1i, x2r, x2i, self.taps,
                                self.fr, self.fi, n_tap=self.n_tap,
                                scale=s2, block_rows=8)
        e2 = _ref_forward(np.concatenate([c1r, x2r * s2]),
                          np.concatenate([c1i, x2i * s2]),
                          self.taps, self.n, self.reps, self.m)
        np.testing.assert_allclose(np.asarray(y2[0]), e2[0],
                                   rtol=1e-4, atol=1e-4)

    def test_auto_block_rows_and_no_scale(self):
        k = self.n_tap - 1
        c0 = np.zeros((k, self.L), np.float32)
        xr, xi = self._blocks(3)
        y = pfb_forward_stream(c0, c0, xr, xi, self.taps,
                               self.fr, self.fi, n_tap=self.n_tap)
        e = _ref_forward(np.concatenate([c0, xr]),
                         np.concatenate([c0, xi]),
                         self.taps, self.n, self.reps, self.m)
        np.testing.assert_allclose(np.asarray(y[0]), e[0],
                                   rtol=1e-4, atol=1e-4)

    def test_short_taps(self):
        """n_tap = 2 exercises the hb > k carry padding."""
        taps = self.taps[:2]
        c0 = np.zeros((1, self.L), np.float32)
        xr, xi = self._blocks(4)
        y = pfb_forward_stream(c0, c0, xr, xi, taps, self.fr, self.fi,
                               n_tap=2, block_rows=8)
        e = _ref_forward(np.concatenate([c0, xr]),
                         np.concatenate([c0, xi]),
                         taps, self.n, self.reps, self.m)
        np.testing.assert_allclose(np.asarray(y[0]), e[0],
                                   rtol=1e-4, atol=1e-4)

    def test_geometry_gates(self):
        assert forward_geometry_ok(32256, 512, 8)
        assert not forward_geometry_ok(32256, 96, 8)     # lanes off-grid
        assert not forward_geometry_ok(32256, 512, 12)   # halo > 8 rows
        assert not forward_geometry_ok(13, 512, 8)       # no row split
        assert choose_block_rows(32256, 8) == 1008
        with pytest.raises(ValueError, match="row-block"):
            pfb_forward_stream(
                np.zeros((7, 128), np.float32),
                np.zeros((7, 128), np.float32),
                np.zeros((13, 128), np.float32),
                np.zeros((13, 128), np.float32),
                np.zeros((8, 128), np.float32),
                np.zeros((128, 128), np.float32),
                np.zeros((128, 128), np.float32), n_tap=8)


class TestPrecisionKnob:
    def test_default_is_high(self):
        # the round-4 data-driven default: 104.2 dB measured vs
        # 'highest' (BASELINE.md), 44 dB above the 60 dB bar, at half
        # the MXU passes
        assert matmul_precision() == jax.lax.Precision.HIGH

    def test_context_restores(self):
        with set_matmul_precision("highest"):
            assert matmul_precision() == jax.lax.Precision.HIGHEST
            with set_matmul_precision("default"):
                assert matmul_precision() == jax.lax.Precision.DEFAULT
            assert matmul_precision() == jax.lax.Precision.HIGHEST
        assert matmul_precision() == jax.lax.Precision.HIGH

    def test_unknown_name_rejected(self):
        with pytest.raises(KeyError):
            set_matmul_precision("medium")

    def test_kernel_dot_high_emulation_accuracy(self):
        """The hi/lo bf16 three-pass split stays within ~1e-6 relative
        of the exact product (the basis for the 104 dB config-3 SNR)."""
        a = jnp.asarray(RNG.standard_normal((64, 128)), jnp.float32)
        b = jnp.asarray(RNG.standard_normal((128, 128)), jnp.float32)
        exact = np.asarray(kernel_dot(a, b, jax.lax.Precision.HIGHEST))
        approx = np.asarray(kernel_dot(a, b, jax.lax.Precision.HIGH))
        snr = 10 * np.log10((exact ** 2).sum()
                            / ((exact - approx) ** 2).sum() + 1e-30)
        assert snr > 90, snr

    def test_dft_matmul_honors_setting(self):
        """dft_matmul output stays numpy-correct at 'high' (CPU backend
        computes f32 regardless; this pins the plumbing path)."""
        from baseband_tasks_tpu.ops.dft_matmul import dft_matmul
        x = jnp.asarray(RNG.standard_normal((8, 16)), jnp.float32)
        with set_matmul_precision("high"):
            y = dft_matmul(x, axis=1, direction="forward", ortho=False,
                           real=True, n=16)
        np.testing.assert_allclose(np.asarray(y),
                                   np.fft.rfft(np.asarray(x), axis=1),
                                   rtol=1e-4, atol=1e-4)
