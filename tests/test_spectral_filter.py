"""Unit tests of ops/spectral_filter.py against plain numpy.

Runs in pallas interpret mode on the CPU backend (conftest).
"""

import numpy as np
import pytest

from baseband_tasks_tpu.ops.dedisperse_pallas import (
    permute_to_storage_order, split_n)
from baseband_tasks_tpu.ops.spectral_filter import (
    expand_lane_mats, lane_dft_mats, spectral_filter_pow2,
    spectral_filter_stream)


def ref_filter(x, gain, pre=None, post=None, pad_start=0, pad_end=0):
    """Numpy reference: trim(IFFT(FFT(pre(x)) * G) @ post)."""
    if pre is not None:
        x = x @ (pre[0] + 1j * pre[1])
    y = np.fft.ifft(np.fft.fft(x, axis=0) * gain, axis=0)
    if post is not None:
        y = y @ (post[0] + 1j * post[1])
    n = x.shape[0]
    return y[pad_start:n - pad_end]


def make_case(n, L, seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((n, L))
         + 1j * rng.standard_normal((n, L))).astype(np.complex64)
    gain = (rng.standard_normal((n, L))
            + 1j * rng.standard_normal((n, L))).astype(np.complex64)
    n1, n2 = split_n(n)
    gs = permute_to_storage_order(gain, n1, n2)
    return (x, gain,
            np.ascontiguousarray(gs.real).astype(np.float32),
            np.ascontiguousarray(gs.imag).astype(np.float32))


class TestSpectralFilterPow2:
    @pytest.mark.parametrize("n,L", [(512, 8), (1024, 16), (2048, 8)])
    def test_plain(self, n, L):
        x, gain, gr, gi = make_case(n, L)
        n2 = split_n(n)[1]
        p0, p1 = n2, n2
        yr, yi = spectral_filter_pow2(
            x.real.copy(), x.imag.copy(), gr, gi,
            pad_start=p0, pad_end=p1)
        ref = ref_filter(x, gain, pad_start=p0, pad_end=p1)
        np.testing.assert_allclose(yr + 1j * yi, ref, atol=2e-4)

    def test_post_lane_mix(self):
        # dechannelize: inverse DFT across the lane axis after filtering
        n, L = 1024, 16
        x, gain, gr, gi = make_case(n, L, seed=1)
        n2 = split_n(n)[1]
        post = lane_dft_mats(L, inverse=True)
        yr, yi = spectral_filter_pow2(
            x.real.copy(), x.imag.copy(), gr, gi,
            pad_start=n2, pad_end=n2, post=post)
        ref = ref_filter(x, gain, post=post, pad_start=n2, pad_end=n2)
        np.testing.assert_allclose(yr + 1j * yi, ref, atol=2e-4)

    def test_pre_lane_mix_kron(self):
        # PFB-inverse shape: IDFT over channels, identity over pols
        n, nchan, npol = 512, 8, 2
        L = nchan * npol
        x, gain, gr, gi = make_case(n, L, seed=2)
        n2 = split_n(n)[1]
        pre = expand_lane_mats(lane_dft_mats(nchan, inverse=True), npol)
        yr, yi = spectral_filter_pow2(
            x.real.copy(), x.imag.copy(), gr, gi,
            pad_start=n2, pad_end=n2, pre=pre)
        ref = ref_filter(x, gain, pre=pre, pad_start=n2, pad_end=n2)
        np.testing.assert_allclose(yr + 1j * yi, ref, atol=2e-4)

    def test_bad_pads(self):
        x, gain, gr, gi = make_case(512, 8)
        with pytest.raises(ValueError, match="multiple of N2"):
            spectral_filter_pow2(x.real.copy(), x.imag.copy(), gr, gi,
                                 pad_start=3, pad_end=0)


class TestSpectralFilterStream:
    def test_matches_pow2(self):
        n, L = 1024, 8
        x, gain, gr, gi = make_case(n, L, seed=3)
        n2 = split_n(n)[1]
        p0, p1 = n2, n2
        pad = p0 + p1
        carry = x[:pad]
        block = x[pad:]
        yr, yi = spectral_filter_stream(
            carry.real.copy(), carry.imag.copy(),
            block.real.copy(), block.imag.copy(), gr, gi,
            pad_start=p0, pad_end=p1)
        ref = ref_filter(x, gain, pad_start=p0, pad_end=p1)
        np.testing.assert_allclose(yr + 1j * yi, ref, atol=2e-4)

    def test_scale_and_post(self):
        # the scale multiplies the BLOCK rows only — the carry holds the
        # previous iteration's (already scaled) samples
        n, L = 512, 8
        x, gain, gr, gi = make_case(n, L, seed=4)
        n2 = split_n(n)[1]
        pad = 2 * n2
        post = lane_dft_mats(L, inverse=True)
        yr, yi = spectral_filter_stream(
            x.real[:pad].copy(), x.imag[:pad].copy(),
            x.real[pad:].copy(), x.imag[pad:].copy(), gr, gi,
            pad_start=n2, pad_end=n2, scale=np.float32(0.5), post=post)
        x_scaled = np.concatenate([x[:pad], 0.5 * x[pad:]])
        ref = ref_filter(x_scaled, gain, post=post,
                         pad_start=n2, pad_end=n2)
        np.testing.assert_allclose(yr + 1j * yi, ref, atol=2e-4)
