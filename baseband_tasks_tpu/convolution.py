"""Convolution tasks: direct (time-domain) and FFT overlap-save.

Counterpart of `/root/reference/baseband_tasks/convolution.py`
(``ConvolveSamples`` convolution.py:23, ``Convolve`` convolution.py:65).

TPU-native mechanics: the direct path lowers to a depthwise
``lax.conv_general_dilated`` (MXU-friendly), the FFT path to
fft → multiply-by-cached-response-FT → ifft, fused by XLA inside one
jitted frame function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import PaddedTaskBase, check_broadcast_to
from .fourier import fft_maker
from .utils.device import device_complex

__all__ = ["adjust_response_dims", "Convolve", "ConvolveSamples"]


def adjust_response_dims(response, ih):
    """Give a 1-D response trailing singleton axes so it broadcasts
    against the sample shape of ``ih``; otherwise check it broadcasts
    as-is (reference convolution.py:13-20)."""
    if response.ndim == 1 and ih.ndim > 1:
        response = response.reshape(response.shape[:1]
                                    + (1,) * (ih.ndim - 1))
    else:
        check_broadcast_to(response, response.shape[:1] + ih.sample_shape)
    return response


class _ConvolveBase(PaddedTaskBase):
    """Common setup: response array, padding split, time alignment.

    ``response`` has the convolution kernel along axis 0 and must broadcast
    against the sample shape on trailing axes.  ``offset`` positions the
    kernel relative to the output grid: the output at sample ``i`` is
    ``sum_k data[i + k] * response[::-1][k]`` with the kernel's ``offset``
    element aligned to ``i`` (cf. reference convolution.py:23-64).
    """

    def __init__(self, ih, response, *, offset=0, samples_per_frame=None,
                 engine="xla", **kwargs):
        response = np.asarray(response)
        if response.ndim < 1:
            raise ValueError("response must have at least 1 dimension")
        response = adjust_response_dims(response, ih)
        # engine: 'xla' (jnp.fft overlap-save) or 'pallas' (fused
        # four-step VMEM-resident kernels, power-of-two windows — same
        # kernels as Disperse: a frequency-response multiply is a chirp
        # multiply); 'auto' picks pallas on TPU for complex data filling
        # >= 8 lanes.
        if engine == "auto":
            lanes = int(np.prod(ih.sample_shape)) if ih.sample_shape else 1
            engine = "pallas" if (jax.default_backend() == "tpu"
                                  and ih.dtype.kind == "c"
                                  and lanes >= 8) else "xla"
        if engine == "pallas" and ih.dtype.kind != "c":
            raise ValueError("the pallas convolution engine requires "
                             "complex data")
        self.engine = engine
        pad = response.shape[0] - 1
        extra = 0
        if engine == "pallas":
            from .dispersion import _pow2_len
            from .ops.dedisperse_pallas import split_n
            fast_len = _pow2_len
            # pow2 window with the total pad on the four-step N2 grid:
            # the (trailing-rows) trim then happens inside the last
            # kernel instead of a separate XLA pass
            spf0 = samples_per_frame if samples_per_frame is not None \
                else max(3 * pad, 1)
            n_fft = _pow2_len(spf0 + pad)
            while True:
                n2 = split_n(n_fft)[1]
                pad_r = -(-pad // n2) * n2
                if n_fft - pad_r >= max(spf0, 1):
                    break
                n_fft *= 2
            extra = pad_r - pad
            samples_per_frame = n_fft - pad_r
        else:
            fast_len = fft_maker.get().next_fast_len
        super().__init__(ih, pad_start=pad - offset + extra,
                         pad_end=offset,
                         samples_per_frame=samples_per_frame,
                         next_fast_len=fast_len,
                         **kwargs)
        if engine == "pallas":
            from .ops.spectral_filter import geometry_ok
            # the trailing trim discards pad_start + pad_end rows at the
            # window FRONT, so the combined pad must sit on the N2 grid
            if not geometry_ok(self._padded_samples_per_frame,
                               self._pad_start + self._pad_end, 0):
                self.engine = "xla"

        if np.asarray(response).dtype.kind == "c" and \
                self.dtype.kind != "c":
            # the reference fails loudly here too (complex assigned into
            # a real output array); silently taking .real would corrupt
            raise ValueError(
                "complex response with a real output dtype would discard "
                "the imaginary part; pass dtype=complex64 or convert the "
                "stream (e.g. Real2Complex) first")
        self._response = response
        self._response_offset = offset

    @property
    def response(self):
        return self._response


class ConvolveSamples(_ConvolveBase):
    """Convolve a stream with a response directly in the time domain."""

    def task(self, data):
        resp = self._response
        n_in = data.shape[0]
        sample_shape = data.shape[1:]
        c = int(np.prod(sample_shape)) if sample_shape else 1
        # Broadcast response over all sample dims -> (r, C)
        rfull = np.broadcast_to(
            resp.reshape(resp.shape[:1] + (1,) * (len(sample_shape)
                                                  - (resp.ndim - 1))
                         + resp.shape[1:]),
            (resp.shape[0],) + sample_shape).reshape(resp.shape[0], c)
        x = data.reshape(n_in, c)
        if data.dtype.kind == "c":
            re = self._conv_real(x.real, rfull.real) - \
                self._conv_real(x.imag, rfull.imag)
            im = self._conv_real(x.real, rfull.imag) + \
                self._conv_real(x.imag, rfull.real)
            out = jax.lax.complex(re, im)
        else:
            out = self._conv_real(x, rfull.astype(x.dtype))
        return out.reshape((out.shape[0],) + sample_shape)

    @staticmethod
    def _conv_real(x, r):
        """Valid-mode convolution along axis 0, depthwise per channel.

        x: (n, C), r: (rlen, C) -> (n - rlen + 1, C)
        """
        n, c = x.shape
        lhs = x.T[None]                      # (1, C, n)
        rhs = jnp.asarray(r[::-1].T[:, None, :])  # (C, 1, rlen)
        out = jax.lax.conv_general_dilated(
            lhs.astype(jnp.float32), rhs.astype(jnp.float32),
            window_strides=(1,), padding="VALID",
            feature_group_count=c)
        return out[0].T                       # (n_out, C)


class Convolve(_ConvolveBase):
    """Convolve via FFT overlap-save with a cached response transform.

    The padded-frame FT of the response is computed once and cached on
    device (reference caches it as a lazyproperty, convolution.py:108-114).
    """

    _ft_response_cache = None
    _storage_response_cache = None

    def _ft_response(self, host=False):
        """FT of the zero-padded response, aligned so that trimming
        ``pad_start`` from the IFFT start yields the convolution."""
        n = self._padded_samples_per_frame
        sample_shape = self.ih.sample_shape
        resp = self._response
        full_shape = (n,) + sample_shape
        padded = np.zeros(full_shape, dtype=np.complex64)
        r = resp.reshape(resp.shape[:1] + (1,) * (len(sample_shape)
                                                  - (resp.ndim - 1))
                         + resp.shape[1:])
        padded[:resp.shape[0]] = np.broadcast_to(
            r, (resp.shape[0],) + sample_shape)
        fft = fft_maker(full_shape, np.complex64, axis=0)
        ft = np.asarray(fft(padded))
        return ft if host else device_complex(ft)

    def _storage_response(self):
        from .ops.dedisperse_pallas import (permute_to_storage_order,
                                            split_n)
        n = self._padded_samples_per_frame
        n1, n2 = split_n(n)
        # reshape (not broadcast_to) so scalar-sample streams, whose FT
        # is 1-d, become the (n, 1) lane layout the kernel expects
        ft = self._ft_response(host=True).reshape(n, -1)
        stor = permute_to_storage_order(ft, n1, n2)
        return (jnp.asarray(np.ascontiguousarray(
                    stor.real.astype(np.float32))),
                jnp.asarray(np.ascontiguousarray(
                    stor.imag.astype(np.float32))))

    def _task_pallas_planes(self, xr, xi, carry=None, scale=None):
        """Convolve float32 planes through the fused spectral-filter
        kernels; the (trailing-rows) trim happens in the last kernel.
        The convolution's valid region starts ``pad_start + pad_end``
        into the window (all discard at the front), which the pallas
        constructor rounded onto the N2 grid."""
        from .ops.spectral_filter import (spectral_filter_pow2,
                                          spectral_filter_stream)
        if self._storage_response_cache is None:
            self._storage_response_cache = self._storage_response()
        gr, gi = self._storage_response_cache
        kw = dict(pad_start=self._pad_start + self._pad_end, pad_end=0)
        if carry is not None:
            return spectral_filter_stream(carry[0], carry[1], xr, xi,
                                          gr, gi, scale=scale, **kw)
        return spectral_filter_pow2(xr, xi, gr, gi, **kw)

    def _task_pallas(self, data):
        squeeze = data.ndim == 1
        if squeeze:
            data = data[:, None]
        n = data.shape[0]
        sample_shape = data.shape[1:]
        x = jnp.asarray(data).astype(jnp.complex64)
        yr, yi = self._task_pallas_planes(jnp.real(x).reshape(n, -1),
                                          jnp.imag(x).reshape(n, -1))
        out = jax.lax.complex(yr, yi).reshape((-1,) + sample_shape)
        if squeeze:
            out = out[:, 0]
        return out

    def task_planes(self, pair):
        """Planes-interchange form (models/compiled.py planes_step)."""
        xr, xi = pair
        if (self.engine != "pallas" or xi is None
                or xr.shape[0] != self._padded_samples_per_frame
                or np.dtype(self.dtype).kind != "c"):
            return NotImplemented
        shape = xr.shape
        yr, yi = self._task_pallas_planes(xr.reshape(shape[0], -1),
                                          xi.reshape(shape[0], -1))
        out_shape = (self._samples_per_frame,) + shape[1:]
        return yr.reshape(out_shape), yi.reshape(out_shape)

    def task_stream(self, carry_pair, x_pair, scale=None):
        """Streaming planes form: carry + block in, trimmed block out,
        window assembled in VMEM (models/compiled.py planes_step)."""
        pad = self._pad_start + self._pad_end
        if (self.engine != "pallas" or carry_pair[0].shape[0] != pad
                or x_pair[0].shape[0] + pad
                != self._padded_samples_per_frame
                or np.dtype(self.dtype).kind != "c"):
            return NotImplemented
        shape = x_pair[0].shape
        yr, yi = self._task_pallas_planes(
            x_pair[0].reshape(shape[0], -1),
            x_pair[1].reshape(shape[0], -1), scale=scale,
            carry=(carry_pair[0].reshape(pad, -1),
                   carry_pair[1].reshape(pad, -1)))
        out_shape = (self._samples_per_frame,) + shape[1:]
        return yr.reshape(out_shape), yi.reshape(out_shape)

    def task(self, data):
        if self.engine == "pallas" and \
                data.shape[0] == self._padded_samples_per_frame:
            return self._task_pallas(data)
        if self._ft_response_cache is None:
            self._ft_response_cache = self._ft_response()
        n = data.shape[0]
        fft = fft_maker((n,) + data.shape[1:], np.complex64, axis=0,
                        sample_rate=self.ih.sample_rate)
        ft = fft(data.astype(jnp.complex64))
        ft = ft * self._ft_response_cache
        out = fft.inverse()(ft)
        # Convolution output index i depends on inputs [i-rlen+1 .. i];
        # valid region starts at rlen-1 = pad_start + pad_end.
        out = out[self._pad_start + self._pad_end:]
        if self.dtype.kind != "c":
            out = out.real.astype(self.dtype)
        return out
