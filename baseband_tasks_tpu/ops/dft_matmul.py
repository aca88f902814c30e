"""Small-transform DFT as an MXU matmul.

For short transforms (n ≤ ~256 — e.g. the per-channel FFT of a
256-channel Channelize, reference channelize.py:56-58) XLA's batched FFT
on TPU runs far below the HBM bound: the transform axis sits on the 128
lanes where the butterfly's cross-lane shuffles serialize on the VPU.
The MXU view is better: a length-n DFT of a (B, n) batch is simply
``X @ F`` with F the (n, n) DFT matrix — a dense matmul with the batch on
sublanes and the transform on lanes, i.e. zero relayouts.  The extra
arithmetic (n/log n ≈ 32× at n=256) rides the systolic array, which is
otherwise idle; at n ≤ 256 the matmul meets the HBM read bound, so this
is speed-of-light for the op.

Works for *any* n (no power-of-two or smoothness requirement).  By
default all matmuls run at ``Precision.HIGH`` (three bf16 MXU passes
per real f32 matmul): ~2^-16 relative error, measured at 104.2 dB SNR
against the full-f32 'highest' output on the config-3 chain
(BASELINE.md round 3) — 44 dB above the 60 dB correctness bar at half
the MXU cost, so matmul-bound chains run ~1.4x faster.  The default
TPU matmul precision (single bf16 pass, ~40 dB) would NOT clear the
bar, which is why the setting exists at all.  Use
:class:`set_matmul_precision('highest')` to restore full f32 where the
extra 30 dB matters more than throughput.

Used by the 'pallas' performance FFT engine (fourier/pallas.py) for
transforms too short for the four-step kernels.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["dft_matmul", "dft_matmul_planes", "dft_matmul_planes_flat",
           "MAX_MATMUL_N", "matmul_precision", "set_matmul_precision"]

#: largest transform length routed to the MXU (above this the O(n²)
#: arithmetic exceeds the HBM-bound FFT kernels' cost)
MAX_MATMUL_N = 256

_PRECISIONS = {"highest": jax.lax.Precision.HIGHEST,
               "high": jax.lax.Precision.HIGH,
               "default": jax.lax.Precision.DEFAULT}
# 'high' by default: measured 104.2 dB SNR vs 'highest' on the config-3
# chain (44 dB above the 60 dB bar) at half the MXU passes — the
# data-driven round-4 decision (BASELINE.md round 3 addendum)
_precision = jax.lax.Precision.HIGH


def matmul_precision():
    """The `jax.lax.Precision` every DFT/lane matmul runs at."""
    return _precision


def kernel_dot(a, b, prec):
    """``a @ b`` (contract a's last axis with b's first) inside a pallas
    kernel, honoring the matmul-precision setting.

    Mosaic's dot lowering supports only DEFAULT and HIGHEST
    (NotImplementedError on HIGH), so 'high' is emulated as the standard
    three-pass bf16 split the XLA path uses: with x = hi(x) + lo(x)
    (bf16 head + bf16 of the remainder),
    a·b ≈ hi·hi + hi·lo + lo·hi accumulated in f32 — half the MXU passes
    of HIGHEST, ~2^-16 relative error (config-3 chain measured 104 dB SNR
    against 'highest', BASELINE.md round 3).
    """
    dims = (((a.ndim - 1,), (0,)), ((), ()))
    if prec == jax.lax.Precision.HIGH:
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def d(x, y):
            return jax.lax.dot_general(
                x, y, dims, preferred_element_type=jnp.float32)

        return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)
    return jax.lax.dot_general(a, b, dims, precision=prec)


class set_matmul_precision:
    """Set the DFT-matmul precision ('highest', 'high', 'default').

    'high' (the default) is three bf16 MXU passes per real f32 matmul:
    ~1e-6 relative error on a length-256 DFT (config-3 chain output
    measured at 104 dB SNR against 'highest', BASELINE.md round 3) —
    44 dB above the 60 dB correctness bar at half the MXU cost of
    'highest' (full f32, six passes), so matmul-bound chains run ~1.4x
    faster.  Select 'highest' where the last ~30 dB matter more than
    throughput.  Usable as a context manager; affects traces, so apply
    before building/compiling a pipeline (pallas kernels key their jit
    caches on it; see :func:`kernel_dot` for the in-kernel emulation).
    """

    def __init__(self, name):
        global _precision
        self._old = _precision
        _precision = _PRECISIONS[str(name).lower()]

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        global _precision
        _precision = self._old


@lru_cache(maxsize=None)
def _forward_mats(n, m):
    """cos/sin planes of F[j, k] = exp(-2πi j k / n), shape (n, m)."""
    theta = -2.0 * np.pi / n * np.outer(np.arange(n), np.arange(m))
    return (np.cos(theta).astype(np.float32),
            np.sin(theta).astype(np.float32))


@lru_cache(maxsize=None)
def _inverse_mats(n):
    """cos/sin planes of conj(F)/n, shape (n, n)."""
    theta = 2.0 * np.pi / n * np.outer(np.arange(n), np.arange(n))
    return ((np.cos(theta) / n).astype(np.float32),
            (np.sin(theta) / n).astype(np.float32))


@lru_cache(maxsize=None)
def _irfft_mats(n):
    """Real-synthesis matrices (m, n), m = n//2 + 1:
    x = Zr @ C + Zi @ S with hermitian bin weights folded in."""
    m = n // 2 + 1
    k = np.arange(m)
    w = np.full(m, 2.0)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    theta = 2.0 * np.pi / n * np.outer(k, np.arange(n))
    return ((w[:, None] * np.cos(theta) / n).astype(np.float32),
            (-w[:, None] * np.sin(theta) / n).astype(np.float32))


def _dot(x, mat, axis):
    """Contract ``axis`` of x with rows of the host-constant ``mat``;
    transformed axis returned in place of ``axis``."""
    out = jax.lax.dot_general(
        x, jnp.asarray(mat),
        dimension_numbers=(((axis % x.ndim,), (0,)), ((), ())),
        precision=_precision)
    # dot_general appends the rhs free axis last; put it back.
    return jnp.moveaxis(out, -1, axis)


@lru_cache(maxsize=None)
def _expanded_mats(n, reps, direction):
    """(n·reps, n·reps) planes of F ⊗ I_reps: the DFT acting on a
    flattened (dft-major, reps-minor) lane axis."""
    if direction == "forward":
        fr, fi = _forward_mats(n, n)
    else:
        fr, fi = _inverse_mats(n)
    if reps == 1:
        return fr, fi
    eye = np.eye(reps, dtype=np.float32)
    return (np.kron(fr, eye).astype(np.float32),
            np.kron(fi, eye).astype(np.float32))


def dft_matmul_planes_flat(xr, xi, *, direction, n, reps=1):
    """Complex DFT over a flattened lane axis ordered (dft-axis major,
    reps minor): (rows, n·reps) planes @ (n·reps, n·reps) F ⊗ I_reps.

    Layout-preserving alternative to ``dft_matmul_planes`` with a
    trailing axis (whose middle-axis contraction makes XLA relayout the
    array around every matmul).  Measured tradeoff on v5e at n=256,
    reps=2: the reps^2-fold extra MXU flops at HIGHEST precision cost
    MORE than the transposes they save, so the channelize tasks keep
    the axis form; this form wins when the matmul is cheap relative to
    the relayouts (small n at low precision, or many trailing dims).
    """
    fr, fi = _expanded_mats(n, reps, direction)
    fr = jnp.asarray(fr)
    fi = jnp.asarray(fi)

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((a.ndim - 1,), (0,)), ((), ())),
                                   precision=_precision)

    return (dot(xr, fr) - dot(xi, fi), dot(xr, fi) + dot(xi, fr))


def dft_matmul_planes(xr, xi, *, axis, direction, n):
    """Complex DFT of separate float32 re/im planes via four MXU matmuls
    (numpy scaling: forward unscaled, inverse 1/n).  Returns (yr, yi).

    The planes form lets compiled planes-interchange pipelines
    (models/compiled.py stream path) channelize/dechannelize without
    ever materializing interleaved complex arrays.
    """
    if direction == "forward":
        fr, fi = _forward_mats(n, n)
    else:
        fr, fi = _inverse_mats(n)
    return (_dot(xr, fr, axis) - _dot(xi, fi, axis),
            _dot(xr, fi, axis) + _dot(xi, fr, axis))


def dft_matmul(data, *, axis, direction, ortho, real, n):
    """DFT along ``axis`` via MXU matmuls; numpy.fft-compatible results.

    direction 'forward' with ``real`` does an rfft (n real → n//2+1
    complex); 'backward' with ``real`` does an irfft back to length-n
    real output.  Scaling matches numpy: forward unscaled, inverse 1/n
    (``ortho``: 1/√n each way).
    """
    if direction == "forward":
        m = n // 2 + 1 if real else n
        fr, fi = _forward_mats(n, m)
        if real:
            x = data.real if jnp.iscomplexobj(data) else data
            out = jax.lax.complex(_dot(x, fr, axis), _dot(x, fi, axis))
        else:
            xr, xi = jnp.real(data), jnp.imag(data)
            out = jax.lax.complex(
                _dot(xr, fr, axis) - _dot(xi, fi, axis),
                _dot(xr, fi, axis) + _dot(xi, fr, axis))
        if ortho:
            out = out * np.float32(1.0 / np.sqrt(n))
        return out
    # inverse
    zr, zi = jnp.real(data), jnp.imag(data)
    if real:
        c, s = _irfft_mats(n)
        out = _dot(zr, c, axis) + _dot(zi, s, axis)
    else:
        fr, fi = _inverse_mats(n)
        out = jax.lax.complex(
            _dot(zr, fr, axis) - _dot(zi, fi, axis),
            _dot(zr, fi, axis) + _dot(zi, fr, axis))
    if ortho:
        out = out * np.float32(np.sqrt(n))
    return out
