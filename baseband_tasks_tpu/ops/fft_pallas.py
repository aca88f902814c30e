"""Standalone pallas four-step FFT for power-of-two complex transforms.

The fused dedispersion kernels (`dedisperse_pallas.py`) already contain
all the machinery of a four-step N = N1·N2 FFT; this module composes the
same Stockham stages into plain forward/inverse transforms with
*natural-order* input and output:

  forward:  K1 (stage-A FFT × W_N^{cb} twiddle, written d-major)
            → stage-B FFT — and because storage is d-major, frequency
            k = d·N1 + c comes out in natural order as a plain reshape.
  inverse:  inverse stage-B × conj twiddle → inverse stage-A (K3),
            natural time order again by reshape.

This backs the ``fft_maker`` engine 'pallas' (fourier/pallas.py),
fulfilling SURVEY.md §2 L2's "pluggable engine so a Pallas FFT can be
swapped in".
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dedisperse_pallas import (_choose_blocks, _is_pow2, _k1_body,
                                _k3_body, _split_n, _stockham)

__all__ = ["fft_pow2_planes"]


def _k2_fwd_body(scale, yr_ref, yi_ref, zr_ref, zi_ref):
    """Stage-B forward FFT along axis 0 (d-major tiles); optional scale."""
    rr, ii = _stockham(yr_ref[:], yi_ref[:], -1.0,
                       scale=scale if scale != 1.0 else None)
    zr_ref[:] = rr
    zi_ref[:] = ii


def _k2_inv_body(n1, n2, n, scale, zr_ref, zi_ref, yr_ref, yi_ref):
    """Inverse stage-B FFT plus the conjugate twiddle W_N^{+cb}."""
    rr, ii = _stockham(zr_ref[:], zi_ref[:], +1.0, scale=scale)
    bc = zr_ref.shape[1]
    i0 = pl.program_id(0) * bc
    b = jax.lax.broadcasted_iota(jnp.int32, (n2, bc, 1), 0
                                 ).astype(jnp.float32)
    c = jax.lax.broadcasted_iota(jnp.int32, (n2, bc, 1), 1
                                 ).astype(jnp.float32) + i0
    theta = (+2.0 * np.pi / n) * c * b
    wr, wi = jnp.cos(theta), jnp.sin(theta)
    yr_ref[:] = rr * wr - ii * wi
    yi_ref[:] = rr * wi + ii * wr


@functools.partial(jax.jit, static_argnames=(
    "n1", "n2", "block_b", "block_c", "inverse", "scale", "interpret"))
def _fft_impl(xr, xi, *, n1, n2, block_b, block_c, inverse, scale,
              interpret):
    n = n1 * n2
    L = xr.shape[-1]
    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    spec_b = pl.BlockSpec((n1, block_b, L), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    spec_bT = pl.BlockSpec((block_b, n1, L), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_c = pl.BlockSpec((n2, block_c, L), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    shape_T = (jax.ShapeDtypeStruct((n2, n1, L), jnp.float32),
               jax.ShapeDtypeStruct((n2, n1, L), jnp.float32))
    if not inverse:
        y_r, y_i = pl.pallas_call(
            functools.partial(_k1_body, n1, n2, n),
            compiler_params=params, grid=(n2 // block_b,),
            in_specs=[spec_b, spec_b], out_specs=(spec_bT, spec_bT),
            out_shape=shape_T, interpret=interpret,
        )(xr.reshape(n1, n2, L), xi.reshape(n1, n2, L))
        z_r, z_i = pl.pallas_call(
            functools.partial(_k2_fwd_body, scale),
            compiler_params=params, grid=(n1 // block_c,),
            in_specs=[spec_c, spec_c], out_specs=(spec_c, spec_c),
            out_shape=shape_T, interpret=interpret,
        )(y_r, y_i)
        return z_r.reshape(n, L), z_i.reshape(n, L)
    # inverse: K3 divides by n1; put the rest of the target scale in K2.
    y_r, y_i = pl.pallas_call(
        functools.partial(_k2_inv_body, n1, n2, n, scale * n1),
        compiler_params=params, grid=(n1 // block_c,),
        in_specs=[spec_c, spec_c], out_specs=(spec_c, spec_c),
        out_shape=shape_T, interpret=interpret,
    )(xr.reshape(n2, n1, L), xi.reshape(n2, n1, L))
    outs = pl.pallas_call(
        functools.partial(_k3_body, n1, False),
        compiler_params=params, grid=(n2 // block_b,),
        in_specs=[spec_bT, spec_bT], out_specs=(spec_b, spec_b),
        out_shape=(jax.ShapeDtypeStruct((n1, n2, L), jnp.float32),
                   jax.ShapeDtypeStruct((n1, n2, L), jnp.float32)),
        interpret=interpret,
    )(y_r, y_i)
    return outs[0].reshape(n, L), outs[1].reshape(n, L)


def fft_pow2_planes(xr, xi, *, inverse=False, ortho=False, interpret=None):
    """Four-step FFT of float32 planes (N, L), natural order in and out.

    Forward is unscaled (or 1/sqrt(N) with ``ortho``); inverse is 1/N
    (or 1/sqrt(N)).  N must be a power of two.
    """
    n, L = xr.shape
    if not _is_pow2(n):
        raise ValueError(f"N={n} must be a power of two")
    n1, n2 = _split_n(n)
    block_b, block_c = _choose_blocks(n, n1, n2, L, None, None)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if inverse:
        scale = 1.0 / np.sqrt(n) if ortho else 1.0 / n
    else:
        scale = 1.0 / np.sqrt(n) if ortho else 1.0
    return _fft_impl(xr, xi, n1=n1, n2=n2, block_b=block_b,
                     block_c=block_c, inverse=inverse,
                     scale=float(scale), interpret=interpret)
