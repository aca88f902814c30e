"""Fused forward polyphase filter bank (FIR tap-sum + channelizing DFT)
as one pallas HBM pass.

XLA's natural formulation of the PFB forward (reference pfb.py:103-154)
costs ~5x its bytes on v5e: the tap-sum ``sum_t taps[t] * x[t:t+m]``
re-reads the window once per tap from HBM (measured 2.6 ms of the
2.96 ms stage at m=2^14 — tools/profile_fwd.py), and the channelizing
DFT's middle-axis contraction relayouts the array around four matmuls.
Here each row block crosses HBM once: the shifted tap reads hit VMEM,
and the DFT rides the otherwise-idle MXU as a flat (L, L) ``F (x)
I_reps`` lane matmul (zero relayouts, 2x the useful flops — free under
the HBM stream).

Streaming overlap-save form only (the compiled planes pipelines,
models/compiled.py): the window is (carry | block) where ``carry`` is
the previous block's last ``n_tap - 1`` rows; row blocks after the
first take their leading halo rows from the block itself via a second,
fine-grained view of the same input array (no copies).  The
per-iteration ``scale`` multiplies block rows only — the carry holds
already-scaled samples (same contract as ops/spectral_filter.py).

Row layout: a "row" is one output spectrum's worth of raw samples —
``L = n * reps`` lanes in (sample-within-block major, trailing-dims
minor) order, i.e. ``x.reshape(m, L)`` of the flat (samples, *extra)
stream planes.  Output rows are channelized spectra in (channel major,
trailing minor) lane order, matching ``ops.dft_matmul._expanded_mats``
and the ``pre`` mixers of the fused inverse (models/compiled.py
_FusedDechanInvPFB).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dft_matmul import kernel_dot, matmul_precision

__all__ = ["pfb_forward_stream", "forward_geometry_ok", "choose_block_rows"]


def choose_block_rows(m, hb, cap=1024):
    """Largest divisor of ``m`` that is a multiple of ``hb`` and <= cap
    (0 when none exists)."""
    best = 0
    for b in range(hb, cap + 1, hb):
        if m % b == 0:
            best = b
    return best


def forward_geometry_ok(m, L, n_tap):
    """True when an (m out-rows, L lanes, n_tap) forward PFB fits the
    kernel: lane count on the 128 grid, the halo within one 8-row
    sub-block granule, and a usable row-block divisor."""
    if L % 128 or not 2 <= n_tap <= 9:
        return False
    return choose_block_rows(m, 8) >= 8


def _fwd_body(n_tap, hb, scaled, with_dft, prec, *refs):
    """One (block_rows, L) output tile: assemble the (block + halo)
    window in VMEM, tap-sum on the VPU, channelize on the MXU
    (``with_dft=False`` emits the raw tap-sum — the polyphase branches
    — for chains whose downstream IDFT cancelled the DFT)."""
    i = pl.program_id(0)
    idx = 0
    s = None
    if scaled:
        s = refs[idx][0]
        idx += 1
    (cr_ref, ci_ref, hr_ref, hi_ref, xr_ref, xi_ref,
     taps_ref) = refs[idx:idx + 7]
    if with_dft:
        fr_ref, fi_ref = refs[idx + 7:idx + 9]
    yr_ref, yi_ref = refs[-2], refs[-1]

    xb_r = xr_ref[:]
    xb_i = xi_ref[:]
    hr = hr_ref[:]
    hi = hi_ref[:]
    if scaled:
        xb_r = xb_r * s
        xb_i = xb_i * s
        hr = hr * s
        hi = hi * s
    first = i == 0
    prev_r = jnp.where(first, cr_ref[:], hr)
    prev_i = jnp.where(first, ci_ref[:], hi)

    k = n_tap - 1
    wr = jnp.concatenate([prev_r[hb - k:], xb_r], axis=0)
    wi = jnp.concatenate([prev_i[hb - k:], xb_i], axis=0)
    b = xb_r.shape[0]
    taps = taps_ref[:]
    ar = taps[0:1] * wr[0:b]
    ai = taps[0:1] * wi[0:b]
    for t in range(1, n_tap):
        ar = ar + taps[t:t + 1] * wr[t:t + b]
        ai = ai + taps[t:t + 1] * wi[t:t + b]

    if not with_dft:
        yr_ref[:] = ar
        yi_ref[:] = ai
        return
    fr = fr_ref[:]
    fi = fi_ref[:]
    yr_ref[:] = kernel_dot(ar, fr, prec) - kernel_dot(ai, fi, prec)
    yi_ref[:] = kernel_dot(ar, fi, prec) + kernel_dot(ai, fr, prec)


@functools.partial(jax.jit, static_argnames=("n_tap", "hb", "block_rows",
                                             "scaled", "with_dft",
                                             "interpret", "prec"))
def _pfb_forward_impl(args, *, n_tap, hb, block_rows, scaled, with_dft,
                      interpret, prec):
    i = 0
    scale = None
    if scaled:
        scale = args[i]
        i += 1
    if with_dft:
        cr, ci, xr, xi, taps, fr, fi = args[i:i + 7]
    else:
        cr, ci, xr, xi, taps = args[i:i + 5]
    m, L = xr.shape
    nb = m // block_rows
    rpb = block_rows // hb  # halo sub-blocks per row block

    spec_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    spec_main = pl.BlockSpec((block_rows, L), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    # fine-grained second view of x: the hb rows just before this row
    # block (clamped at the first block, where the carry is used)
    spec_halo = pl.BlockSpec(
        (hb, L), lambda i: (jnp.maximum(i * rpb - 1, 0), 0),
        memory_space=pltpu.VMEM)
    in_specs = []
    k_args = []
    if scaled:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        k_args.append(scale)
    in_specs += [spec_full, spec_full, spec_halo, spec_halo,
                 spec_main, spec_main, spec_full]
    k_args += [cr, ci, xr, xi, xr, xi, taps]
    if with_dft:
        in_specs += [spec_full, spec_full]
        k_args += [fr, fi]

    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    return pl.pallas_call(
        functools.partial(_fwd_body, n_tap, hb, scaled,
                          with_dft, prec),
        compiler_params=params,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=(spec_main, spec_main),
        out_shape=(jax.ShapeDtypeStruct((m, L), jnp.float32),
                   jax.ShapeDtypeStruct((m, L), jnp.float32)),
        interpret=interpret,
    )(*k_args)


def pfb_forward_stream(carry_r, carry_i, xr, xi, taps, fr=None, fi=None,
                       *, n_tap, scale=None, block_rows=None,
                       interpret=None):
    """Channelized spectra planes from streaming raw planes.

    Parameters
    ----------
    carry_r, carry_i : (n_tap - 1, L) f32
        Previous block's trailing rows (zeros at stream start).
    xr, xi : (m, L) f32
        New block rows.
    taps : (n_tap, L) f32
        Per-lane FIR weights (channel taps tiled over trailing dims).
    fr, fi : (L, L) f32 or None
        Expanded forward DFT planes (``dft_matmul._expanded_mats``);
        None emits the raw tap-sum (polyphase branches) instead — for
        compiled chains whose downstream dechannelize IDFT cancels the
        DFT analytically (models/compiled.py round-trip fusion).
    scale : scalar or None
        Multiplies the block (and its self-halo) rows only.

    Returns (yr, yi) of shape (m, L).
    """
    m, L = xr.shape
    k = n_tap - 1
    hb = 8 * -(-k // 8)
    if block_rows is None:
        block_rows = choose_block_rows(m, hb)
    if not block_rows or m % block_rows or block_rows % hb:
        raise ValueError(f"no usable row-block split for m={m}, "
                         f"n_tap={n_tap}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cp = jnp.zeros((hb - k, L), jnp.float32)
    cr = jnp.concatenate([cp, jnp.asarray(carry_r, jnp.float32)], axis=0) \
        if hb != k else jnp.asarray(carry_r, jnp.float32)
    ci = jnp.concatenate([cp, jnp.asarray(carry_i, jnp.float32)], axis=0) \
        if hb != k else jnp.asarray(carry_i, jnp.float32)
    args = []
    if scale is not None:
        args.append(jnp.asarray(scale, jnp.float32).reshape(1))
    args += [cr, ci, jnp.asarray(xr, jnp.float32),
             jnp.asarray(xi, jnp.float32),
             jnp.asarray(taps, jnp.float32)]
    with_dft = fr is not None
    if with_dft:
        args += [jnp.asarray(fr, jnp.float32),
                 jnp.asarray(fi, jnp.float32)]
    # the active matmul precision must be part of the jit cache key:
    # a module-global read inside an already-cached nested jit would be
    # silently stale (ops/dft_matmul.set_matmul_precision)
    return _pfb_forward_impl(tuple(args), n_tap=n_tap, hb=hb,
                             block_rows=block_rows,
                             scaled=scale is not None,
                             with_dft=with_dft, interpret=interpret,
                             prec=matmul_precision())
