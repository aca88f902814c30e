"""Fused z-template bank correlation for the acceleration search.

The XLA formulation in ``models/accelsearch.py`` materializes the
(n_seg, n_z, seg_len) complex correlation tensor in HBM three times
(template product, inverse FFT, power), ~36 bytes per (sample, trial) —
round 4 measured it 10x above its byte floor and flagged it the one
stagnant perf row.  The fix is the kernel here: per spectrum segment,

    corr[:, z] = |IFFT_rows( spec[:, None] * tf[:, z] )|^2 [trimmed]

with the z bank riding the 128 TPU lanes.  The template transfer
functions stay RESIDENT in VMEM across the whole segment grid, the
segment spectrum (seg_len complex = 64 KB) is the only HBM read per
step, the inverse FFT runs in-VMEM over all 128 lanes at once
(mixed-radix Stockham, ``ops/dedisperse_pallas._stockham``), and the
only HBM write is the trimmed float32 power map — the complex
intermediates never leave VMEM.  HBM bytes per segment drop from
~36·n_z·seg_len to 16·seg_len + 4·n_z·valid (~7x), and the FFT
arithmetic overlaps the power-map stream.

Reference scope: the reference package has no searching; this implements
the correlation of Ransom, Eikenberry & Middleditch (2002) §3 the
TPU-native way.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dedisperse_pallas import _is_pow2, _stockham

__all__ = ["accel_correlate_bank", "LANES"]

#: the z bank is padded to full TPU lane count (zero templates -> zero
#: power; a 64-wide bank would halve every vector op, CLAUDE.md)
LANES = 128

#: largest segment the kernel fits in scoped VMEM.  The Stockham stages
#: hold ~30 live (seg_len, LANES) float32 planes; at 8192 that is a
#: measured 119.8 MiB kernel stack against the 100 MiB scoped limit
#: (v5e compile error, round 5) — 4096 needs ~60 MiB and the total HBM
#: traffic is unchanged (per-segment reads and the trimmed power write
#: both scale with n_freq, not seg_len).
MAX_SEG_LEN = 4096


def _kernel(seg_len, valid, scale, sr_ref, si_ref, tr_ref, ti_ref,
            out_ref):
    """One segment: broadcast-multiply by the resident bank, inverse
    Stockham FFT over rows for all lanes, power, trim."""
    sr = sr_ref[0]                       # (seg_len, 1) float32
    si = si_ref[0]
    tr = tr_ref[:]                       # (seg_len, LANES) resident
    ti = ti_ref[:]
    xr = sr * tr - si * ti
    xi = sr * ti + si * tr
    rr, ii = _stockham(xr.reshape(seg_len, 1, LANES),
                       xi.reshape(seg_len, 1, LANES), +1.0, scale=scale)
    rr = rr.reshape(seg_len, LANES)[:valid]
    ii = ii.reshape(seg_len, LANES)[:valid]
    out_ref[0] = rr * rr + ii * ii


@functools.partial(jax.jit, static_argnames=("valid", "interpret"))
def _accel_correlate_impl(sr, si, tr, ti, *, valid, interpret):
    n_seg, seg_len, _ = sr.shape
    seg_spec = pl.BlockSpec((1, seg_len, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    bank_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, valid, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    params = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        functools.partial(_kernel, seg_len, valid, 1.0 / seg_len),
        compiler_params=params,
        grid=(n_seg,),
        in_specs=(seg_spec, seg_spec, bank_spec, bank_spec),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_seg, valid, LANES),
                                       jnp.float32),
        interpret=interpret,
    )(sr, si, tr, ti)


def accel_correlate_bank(segs, tf_r, tf_i, *, valid, interpret=None):
    """Correlate spectrum segments against a z-template bank, fused.

    Parameters
    ----------
    segs : (n_seg, seg_len) complex64
        Overlap-save segments of the normalized power spectrum.
    tf_r, tf_i : (seg_len, LANES) float32
        Conjugated template transfer functions, one per lane (pad unused
        lanes with zeros).
    valid : int
        Correlation lags to keep per segment (seg_len - template span).

    Returns the (n_seg, valid, LANES) float32 power map.  ``seg_len``
    must be a power of two.
    """
    n_seg, seg_len = segs.shape
    if not _is_pow2(seg_len):
        raise ValueError(f"seg_len {seg_len} must be a power of two")
    if seg_len > MAX_SEG_LEN:
        raise ValueError(
            f"seg_len {seg_len} exceeds the kernel's VMEM budget "
            f"(max {MAX_SEG_LEN}: the in-VMEM FFT holds ~30 "
            f"(seg_len, {LANES}) float32 planes; 8192 was measured at "
            "119.8 MiB against the 100 MiB scoped limit). Use a "
            f"seg_len <= {MAX_SEG_LEN} window — the trimmed-output HBM "
            "traffic is the same.")
    if tf_r.shape != (seg_len, LANES):
        raise ValueError(f"bank planes must be ({seg_len}, {LANES}), "
                         f"got {tf_r.shape}")
    if not 0 < valid <= seg_len:
        raise ValueError(f"valid {valid} out of range")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sr = jnp.real(segs).astype(jnp.float32)[..., None]
    si = jnp.imag(segs).astype(jnp.float32)[..., None]
    return _accel_correlate_impl(sr, si, jnp.asarray(tf_r),
                                 jnp.asarray(tf_i), valid=valid,
                                 interpret=interpret)


def _bank_kernel(prec, fr_ref, fi_ref, ka_ref, kb_ref, kc_ref, out_ref):
    """One (seg_tile x col_tile) output block: three Karatsuba dots
    with the power epilogue fused — the t/u/v correlation tensors live
    only in VMEM (the XLA formulation writes and re-reads all three,
    ~3.2 GB per 2^22-sample search)."""
    from .dft_matmul import kernel_dot
    fr = fr_ref[:]
    fi = fi_ref[:]
    t = kernel_dot(fr + fi, ka_ref[:], prec)
    u = kernel_dot(fi, kb_ref[:], prec)
    v = kernel_dot(fr, kc_ref[:], prec)
    cr = t - u
    ci = t + v
    out_ref[:] = cr * cr + ci * ci


@functools.partial(jax.jit, static_argnames=("seg_tile", "col_tile",
                                             "interpret", "prec"))
def _bank_matmul_impl(fr, fi, ka, kb, kc, *, seg_tile, col_tile,
                      interpret, prec):
    n_seg, L = fr.shape
    n_cols = ka.shape[1]
    grid = (n_cols // col_tile, n_seg // seg_tile)
    seg_spec = pl.BlockSpec((seg_tile, L), lambda j, i: (i, 0),
                            memory_space=pltpu.VMEM)
    op_spec = pl.BlockSpec((L, col_tile), lambda j, i: (0, j),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((seg_tile, col_tile), lambda j, i: (i, j),
                            memory_space=pltpu.VMEM)
    params = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        functools.partial(_bank_kernel, prec),
        compiler_params=params,
        grid=grid,
        in_specs=(seg_spec, seg_spec, op_spec, op_spec, op_spec),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_seg, n_cols), jnp.float32),
        interpret=interpret,
    )(fr, fi, ka, kb, kc)


def bank_matmul_power(fr, fi, ka, kb, kc, *, seg_tile=256,
                      col_tile=512, interpret=None):
    """Fused Karatsuba bank correlation + power for the accel search's
    mx engine.

    fr, fi : (n_seg, L) float32 segment planes (n_seg % seg_tile == 0;
        the caller pads segments — padded rows map past n_freq and are
        trimmed by the final slice).
    ka, kb, kc : (L, n_cols) float32 Karatsuba operator planes with
        columns in flattened (lag, z) order (n_cols % col_tile == 0,
        zero-pad extra columns).

    Returns the (n_seg, n_cols) power block,
    ``|sum_f seg[s, f] M[f, kz]|^2``.  Grid order keeps the operator
    tiles resident across the segment sweep: HBM traffic is one read
    of the segments per column tile, one read of the operator, one
    write of the power map — the three (n_seg, n_cols) correlation
    intermediates never leave VMEM.
    """
    from .dft_matmul import matmul_precision

    n_seg, L = fr.shape
    n_cols = ka.shape[1]
    if n_seg % seg_tile or n_cols % col_tile:
        raise ValueError(f"shapes ({n_seg}, {n_cols}) must tile by "
                         f"({seg_tile}, {col_tile})")
    if ka.shape != (L, n_cols):
        raise ValueError(f"operator planes must be ({L}, {n_cols})")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _bank_matmul_impl(fr, fi, ka, kb, kc, seg_tile=seg_tile,
                             col_tile=col_tile, interpret=interpret,
                             prec=matmul_precision())
