"""Fused overlap-save spectral filtering with lane mixing (pallas).

Generalizes the four-step dedispersion pipeline of
``ops/dedisperse_pallas.py`` into the one primitive most padded tasks
reduce to:

    y = trim( IFFT_k( FFT_k( pre(window) ) * G[k, lane] ) @ post )

where the FFT runs along axis 0 (time/spectra rows), ``G`` is an
arbitrary per-(row, lane) complex gain (a dedispersion chirp, a Wiener
deconvolution gain, a convolution response FT, ...), and ``pre``/
``post`` are optional (L, L) complex lane-mixing matrices applied on the
128-lane axis as MXU matmuls inside the first/last kernel:

* ``post`` = the inverse-DFT matrix of a :class:`Dechannelize` fuses the
  channel→time corner of ``Dedisperse → Dechannelize`` chains into the
  same three HBM passes as plain dedispersion (reference
  dispersion.py:135-139 + channelize.py:90);
* ``pre`` = IDFT ⊗ I_pol fuses the ``Dechannelize`` feeding an
  :class:`InversePolyphaseFilterBank` into its per-polyphase Wiener
  deconvolution (reference pfb.py:157-255), because a lane-axis mix
  commutes with the row-axis FFT.

The trim (overlap-save pad discard) happens in the last kernel: with
pads that are multiples of N2, the valid rows are a contiguous block of
the inverse stage-A output, so the pads never reach HBM.

Two entry points:

* :func:`spectral_filter_pow2` — full padded window in, trimmed block out
  (both float32 re/im plane pairs).
* :func:`spectral_filter_stream` — streaming form: the window is
  assembled in VMEM from the overlap-save carry (pad rows) plus the new
  block, with a per-iteration SMEM scale, so no XLA pass ever touches
  the padded window (same trick as ``dedisperse_fold_stream``).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dedisperse_pallas import (_choose_blocks, _is_pow2, _split_n,
                                _stage_a_twiddle, _stage_b, _stockham)
from .dft_matmul import kernel_dot, matmul_precision

__all__ = ["spectral_filter_pow2", "spectral_filter_stream",
           "lane_dft_mats", "expand_lane_mats"]


def lane_dft_mats(n, *, inverse=True):
    """(wr, wi) float32 planes of the (n, n) DFT / inverse-DFT matrix
    W[j, k] = exp(∓2πi j k / n) (/n for the inverse), for use as a
    ``pre``/``post`` lane mixer."""
    sign = 2.0 if inverse else -2.0
    theta = sign * np.pi / n * np.outer(np.arange(n), np.arange(n))
    scale = 1.0 / n if inverse else 1.0
    return ((np.cos(theta) * scale).astype(np.float32),
            (np.sin(theta) * scale).astype(np.float32))


def expand_lane_mats(mats, reps):
    """Expand (n, n) lane matrices to (n·reps, n·reps) acting on a
    lane axis ordered (chan-major, rep-minor): W ⊗ I_reps."""
    wr, wi = mats
    n = wr.shape[0]
    eye = np.eye(reps, dtype=np.float32)
    return (np.kron(wr, eye).reshape(n * reps, n * reps),
            np.kron(wi, eye).reshape(n * reps, n * reps))


def _lane_matmul(rr, ii, wr_ref, wi_ref, prec):
    """(rows..., L) planes @ complex (L, L) matrix, on the MXU."""
    shape = rr.shape
    rr2 = rr.reshape(-1, shape[-1])
    ii2 = ii.reshape(-1, shape[-1])
    wr = wr_ref[:]
    wi = wi_ref[:]
    out_r = kernel_dot(rr2, wr, prec) - kernel_dot(ii2, wi, prec)
    out_i = kernel_dot(rr2, wi, prec) + kernel_dot(ii2, wr, prec)
    return out_r.reshape(shape), out_i.reshape(shape)


# -- kernel bodies --------------------------------------------------------

def _k1_filter_body(n1, n2, n, pre, scale_smem, prec, *refs):
    """Stage-A FFT (+ twiddle), from either a full window or
    (carry, block) pieces, with optional SMEM scale and pre lane-mix.

    In the streaming form the scale multiplies the BLOCK piece only:
    the carry holds the previous block's (already-scaled) samples, so a
    whole-window scale would double-apply it (the caller stores the
    scaled tail as the next carry).
    """
    i = 0
    if scale_smem:
        s = refs[i][0]
        i += 1
    if pre:
        wr_ref, wi_ref = refs[i], refs[i + 1]
        i += 2
    pieces = refs[i:-2]
    yr_ref, yi_ref = refs[-2], refs[-1]
    if len(pieces) == 2:
        xr, xi = pieces[0][:], pieces[1][:]
        if scale_smem:
            xr = xr * s
            xi = xi * s
    else:
        cr, ci, xr_ref, xi_ref = pieces
        xb_r, xb_i = xr_ref[:], xi_ref[:]
        if scale_smem:
            xb_r = xb_r * s
            xb_i = xb_i * s
        xr = jnp.concatenate([cr[:], xb_r], axis=0)
        xi = jnp.concatenate([ci[:], xb_i], axis=0)
    if pre:
        xr, xi = _lane_matmul(xr, xi, wr_ref, wi_ref, prec)
    rr, ii = _stockham(xr, xi, -1.0)
    _stage_a_twiddle(rr, ii, n1, n, yr_ref, yi_ref)


def _k3_trim_body(n1, kf, ke, post, prec, *refs):
    """Inverse stage-A, discard the kf/ke pad row-blocks, optional post
    lane-mix, natural-order store (valid rows only)."""
    if post:
        wr_ref, wi_ref, zr_ref, zi_ref = refs[:4]
    else:
        zr_ref, zi_ref = refs[:2]
    or_ref, oi_ref = refs[-2], refs[-1]
    rr, ii = _stockham(zr_ref[:].astype(jnp.float32).swapaxes(0, 1),
                       zi_ref[:].astype(jnp.float32).swapaxes(0, 1),
                       +1.0, scale=1.0 / n1)
    rr = rr[kf:n1 - ke]
    ii = ii[kf:n1 - ke]
    if post:
        rr, ii = _lane_matmul(rr, ii, wr_ref, wi_ref, prec)
    or_ref[:] = rr
    oi_ref[:] = ii


#: scoped-VMEM cap handed to Mosaic.  100 MiB is the measured sweet
#: spot: raising it to the 128 MiB physical ceiling lets Mosaic choose
#: larger tiles that HALVE the config-3 quad chain (round-5 A/B:
#: 3.37 ms/block at 100M vs 6.55 ms at 128M, same geometry).  The one
#: shipped geometry that does not fit 100M (config3big: 2^16-row
#: window at L=512 lanes, 127.8 MB scoped at the minimum legal tile)
#: must raise this module global to 128 MiB before its first compile
#: (the bench's config3big does); jit caches key on shapes, so a
#: per-geometry value is safe as long as it is set before that
#: geometry first compiles.
VMEM_LIMIT_BYTES = 100 * 1024 * 1024


# -- host-side op ---------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "n1", "n2", "kf", "ke", "block_b", "block_c", "pre", "post",
    "stream", "scaled", "interpret", "prec"))
def _spectral_filter_impl(args, *, n1, n2, kf, ke, block_b, block_c,
                          pre, post, stream, scaled, interpret,
                          prec=jax.lax.Precision.HIGHEST):
    # `prec` (the active matmul precision) must ride the jit cache key:
    # read via a module global inside this already-cached jit it would
    # be silently stale (ops/dft_matmul.set_matmul_precision)
    n = n1 * n2
    params = pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)
    i = 0
    scale = None
    if scaled:
        scale = args[i]
        i += 1
    pre_mats = ()
    if pre:
        pre_mats = args[i:i + 2]
        i += 2
    post_mats = ()
    if post:
        post_mats = args[i:i + 2]
        i += 2
    if stream:
        cr, ci, xr, xi = args[i:i + 4]
        i += 4
    else:
        xr, xi = args[i:i + 2]
        i += 2
    gr, gi = args[i:i + 2]
    L = xr.shape[-1]

    spec_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    spec_bT = pl.BlockSpec((block_b, n1, L), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = []
    k1_args = []
    if scaled:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        k1_args.append(scale)
    if pre:
        in_specs += [spec_full, spec_full]
        k1_args += list(pre_mats)
    if stream:
        kc = (kf + ke)  # carry rows / n2

        def blk(rows):
            return pl.BlockSpec((rows, block_b, L), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
        in_specs += [blk(kc), blk(kc), blk(n1 - kc), blk(n1 - kc)]
        k1_args += [cr.reshape(kc, n2, L), ci.reshape(kc, n2, L),
                    xr.reshape(n1 - kc, n2, L),
                    xi.reshape(n1 - kc, n2, L)]
    else:
        spec_b = pl.BlockSpec((n1, block_b, L), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
        in_specs += [spec_b, spec_b]
        k1_args += [xr.reshape(n1, n2, L), xi.reshape(n1, n2, L)]

    y_r, y_i = pl.pallas_call(
        functools.partial(_k1_filter_body, n1, n2, n, bool(pre),
                          bool(scaled), prec),
        compiler_params=params,
        grid=(n2 // block_b,),
        in_specs=in_specs,
        out_specs=(spec_bT, spec_bT),
        out_shape=(jax.ShapeDtypeStruct((n2, n1, L), jnp.float32),
                   jax.ShapeDtypeStruct((n2, n1, L), jnp.float32)),
        interpret=interpret,
    )(*k1_args)

    z_r, z_i = _stage_b(y_r, y_i, gr, gi, n1=n1, n2=n2,
                        block_c=block_c, interpret=interpret,
                        params=params)

    n1v = n1 - kf - ke
    spec_out = pl.BlockSpec((n1v, block_b, L), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    k3_specs = ([spec_full, spec_full] if post else []) + \
        [spec_bT, spec_bT]
    k3_args = list(post_mats) + [z_r, z_i]
    o_r, o_i = pl.pallas_call(
        functools.partial(_k3_trim_body, n1, kf, ke, bool(post),
                          prec),
        compiler_params=params,
        grid=(n2 // block_b,),
        in_specs=k3_specs,
        out_specs=(spec_out, spec_out),
        out_shape=(jax.ShapeDtypeStruct((n1v, n2, L), jnp.float32),
                   jax.ShapeDtypeStruct((n1v, n2, L), jnp.float32)),
        interpret=interpret,
    )(*k3_args)
    return o_r.reshape(n1v * n2, L), o_i.reshape(n1v * n2, L)


def _check_geometry(n, pad_start, pad_end):
    if not _is_pow2(n):
        raise ValueError(f"window {n} must be a power of two")
    n1, n2 = _split_n(n)
    for name, val in (("pad_start", pad_start), ("pad_end", pad_end)):
        if val % n2:
            raise ValueError(f"{name}={val} must be a multiple of N2={n2} "
                             f"(window {n} = {n1}x{n2})")
    if pad_start + pad_end >= n:
        raise ValueError("pads leave no valid rows")
    return n1, n2, pad_start // n2, pad_end // n2


def geometry_ok(n, pad_start, pad_end):
    """True when an (n, pad_start, pad_end) window satisfies the fused
    kernels' geometry (pow2 window, pads on the N2 grid) — used by the
    pallas-engine task constructors to downgrade gracefully when e.g. a
    short stream clamped the frame below the planned pow2 size."""
    if not _is_pow2(n):
        return False
    n2 = _split_n(n)[1]
    return pad_start % n2 == 0 and pad_end % n2 == 0


def _check_gain(gr, n1, n2, L):
    if gr.shape != (n2, n1, L):
        raise ValueError(f"gain storage shape {gr.shape} does not match "
                         f"the (N2, N1, L) = ({n2}, {n1}, {L}) window "
                         f"layout (permute_to_storage_order)")


def _as_mats(mats):
    if mats is None:
        return ()
    wr, wi = mats
    return (jnp.asarray(wr, jnp.float32), jnp.asarray(wi, jnp.float32))


def spectral_filter_pow2(xr, xi, gr, gi, *, pad_start, pad_end,
                         pre=None, post=None, block_b=None, block_c=None,
                         interpret=None):
    """Fused trim(IFFT(FFT(pre(x)) · G) @ post) over a padded window.

    Parameters
    ----------
    xr, xi : (N, L) float32
        Padded window planes; N a power of two, the first ``pad_start``
        and last ``pad_end`` rows are overlap-save pads (multiples of N2
        — round pads up with :func:`split_n`).
    gr, gi : (N2, N1, L) float32
        Complex gain in four-step storage order
        (``permute_to_storage_order``): a chirp, a Wiener gain, a
        response FT...
    pre, post : (wr, wi) pairs of (L, L) float32, optional
        Lane-mixing matrices applied before the forward / after the
        inverse transform (e.g. from :func:`lane_dft_mats`).

    Returns trimmed (N - pads, L) float32 planes.
    """
    n, L = xr.shape
    n1, n2, kf, ke = _check_geometry(n, pad_start, pad_end)
    _check_gain(gr, n1, n2, L)
    block_b, block_c = _choose_blocks(n, n1, n2, L, block_b, block_c)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    args = _as_mats(pre) + _as_mats(post) + (xr, xi, gr, gi)
    return _spectral_filter_impl(
        args, n1=n1, n2=n2, kf=kf, ke=ke, block_b=block_b,
        block_c=block_c, pre=pre is not None, post=post is not None,
        stream=False, scaled=False, interpret=interpret,
        prec=matmul_precision())


def spectral_filter_stream(cr, ci, xr, xi, gr, gi, *, pad_start, pad_end,
                           scale=None, pre=None, post=None, block_b=None,
                           block_c=None, interpret=None):
    """Streaming :func:`spectral_filter_pow2`: window = [carry | block].

    ``cr``/``ci`` : (pad_start + pad_end, L) carry planes (the last pad
    rows of the previous — already scaled — window); ``xr``/``xi`` :
    (N - pads, L) block planes; ``scale`` : optional (1,) float32
    multiplying the BLOCK rows in VMEM (per-iteration variation without
    an HBM pass; the caller must store the scaled block tail as the
    next carry so carries keep their own iteration's scale).  The
    window is assembled inside the stage-A kernel, so the padded array
    never exists in HBM.  Output rows [pad_start, N - pad_end) of the
    window, i.e. exactly one block of valid samples.
    """
    pad = pad_start + pad_end
    n = pad + xr.shape[0]
    L = xr.shape[-1]
    n1, n2, kf, ke = _check_geometry(n, pad_start, pad_end)
    if cr.shape[0] != pad:
        raise ValueError(f"carry must hold pad_start + pad_end = {pad} "
                         f"rows, got {cr.shape[0]}")
    _check_gain(gr, n1, n2, L)
    block_b, block_c = _choose_blocks(n, n1, n2, L, block_b, block_c)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scaled = scale is not None
    args = ((jnp.asarray(scale, jnp.float32).reshape(1),) if scaled
            else ())
    args += _as_mats(pre) + _as_mats(post) + (cr, ci, xr, xi, gr, gi)
    return _spectral_filter_impl(
        args, n1=n1, n2=n2, kf=kf, ke=ke, block_b=block_b,
        block_c=block_c, pre=pre is not None, post=post is not None,
        prec=matmul_precision(), stream=True, scaled=scaled,
        interpret=interpret)
