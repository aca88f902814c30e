"""Single-HBM-pass fused dedisperse → detect → fold for small windows.

The three-kernel four-step pipeline in :mod:`~.ops.dedisperse_pallas`
exists because its overlap-save window (the whole block + pads) is far
too large for VMEM, so the FFT must make three passes over HBM.  But the
window size is a *choice*: overlap-save is exact for any window that
covers the dispersion smear (reference base.py:709-795 semantics), and
at per-channel rates the smear is often tiny (DM=500 at 1.4 GHz in a
250 kHz channel ≈ 95 samples).  With a 2048–4096-sample window, the
entire FFT → chirp → IFFT → detect → fold chain for one window fits in
VMEM, and the input block crosses HBM **once**:

  per sample          three-pass pipeline      this kernel
  HBM traffic         ~56 B (f32 planes)       ~8.5 B  (f32, /0.75 hop)

One ``pallas_call`` runs a sequential grid over windows; window ``w``
assembles its padded input in VMEM from three views of the same block
(its ``hop`` rows, the tail of window w-1's rows, the head of window
w+1's) — the block-edge windows take their outer pads from the halo
buffers exchanged between shards.  The FFT is the same four-step
(N = N1·N2) decomposition as the big pipeline — stage A along the N1
axis, twiddle, stage B, chirp in d-major storage order, mirrored
inverse — just chained inside a single kernel, with the fold's one-hot
MXU matmul accumulating (n_phase+1, L) profiles across the grid.

Fold semantics (fixed-point (i0, p) phase map, trash bin for pad rows,
Stokes lane layout) are bit-identical to
:func:`~.ops.dedisperse_pallas.dedisperse_fold_split`; tests compare the
two directly.

Status (measured, v5e via tunnel, tools/bench_resident.py, 2026-08):
despite the ~6x lower HBM traffic the single-pass kernel is *slower*
than the three-pass pipeline — 4.74e9 samples/s at N=2048 (hop 1536)
vs 5.0e9 for the pipeline on the same block, same run — because the
per-window FFT work no longer overlaps a long HBM stream.  The
``engine='mxu'`` variant (stage DFTs as dense HIGHEST-precision MXU
matmuls) is slower still (3.13e9 at N=4096: M=K=64 tiles fill a
quarter of the systolic array, the f32 emulation costs 6 bf16 passes,
and the 2D<->3D reshapes between stages are relayouts), though it
closes on the Stockham engine as the window grows (2.14/2.61/3.13e9
at N=1024/2048/4096 vs 3.70/4.74/4.54e9).  Both engines are kept as
correct, tested alternatives; production dedisperse+fold stays on
:func:`~.ops.dedisperse_pallas.dedisperse_fold_split`.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dedisperse_pallas import (_FX_MASK, _check_n_phase,
                                _detect_fold_accumulate, _fold_vector,
                                _is_pow2, _stockham)

__all__ = ["dedisperse_fold_resident", "resident_geometry"]


def resident_geometry(n_window, pad_start, pad_end):
    """(hop, n1, n2) for a resident window; validates divisibility.

    ``hop = n_window - pad_start - pad_end`` must be a positive multiple
    of both pads (the in-kernel neighbor views index the block in
    pad-sized tiles).
    """
    if not _is_pow2(n_window):
        raise ValueError(f"n_window={n_window} must be a power of two")
    hop = n_window - pad_start - pad_end
    if hop <= 0:
        raise ValueError("pads leave no valid samples in the window")
    for name, p in (("pad_start", pad_start), ("pad_end", pad_end)):
        if p <= 0 or hop % p:
            raise ValueError(f"{name}={p} must be a positive divisor "
                             f"of hop={hop}")
    k = n_window.bit_length() - 1
    n1 = 1 << (k // 2)
    return hop, n1, n_window // n1


@functools.lru_cache(maxsize=None)
def _dft_mats_np(n, sign, scale=1.0):
    """(2, n, n) float32 [cos, sin] planes of scale·exp(sign·2πi jk/n)."""
    th = sign * 2.0 * np.pi / n * np.outer(np.arange(n), np.arange(n))
    return np.stack([np.cos(th) * scale,
                     np.sin(th) * scale]).astype(np.float32)


def _mm(a, b):
    """f32 matmul at HIGHEST precision (bf16x3 passes on the MXU)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _cmm(f, xr, xi):
    """Apply a (2, n, n) complex DFT matrix to (n, K) complex planes."""
    fr, fi = f[0], f[1]
    return _mm(fr, xr) - _mm(fi, xi), _mm(fr, xi) + _mm(fi, xr)


def _window_dft_convolve(win_r, win_i, cr, ci, fa, fb, ia, ib, n1, n2):
    """Four-step y = IFFT(FFT(x)·chirp) with the stage FFTs as MXU matmuls.

    Same decomposition as :func:`_window_fft_convolve`, but each length
    n1/n2 stage transform is a dense DFT matmul (the stages are short —
    64-128 points — so the O(n²) arithmetic rides the otherwise-idle
    systolic array instead of serializing VPU butterfly passes).
    fa/fb : (2, n1, n1)/(2, n2, n2) forward matrices; ia/ib the inverses
    with the 1/n1, 1/n2 scales folded in.
    """
    n = n1 * n2
    L = win_r.shape[-1]
    ar, ai = _cmm(fa, win_r.reshape(n1, n2 * L),
                  win_i.reshape(n1, n2 * L))
    ar = ar.reshape(n1, n2, L)
    ai = ai.reshape(n1, n2, L)
    c = jax.lax.broadcasted_iota(jnp.int32, (n1, n2, 1), 0
                                 ).astype(jnp.float32)
    b = jax.lax.broadcasted_iota(jnp.int32, (n1, n2, 1), 1
                                 ).astype(jnp.float32)
    theta = (-2.0 * np.pi / n) * c * b
    wr, wi = jnp.cos(theta), jnp.sin(theta)
    yr = (ar * wr - ai * wi).swapaxes(0, 1).reshape(n2, n1 * L)
    yi = (ar * wi + ai * wr).swapaxes(0, 1).reshape(n2, n1 * L)
    br_, bi_ = _cmm(fb, yr, yi)
    br_ = br_.reshape(n2, n1, L)
    bi_ = bi_.reshape(n2, n1, L)
    mr = br_ * cr - bi_ * ci
    mi = br_ * ci + bi_ * cr
    br_, bi_ = _cmm(ib, mr.reshape(n2, n1 * L), mi.reshape(n2, n1 * L))
    br_ = br_.reshape(n2, n1, L)
    bi_ = bi_.reshape(n2, n1, L)
    bb = jax.lax.broadcasted_iota(jnp.int32, (n2, n1, 1), 0
                                  ).astype(jnp.float32)
    cc = jax.lax.broadcasted_iota(jnp.int32, (n2, n1, 1), 1
                                  ).astype(jnp.float32)
    theta2 = (+2.0 * np.pi / n) * cc * bb
    w2r, w2i = jnp.cos(theta2), jnp.sin(theta2)
    zr = (br_ * w2r - bi_ * w2i).swapaxes(0, 1).reshape(n1, n2 * L)
    zi = (br_ * w2i + bi_ * w2r).swapaxes(0, 1).reshape(n1, n2 * L)
    or_, oi_ = _cmm(ia, zr, zi)
    return or_.reshape(n1, n2, L), oi_.reshape(n1, n2, L)


def _window_fft_convolve(win_r, win_i, cr, ci, n1, n2):
    """Four-step y = IFFT(FFT(x)·chirp) entirely in VMEM.

    win_r/i : (N, L); cr/ci : (n2, n1, L) chirp in d-major storage order
    (k = d·n1 + c; build with
    :func:`~.ops.dedisperse_pallas.permute_to_storage_order`).
    Returns natural-order (n1, n2, L) planes (time t = c·n2 + b).
    """
    n = n1 * n2
    L = win_r.shape[-1]
    v_r = win_r.reshape(n1, n2, L)
    v_i = win_i.reshape(n1, n2, L)
    # stage A: FFT over c (length n1, the strided-by-n2 subsequences)
    ar, ai = _stockham(v_r, v_i, -1.0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n1, n2, 1), 0
                                 ).astype(jnp.float32)
    b = jax.lax.broadcasted_iota(jnp.int32, (n1, n2, 1), 1
                                 ).astype(jnp.float32)
    theta = (-2.0 * np.pi / n) * c * b
    wr, wi = jnp.cos(theta), jnp.sin(theta)
    yr = (ar * wr - ai * wi).swapaxes(0, 1)         # (n2=b, n1=c', L)
    yi = (ar * wi + ai * wr).swapaxes(0, 1)
    # stage B: FFT over b -> d; multiply by the storage-order chirp
    br, bi = _stockham(yr, yi, -1.0)
    mr = br * cr - bi * ci
    mi = br * ci + bi * cr
    # inverse stage B (d -> b), conjugate twiddle
    br, bi = _stockham(mr, mi, +1.0, scale=1.0 / n2)
    bb = jax.lax.broadcasted_iota(jnp.int32, (n2, n1, 1), 0
                                  ).astype(jnp.float32)
    cc = jax.lax.broadcasted_iota(jnp.int32, (n2, n1, 1), 1
                                  ).astype(jnp.float32)
    theta2 = (+2.0 * np.pi / n) * cc * bb
    w2r, w2i = jnp.cos(theta2), jnp.sin(theta2)
    zr = (br * w2r - bi * w2i).swapaxes(0, 1)       # (n1=c', n2=b, L)
    zi = (br * w2i + bi * w2r).swapaxes(0, 1)
    # inverse stage A (c' -> c): natural time order (n1, n2, L)
    return _stockham(zr, zi, +1.0, scale=1.0 / n1)


def _resident_body(n1, n2, ps, pe, hop, n_w, n_phase, stokes,
                   fold_ref, scale_ref,
                   fr_ref, fi_ref, er_ref, ei_ref,
                   xmr_ref, xmi_ref, xpr_ref, xpi_ref,
                   xnr_ref, xni_ref, cr_ref, ci_ref,
                   *rest):
    prof_ref, cnt_ref = rest[-2], rest[-1]
    mats = rest[:-2]
    w = pl.program_id(0)
    n = n1 * n2
    s = scale_ref[0]
    # window assembly: outer halo buffers at the block edges, neighbor
    # rows elsewhere (the w=0 / w=n_w-1 neighbor views are clamped
    # in-range by the index maps and simply ignored here)
    front_r = jnp.where(w == 0, fr_ref[:], xpr_ref[:])
    front_i = jnp.where(w == 0, fi_ref[:], xpi_ref[:])
    end_r = jnp.where(w == n_w - 1, er_ref[:], xnr_ref[:])
    end_i = jnp.where(w == n_w - 1, ei_ref[:], xni_ref[:])
    win_r = jnp.concatenate([front_r, xmr_ref[:], end_r], axis=0) * s
    win_i = jnp.concatenate([front_i, xmi_ref[:], end_i], axis=0) * s
    if mats:
        fa_ref, fb_ref, ia_ref, ib_ref = mats
        rr, ii = _window_dft_convolve(
            win_r, win_i, cr_ref[:], ci_ref[:], fa_ref[:], fb_ref[:],
            ia_ref[:], ib_ref[:], n1, n2)
    else:
        rr, ii = _window_fft_convolve(win_r, win_i, cr_ref[:], ci_ref[:],
                                      n1, n2)
    # fold: window row r is block-local time w*hop + r (t=0 at the
    # block's front-halo start, the include_pad convention); rows
    # outside [ps, ps+hop) land in the trash bin n_phase.  Detection,
    # the fixed-point bin map and the one-hot MXU accumulate are the
    # SAME code as the three-pass pipeline's K3, so fold semantics stay
    # bit-identical by construction.
    r = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    t_idx = w * hop + r
    valid = (r >= ps) & (r < ps + hop)
    _detect_fold_accumulate(rr, ii, t_idx, valid, n_phase,
                            fold_ref, prof_ref, cnt_ref, w == 0)


@functools.partial(jax.jit, static_argnames=(
    "n1", "n2", "ps", "pe", "hop", "n_phase", "stokes", "mxu",
    "interpret"))
def _resident_impl(xr, xi, fr, fi, er, ei, chr_, chi, fold, scale, *,
                   n1, n2, ps, pe, hop, n_phase, stokes, mxu, interpret):
    T, L = xr.shape
    n_w = T // hop
    wout = 3 * L if stokes else L
    spec_smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    spec_vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    spec_main = pl.BlockSpec((hop, L), lambda w: (w, 0),
                             memory_space=pltpu.VMEM)
    kf = hop // ps
    ke = hop // pe
    spec_prev = pl.BlockSpec(
        (ps, L), lambda w: (jnp.maximum(w * kf - 1, 0), 0),
        memory_space=pltpu.VMEM)
    spec_next = pl.BlockSpec(
        (pe, L), lambda w: (jnp.minimum((w + 1) * ke, T // pe - 1), 0),
        memory_space=pltpu.VMEM)
    spec_prof = pl.BlockSpec((n_phase + 1, wout), lambda w: (0, 0),
                             memory_space=pltpu.VMEM)
    spec_cnt = pl.BlockSpec((1, n_phase + 1), lambda w: (0, 0),
                            memory_space=pltpu.VMEM)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    extra_in = []
    extra_specs = []
    if mxu:
        extra_in = [jnp.asarray(_dft_mats_np(n1, -1.0)),
                    jnp.asarray(_dft_mats_np(n2, -1.0)),
                    jnp.asarray(_dft_mats_np(n1, +1.0, 1.0 / n1)),
                    jnp.asarray(_dft_mats_np(n2, +1.0, 1.0 / n2))]
        extra_specs = [spec_vmem] * 4
    prof, cnt = pl.pallas_call(
        functools.partial(_resident_body, n1, n2, ps, pe, hop, n_w,
                          n_phase, stokes),
        compiler_params=params,
        grid=(n_w,),
        in_specs=[spec_smem, spec_smem,
                  spec_vmem, spec_vmem, spec_vmem, spec_vmem,
                  spec_main, spec_main, spec_prev, spec_prev,
                  spec_next, spec_next, spec_vmem, spec_vmem,
                  *extra_specs],
        out_specs=(spec_prof, spec_cnt),
        out_shape=(jax.ShapeDtypeStruct((n_phase + 1, wout), jnp.float32),
                   jax.ShapeDtypeStruct((1, n_phase + 1), jnp.float32)),
        interpret=interpret,
    )(fold, scale, fr, fi, er, ei, xr, xi, xr, xi, xr, xi, chr_, chi,
      *extra_in)
    return prof, cnt[0]


def dedisperse_fold_resident(xr, xi, fr, fi, er, ei, chirp_storage_r,
                             chirp_storage_i, fold, scale, *,
                             n_window, n_phase, pad_start, pad_end,
                             stokes=False, engine="stockham",
                             interpret=None):
    """Single-pass fused dedisperse → detect → fold over small windows.

    Parameters
    ----------
    xr, xi : (T, L) float32
        Block planes; ``T`` must be a multiple of
        ``hop = n_window - pad_start - pad_end``.
    fr, fi : (pad_start, L); er, ei : (pad_end, L)
        Halo edges for the block's outermost windows (from neighbor
        shards or the stream's running history).
    chirp_storage_r/i : (N2, N1, L) float32
        Chirp for the *window* length in d-major four-step storage order.
    fold : (3,) int32 ``[i0_fx, p_fx, 0]``
        Fixed-point phase map with t = 0 at the front-halo start
        (include-pad convention, as
        :func:`~.ops.dedisperse_pallas.dedisperse_fold_split`).
    scale : (1,) float32
        Input scale applied during window assembly.
    engine : 'stockham' or 'mxu'
        Window-FFT implementation: VPU Stockham butterfly passes, or
        dense DFT matmuls on the MXU (the n1/n2 stage transforms are
        64-256 points — exactly DFT-matmul shaped; same numerics at
        HIGHEST matmul precision).

    Returns ``(profile (n_phase+1, L or 3L), counts (n_phase+1,))``;
    row ``n_phase`` is the pad trash bin.
    """
    if engine not in ("stockham", "mxu"):
        raise ValueError(f"engine={engine!r} must be 'stockham' or 'mxu'")
    hop, n1, n2 = resident_geometry(n_window, pad_start, pad_end)
    T, L = xr.shape
    if T % hop:
        raise ValueError(f"block length {T} must be a multiple of "
                         f"hop={hop}")
    if fr.shape != (pad_start, L) or er.shape != (pad_end, L):
        raise ValueError("halo buffers must be (pad_start, L)/(pad_end, L)")
    if chirp_storage_r.shape != (n2, n1, L):
        raise ValueError(f"chirp storage must be ({n2}, {n1}, {L})")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _resident_impl(
        xr, xi, fr, fi, er, ei, chirp_storage_r, chirp_storage_i,
        _fold_vector(fold), scale, n1=n1, n2=n2, ps=int(pad_start),
        pe=int(pad_end), hop=hop, n_phase=_check_n_phase(n_phase),
        stokes=bool(stokes), mxu=(engine == "mxu"),
        interpret=bool(interpret))
