"""Pallas TPU kernels: fused coherent dedispersion for power-of-two blocks.

The dedispersion hot loop is FFT → chirp multiply → IFFT.  XLA's monolithic
long FFT runs several× off the HBM bound for our shape (one long transform
over 128 lanes); these kernels use the four-step (Cooley–Tukey N = N1·N2)
decomposition so every sub-FFT is a short, VMEM-resident Stockham radix-2
transform, and the whole dedispersion becomes three fused passes over HBM:

  K1: stage-A FFT (length N1 over rows) × inter-stage twiddle
  K2: stage-B FFT (length N2) × chirp × inverse stage-B × conj twiddle
  K3: inverse stage-A (optionally fused with |·|² detection)

Frequency bins live in "digit-transposed" d-major storage order (d, c) ↔
k = d·N1 + c between K1 and K3; the chirp is pre-permuted to match, so the
classic four-step transpose never materializes in HBM.  K1 writes its
result transposed (one in-VMEM swap) so that K2 — the VMEM-pressure
hotspot with six live tiles — runs with no transposes at all; K3 swaps
once on load.

Complex data is carried as separate float32 real/imag planes with the
channel axis on the 128 TPU lanes.  All twiddles are computed in-kernel
from iota (no tables in HBM).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dedisperse_pow2", "dedisperse_pow2_planes",
           "dedisperse_fold_pow2", "dedisperse_fold_stream",
           "fold_phase_vector", "fold_bins_ref",
           "permute_to_storage_order", "stockham_ref"]


def _is_pow2(n):
    return n > 0 and (n & (n - 1)) == 0


def _split_n(n):
    """N = N1 * N2, both powers of two, N1 <= N2.

    N1 is kept as the smaller factor: the stage-A/inverse-A kernels hold
    full (N1, block, L) tiles in VMEM (double-buffered), so N1 bounds
    their footprint.  A balanced split also keeps N2 small, which lets the
    stage-B kernel use sublane-aligned (8, N2, L) tiles — measured 35%
    faster than a lopsided 256x1024 split at N=2^18.
    """
    k = n.bit_length() - 1
    k1 = min(k // 2, 9)  # N1 <= 512 keeps stage-A tiles within VMEM
    return 1 << k1, 1 << (k - k1)


def permute_to_storage_order(arr, n1, n2):
    """Natural frequency order k -> four-step storage order (d, c).

    storage[d, c] = arr[d * n1 + c]; arr has the frequency axis first.
    The d-major (N2, N1, ...) layout matches the transposed stage-A
    output, so the stage-B kernel reads everything swap-free.
    """
    rest = arr.shape[1:]
    return np.ascontiguousarray(arr.reshape((n2, n1) + rest))


def _stockham(re, im, sign, scale=None):
    """Mixed radix-4/2 DIF Stockham autosort FFT along axis 0 (power of 2).

    re, im : (n, B, L) float32 values; sign -1 forward, +1 inverse
    (the caller applies any 1/n scaling via ``scale``).  Radix-4 halves the
    number of full-array passes vs radix-2.
    """
    n_total = re.shape[0]
    trailing = re.shape[1:]

    def iota_theta(m, n):
        p = jax.lax.broadcasted_iota(
            jnp.int32, (m, 1) + (1,) * len(trailing), 0
            ).astype(jnp.float32)
        return (sign * 2.0 * np.pi / n) * p

    n, s = n_total, 1
    cur_r = re.reshape((n_total, 1) + trailing)
    cur_i = im.reshape((n_total, 1) + trailing)
    r2 = float(np.sqrt(0.5))
    while n > 1:
        if n % 8 == 0:
            # radix-8 = two DFT-4s over (X_k ± X_{k+4}) with an omega_8
            # layer; covers three levels per stack/reshape relayout
            # (512 = 8^3: three stages instead of five).
            m = n // 8
            X = [(cur_r[k * m:(k + 1) * m], cur_i[k * m:(k + 1) * m])
                 for k in range(8)]

            def dft4(z0, z1, z2, z3):
                (a_r, a_i), (b_r, b_i), (c_r, c_i), (d_r, d_i) = \
                    z0, z1, z2, z3
                pr, pi = a_r + c_r, a_i + c_i
                qr, qi = a_r - c_r, a_i - c_i
                ur, ui = b_r + d_r, b_i + d_i
                vr, vi = -sign * (b_i - d_i), sign * (b_r - d_r)
                return [(pr + ur, pi + ui), (qr + vr, qi + vi),
                        (pr - ur, pi - ui), (qr - vr, qi - vi)]

            B = [(X[k][0] + X[k + 4][0], X[k][1] + X[k + 4][1])
                 for k in range(4)]
            Dk = [(X[k][0] - X[k + 4][0], X[k][1] - X[k + 4][1])
                  for k in range(4)]
            # C_k = D_k * omega8^k, omega8 = (1 + sign*i)/sqrt(2)
            c1r = r2 * (Dk[1][0] - sign * Dk[1][1])
            c1i = r2 * (Dk[1][1] + sign * Dk[1][0])
            c2r, c2i = -sign * Dk[2][1], sign * Dk[2][0]
            c3r = r2 * (-Dk[3][0] - sign * Dk[3][1])
            c3i = r2 * (-Dk[3][1] + sign * Dk[3][0])
            E = dft4(B[0], B[1], B[2], B[3])
            O = dft4(Dk[0], (c1r, c1i), (c2r, c2i), (c3r, c3i))
            th = iota_theta(m, n)
            ys_r, ys_i = [E[0][0]], [E[0][1]]
            interleaved = [O[0], E[1], O[1], E[2], O[2], E[3], O[3]]
            for j, (zr, zi) in enumerate(interleaved, start=1):
                wr, wi = jnp.cos(j * th), jnp.sin(j * th)
                ys_r.append(zr * wr - zi * wi)
                ys_i.append(zr * wi + zi * wr)
            cur_r = jnp.stack(ys_r, axis=1).reshape((m, 8 * s) + trailing)
            cur_i = jnp.stack(ys_i, axis=1).reshape((m, 8 * s) + trailing)
            n, s = m, 8 * s
        elif n % 4 == 0:
            m = n // 4
            Ar, Ai = cur_r[:m], cur_i[:m]
            Br, Bi = cur_r[m:2 * m], cur_i[m:2 * m]
            Cr, Ci = cur_r[2 * m:3 * m], cur_i[2 * m:3 * m]
            Dr, Di = cur_r[3 * m:], cur_i[3 * m:]
            ACr, ACi = Ar + Cr, Ai + Ci
            acr, aci = Ar - Cr, Ai - Ci
            BDr, BDi = Br + Dr, Bi + Di
            bdr, bdi = Br - Dr, Bi - Di
            th = iota_theta(m, n)
            w1r, w1i = jnp.cos(th), jnp.sin(th)
            w2r, w2i = jnp.cos(2 * th), jnp.sin(2 * th)
            w3r, w3i = jnp.cos(3 * th), jnp.sin(3 * th)
            # sign*i*(bdr + i*bdi) = -sign*bdi + i*sign*bdr
            ibd_r = -sign * bdi
            ibd_i = sign * bdr
            y0r, y0i = ACr + BDr, ACi + BDi
            t1r, t1i = acr + ibd_r, aci + ibd_i
            y1r = t1r * w1r - t1i * w1i
            y1i = t1r * w1i + t1i * w1r
            t2r, t2i = ACr - BDr, ACi - BDi
            y2r = t2r * w2r - t2i * w2i
            y2i = t2r * w2i + t2i * w2r
            t3r, t3i = acr - ibd_r, aci - ibd_i
            y3r = t3r * w3r - t3i * w3i
            y3i = t3r * w3i + t3i * w3r
            cur_r = jnp.stack([y0r, y1r, y2r, y3r], axis=1).reshape(
                (m, 4 * s) + trailing)
            cur_i = jnp.stack([y0i, y1i, y2i, y3i], axis=1).reshape(
                (m, 4 * s) + trailing)
            n, s = m, 4 * s
        else:
            m = n // 2
            ar, ai = cur_r[:m], cur_i[:m]
            br, bi = cur_r[m:], cur_i[m:]
            t0r, t0i = ar + br, ai + bi
            dr, di = ar - br, ai - bi
            th = iota_theta(m, n)
            wr, wi = jnp.cos(th), jnp.sin(th)
            t1r = dr * wr - di * wi
            t1i = dr * wi + di * wr
            cur_r = jnp.stack([t0r, t1r], axis=1).reshape(
                (m, 2 * s) + trailing)
            cur_i = jnp.stack([t0i, t1i], axis=1).reshape(
                (m, 2 * s) + trailing)
            n, s = m, 2 * s
    out_r = cur_r.reshape((n_total,) + trailing)
    out_i = cur_i.reshape((n_total,) + trailing)
    if scale is not None:
        out_r = out_r * scale
        out_i = out_i * scale
    return out_r, out_i


def stockham_ref(x, inverse=False):
    """Host-callable reference of the in-kernel FFT (for tests)."""
    re, im = jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32)
    shape = re.shape
    re = re.reshape(shape[0], 1, -1)
    im = im.reshape(shape[0], 1, -1)
    sign = 1.0 if inverse else -1.0
    scale = 1.0 / shape[0] if inverse else None
    r, i = _stockham(re, im, sign, scale)
    return (r + 1j * i).reshape(shape)


# -- kernel bodies -------------------------------------------------------

def _stage_a_twiddle(rr, ii, n1, n, yr_ref, yi_ref):
    """Apply the inter-stage twiddle W_N^{c b} and store *transposed*.

    The (n1, bb, L) stage-A result is written as (bb, n1, L) tiles of a
    d-major (N2, N1, L) array: this single transpose here lets the
    stage-B kernel (which transforms along N2, and is the VMEM-pressure
    hotspot) run with no transposes at all on its six tiles.
    """
    bb = rr.shape[1]
    i0 = pl.program_id(0) * bb
    c = jax.lax.broadcasted_iota(jnp.int32, (n1, bb, 1), 0
                                 ).astype(jnp.float32)
    b = jax.lax.broadcasted_iota(jnp.int32, (n1, bb, 1), 1
                                 ).astype(jnp.float32) + i0
    theta = (-2.0 * np.pi / n) * c * b
    wr, wi = jnp.cos(theta), jnp.sin(theta)
    # the output ref's dtype (f32, or bf16 when the caller trades
    # intermediate-plane precision for HBM bandwidth) sets the store
    yr_ref[:] = (rr * wr - ii * wi).swapaxes(0, 1).astype(yr_ref.dtype)
    yi_ref[:] = (rr * wi + ii * wr).swapaxes(0, 1).astype(yi_ref.dtype)


def _k1_body(n1, n2, n, xr_ref, xi_ref, yr_ref, yi_ref):
    """Stage-A FFT along axis 0 plus inter-stage twiddle W_N^{c b}."""
    rr, ii = _stockham(xr_ref[:], xi_ref[:], -1.0)
    _stage_a_twiddle(rr, ii, n1, n, yr_ref, yi_ref)


def _k1_body_planes(n1, n2, n, x2_ref, yr_ref, yi_ref):
    """As `_k1_body` but reading one planes-first (2, N1, bb, L) input.

    Lets the caller feed data stored as a single (2, N, L) array — the
    natural loop-carry layout when complex never materializes — without
    an extra HBM pass splitting it into separate re/im planes.
    """
    rr, ii = _stockham(x2_ref[0], x2_ref[1], -1.0)
    _stage_a_twiddle(rr, ii, n1, n, yr_ref, yi_ref)


def _k1_body_stream(n1, n2, n, s_ref, f_ref, x_ref, e_ref, yr_ref, yi_ref):
    """Stage-A reading the *unpadded* source block plus halo edge buffers.

    When the overlap-save pads are multiples of N2, the shifted window
    reshape aligns with the (n1, n2) grid: window row c of any column
    tile is source row c - kf (with the first kf rows coming from the
    left halo edge and the last ke from the right).  So instead of the
    caller materializing a padded window in HBM (a full extra read+write
    pass), this kernel assembles each tile in VMEM from three inputs and
    also applies the per-iteration scale from SMEM — the pipeline step
    touches the raw data exactly once before the FFT.
    """
    s = s_ref[0]
    xr = jnp.concatenate([f_ref[0], x_ref[0], e_ref[0]], axis=0) * s
    xi = jnp.concatenate([f_ref[1], x_ref[1], e_ref[1]], axis=0) * s
    rr, ii = _stockham(xr, xi, -1.0)
    _stage_a_twiddle(rr, ii, n1, n, yr_ref, yi_ref)


def _k2_body(n1, n2, n, yr_ref, yi_ref, cr_ref, ci_ref, zr_ref, zi_ref):
    """Stage-B FFT, chirp multiply, inverse stage-B, conj twiddle.

    All tiles live in the d-major (N2, bc, L) layout the stage-A kernel
    wrote (and the chirp is pre-stored in), so the transform axis is
    already axis 0: no transposes anywhere in this kernel.  Tiles and
    chirp may arrive bf16 (bandwidth mode); all arithmetic is f32.
    """
    rr, ii = _stockham(yr_ref[:].astype(jnp.float32),
                       yi_ref[:].astype(jnp.float32), -1.0)
    cr = cr_ref[:].astype(jnp.float32)
    ci = ci_ref[:].astype(jnp.float32)
    mr = rr * cr - ii * ci
    mi = rr * ci + ii * cr
    rr, ii = _stockham(mr, mi, +1.0, scale=1.0 / n2)
    bc = yr_ref.shape[1]
    i0 = pl.program_id(0) * bc
    b = jax.lax.broadcasted_iota(jnp.int32, (n2, bc, 1), 0
                                 ).astype(jnp.float32)
    c = jax.lax.broadcasted_iota(jnp.int32, (n2, bc, 1), 1
                                 ).astype(jnp.float32) + i0
    theta = (+2.0 * np.pi / n) * c * b
    wr, wi = jnp.cos(theta), jnp.sin(theta)
    zr_ref[:] = (rr * wr - ii * wi).astype(zr_ref.dtype)
    zi_ref[:] = (rr * wi + ii * wr).astype(zi_ref.dtype)


def _k2_body_theta(n1, n2, n, yr_ref, yi_ref, th_ref, zr_ref, zi_ref):
    """As `_k2_body` but with the chirp stored as one phase plane.

    ``th_ref`` holds the chirp angle in cycles (mod 1, float32 — the mod-1
    reduction happened on the host in float64, so no precision is lost);
    cos/sin are computed here on the VPU, halving the chirp's HBM read
    traffic relative to separate cos+sin planes.
    """
    rr, ii = _stockham(yr_ref[:].astype(jnp.float32),
                       yi_ref[:].astype(jnp.float32), -1.0)
    ang = (2.0 * np.pi) * th_ref[:]
    cr = jnp.cos(ang)
    ci = jnp.sin(ang)
    mr = rr * cr - ii * ci
    mi = rr * ci + ii * cr
    rr, ii = _stockham(mr, mi, +1.0, scale=1.0 / n2)
    bc = yr_ref.shape[1]
    i0 = pl.program_id(0) * bc
    b = jax.lax.broadcasted_iota(jnp.int32, (n2, bc, 1), 0
                                 ).astype(jnp.float32)
    c = jax.lax.broadcasted_iota(jnp.int32, (n2, bc, 1), 1
                                 ).astype(jnp.float32) + i0
    theta = (+2.0 * np.pi / n) * c * b
    wr, wi = jnp.cos(theta), jnp.sin(theta)
    zr_ref[:] = (rr * wr - ii * wi).astype(zr_ref.dtype)
    zi_ref[:] = (rr * wi + ii * wr).astype(zi_ref.dtype)


def _k3_body(n1, power, zr_ref, zi_ref, *out_refs):
    """Inverse stage-A; optionally emit detected power instead of re/im.

    Reads d-major (bb, n1, L) tiles of the stage-B output (one transpose
    on load) and writes natural (n1, bb, L) time-order tiles.
    """
    # cast BEFORE the transpose: f32 sublane swaps are the fast path;
    # a packed-bf16 transpose would shuffle half-words
    rr, ii = _stockham(zr_ref[:].astype(jnp.float32).swapaxes(0, 1),
                       zi_ref[:].astype(jnp.float32).swapaxes(0, 1),
                       +1.0, scale=1.0 / n1)
    if power:
        out_refs[0][:] = rr * rr + ii * ii
    else:
        out_refs[0][:] = rr
        out_refs[1][:] = ii


def _detect_fold_accumulate(rr, ii, t_idx, valid, n_phase,
                            fold_ref, prof_ref, cnt_ref, first):
    """Shared detect -> fixed-point bin -> one-hot MXU fold accumulate.

    ``rr``/``ii`` : (A, B, L) dedispersed voltage planes; ``t_idx`` /
    ``valid`` : (A*B, 1) int32/bool local time index and validity of each
    row (invalid rows land in the trash bin ``n_phase``); ``first`` marks
    the grid step that initializes the accumulators.  Full-Stokes
    detection is selected by the profile width (3L lanes, pol pairing by
    a one-lane roll); see `_k3_fold_body` for the fixed-point phase-map
    semantics.  Used by both the three-pass pipeline's K3 and the
    single-pass resident kernel so the fold stays bit-identical.
    """
    power = rr * rr + ii * ii
    L = power.shape[2]
    if prof_ref.shape[1] == 3 * L:
        # pltpu.roll requires a non-negative shift: L-1 = -1 (mod L)
        rr1 = pltpu.roll(rr, L - 1, 2)
        ii1 = pltpu.roll(ii, L - 1, 2)
        detect = jnp.concatenate(
            [power, rr * rr1 + ii * ii1, ii * rr1 - rr * ii1], axis=2)
    else:
        detect = power
    rows = power.shape[0] * power.shape[1]
    num = (fold_ref[0] + t_idx * fold_ref[1]) & jnp.int32(0x7FFFFFFF)
    hi = num >> 16
    lo = num & jnp.int32(0xFFFF)
    bins = ((hi * n_phase) + ((lo * n_phase) >> 16)) >> 15
    bins = jnp.where(valid, bins, n_phase)
    phase_iota = jax.lax.broadcasted_iota(
        jnp.int32, (rows, n_phase + 1), 1)
    onehot = (bins == phase_iota).astype(jnp.float32)
    contrib = jax.lax.dot_general(
        onehot, detect.reshape(rows, detect.shape[2]),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # (n_phase+1, [3]L)
    ccnt = jnp.sum(onehot, axis=0, keepdims=True)   # (1, n_phase+1)

    @pl.when(first)
    def _init():
        prof_ref[:] = contrib
        cnt_ref[:] = ccnt

    @pl.when(jnp.logical_not(first))
    def _acc():
        prof_ref[:] = prof_ref[:] + contrib
        cnt_ref[:] = cnt_ref[:] + ccnt


def _k3_fold_body(n1, n2, pad_start, n_valid, n_phase,
                  fold_ref, zr_ref, zi_ref, prof_ref, cnt_ref):
    """Inverse stage-A fused with detection *and* phase folding.

    Instead of writing the (N, L) power array back to HBM for a separate
    fold pass, each tile's power is folded here with a one-hot matmul on
    the MXU, accumulating a (n_phase+1, L) profile across the sequential
    grid; row ``n_phase`` is the trash bin holding the overlap-save halo
    rows (time index outside [pad_start, pad_start + n_valid)).

    ``fold_ref`` (SMEM, three int32 ``[i0, p, 0]``): pulse phase is the
    *fixed-point* map frac(t) = ((i0 + t·p) mod 2^31) / 2^31 cycles, with
    ``p`` the phase rate in cycles-per-sample scaled by 2^31 and ``i0``
    the scaled phase of local time index 0.  Because the modulus is a
    compile-time power of two, every op below is a multiply, mask or
    shift — int32 wraparound multiplication is exact mod 2^32, so masking
    the low 31 bits gives the phase exactly.  (A runtime-divisor variant
    measured ~40% slower end-to-end: Mosaic cannot strength-reduce a
    dynamic i32 div/mod.)  (i0, p) being *runtime* scalars still lets a
    host-side phase model (e.g. a polyco, reference
    integration.py:380-395 semantics) refresh the linearization every
    block without recompiling; the rate quantization error is at most
    2^-32 cycle/sample (~3e-5 cycles over a 2^17 block).  The phase-bin
    index floor(frac·n_phase) is computed exactly in int32 by splitting
    num into 16-bit halves (requires n_phase <= 2^15; nested-floor
    identity floor(floor(x/2^16)/2^15) = floor(x/2^31)).  Input tiles
    are d-major (bb, n1, L); one transpose on load (the stage-B kernel
    is transpose-free in exchange).
    """
    # cast BEFORE the transpose: f32 sublane swaps are the fast path;
    # a packed-bf16 transpose would shuffle half-words
    rr, ii = _stockham(zr_ref[:].astype(jnp.float32).swapaxes(0, 1),
                       zi_ref[:].astype(jnp.float32).swapaxes(0, 1),
                       +1.0, scale=1.0 / n1)
    bb = rr.shape[1]
    rows = n1 * bb
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    c = r // bb
    b = r - c * bb + pl.program_id(0) * bb
    t_idx = c * n2 + b                              # local time index
    valid = (t_idx >= pad_start) & (t_idx < pad_start + n_valid)
    _detect_fold_accumulate(rr, ii, t_idx, valid, n_phase,
                            fold_ref, prof_ref, cnt_ref,
                            pl.program_id(0) == 0)


# -- host-side op --------------------------------------------------------

def _stage_b(y_r, y_i, chr_, chi, *, n1, n2, block_c, interpret, params):
    """K2: stage-B FFT · chirp · inverse stage-B · conj twiddle.

    Operands and results are d-major (N2, N1, L); tiles block over N1.
    Output dtype follows the input planes (f32, or bf16 in bandwidth
    mode — the in-place aliasing requires them to match anyway)."""
    n = n1 * n2
    L = y_r.shape[-1]
    spec_c = pl.BlockSpec((n2, block_c, L), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_k2_body, n1, n2, n),
        compiler_params=params,
        grid=(n1 // block_c,),
        in_specs=[spec_c, spec_c, spec_c, spec_c],
        out_specs=(spec_c, spec_c),
        out_shape=(jax.ShapeDtypeStruct((n2, n1, L), y_r.dtype),
                   jax.ShapeDtypeStruct((n2, n1, L), y_i.dtype)),
        # z tiles overwrite the (dead after this kernel) y tiles in
        # place: each grid step fully reads its y tile before writing
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
    )(y_r, y_i, chr_, chi)


def _stage_b_theta(y_r, y_i, th, *, n1, n2, block_c, interpret, params):
    """K2 with the single-plane phase chirp."""
    n = n1 * n2
    L = y_r.shape[-1]
    spec_c = pl.BlockSpec((n2, block_c, L), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_k2_body_theta, n1, n2, n),
        compiler_params=params,
        grid=(n1 // block_c,),
        in_specs=[spec_c, spec_c, spec_c],
        out_specs=(spec_c, spec_c),
        out_shape=(jax.ShapeDtypeStruct((n2, n1, L), jnp.float32),
                   jax.ShapeDtypeStruct((n2, n1, L), jnp.float32)),
        interpret=interpret,
    )(y_r, y_i, th)


def _stages_bc(y_r, y_i, chr_, chi, *, n1, n2, block_b, block_c, power,
               interpret, params):
    """Shared K2 (stage-B·chirp·inverse-B) and K3 (inverse stage-A)."""
    L = y_r.shape[-1]
    spec_bT = pl.BlockSpec((block_b, n1, L), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((n1, block_b, L), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    z_r, z_i = _stage_b(y_r, y_i, chr_, chi, n1=n1, n2=n2,
                        block_c=block_c, interpret=interpret, params=params)

    if power:
        out_shape = (jax.ShapeDtypeStruct((n1, n2, L), jnp.float32),)
        out_specs = (spec_b,)
    else:
        out_shape = (jax.ShapeDtypeStruct((n1, n2, L), jnp.float32),
                     jax.ShapeDtypeStruct((n1, n2, L), jnp.float32))
        out_specs = (spec_b, spec_b)
    outs = pl.pallas_call(
        functools.partial(_k3_body, n1, power),
        compiler_params=params,
        grid=(n2 // block_b,),
        in_specs=[spec_bT, spec_bT],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(z_r, z_i)
    n_total = n1 * n2
    if power:
        return outs[0].reshape(n_total, L)
    return outs[0].reshape(n_total, L), outs[1].reshape(n_total, L)


@functools.partial(jax.jit, static_argnames=("n1", "n2", "block_b",
                                             "block_c", "power",
                                             "interpret"))
def _dedisperse_impl(xr, xi, chr_, chi, *, n1, n2, block_b, block_c,
                     power, interpret):
    n = n1 * n2
    L = xr.shape[-1]
    v_r = xr.reshape(n1, n2, L)
    v_i = xi.reshape(n1, n2, L)

    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    spec_b = pl.BlockSpec((n1, block_b, L), lambda i: (0, i, 0),
                          memory_space=pltpu.VMEM)
    spec_bT = pl.BlockSpec((block_b, n1, L), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    y_r, y_i = pl.pallas_call(
        functools.partial(_k1_body, n1, n2, n),
        compiler_params=params,
        grid=(n2 // block_b,),
        in_specs=[spec_b, spec_b],
        out_specs=(spec_bT, spec_bT),
        out_shape=(jax.ShapeDtypeStruct((n2, n1, L), jnp.float32),
                   jax.ShapeDtypeStruct((n2, n1, L), jnp.float32)),
        interpret=interpret,
    )(v_r, v_i)
    return _stages_bc(y_r, y_i, chr_, chi, n1=n1, n2=n2, block_b=block_b,
                      block_c=block_c, power=power, interpret=interpret,
                      params=params)


def _stage_a_planes(x2, *, n1, n2, block_b, interpret, params,
                    out_dtype=jnp.float32):
    """K1 from a planes-first (2, N, L) input."""
    n = n1 * n2
    L = x2.shape[-1]
    v = x2.reshape(2, n1, n2, L)
    spec_x = pl.BlockSpec((2, n1, block_b, L), lambda i: (0, 0, i, 0),
                          memory_space=pltpu.VMEM)
    spec_bT = pl.BlockSpec((block_b, n1, L), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_k1_body_planes, n1, n2, n),
        compiler_params=params,
        grid=(n2 // block_b,),
        in_specs=[spec_x],
        out_specs=(spec_bT, spec_bT),
        out_shape=(jax.ShapeDtypeStruct((n2, n1, L), out_dtype),
                   jax.ShapeDtypeStruct((n2, n1, L), out_dtype)),
        interpret=interpret,
    )(v)


@functools.partial(jax.jit, static_argnames=("n1", "n2", "block_b",
                                             "block_c", "power",
                                             "interpret"))
def _dedisperse_impl_planes(x2, chr_, chi, *, n1, n2, block_b, block_c,
                            power, interpret):
    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    y_r, y_i = _stage_a_planes(x2, n1=n1, n2=n2, block_b=block_b,
                               interpret=interpret, params=params)
    return _stages_bc(y_r, y_i, chr_, chi, n1=n1, n2=n2, block_b=block_b,
                      block_c=block_c, power=power, interpret=interpret,
                      params=params)


def _k1_body_stream2(n1, n2, n, s_ref, fr_ref, fi_ref, xr_ref, xi_ref,
                     er_ref, ei_ref, yr_ref, yi_ref):
    """As `_k1_body_stream` but with separate re/im inputs.

    Measured on the tunnel v5e: XLA streams a leading-(2, N, L) planes
    array at only ~157 GB/s vs ~293 GB/s for flat (N, L) layouts, so
    carrying two separate planes through the loop (and into this kernel)
    avoids both the slow layout and any relayout copy before the call.
    """
    s = s_ref[0]
    xr = jnp.concatenate([fr_ref[:], xr_ref[:], er_ref[:]], axis=0) * s
    xi = jnp.concatenate([fi_ref[:], xi_ref[:], ei_ref[:]], axis=0) * s
    rr, ii = _stockham(xr, xi, -1.0)
    _stage_a_twiddle(rr, ii, n1, n, yr_ref, yi_ref)


def _stage_a_stream2(xr, xi, fr, fi, er, ei, scale, *, n1, n2, block_b,
                     interpret, params, out_dtype=jnp.float32):
    """K1 from separate re/im planes plus per-plane halo edge buffers."""
    n = n1 * n2
    L = xr.shape[-1]
    kf = fr.shape[0] // n2
    ke = er.shape[0] // n2
    nm = n1 - kf - ke

    def blk(rows):
        return pl.BlockSpec((rows, block_b, L), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    spec_s = pl.BlockSpec(memory_space=pltpu.SMEM)
    spec_bT = pl.BlockSpec((block_b, n1, L), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_k1_body_stream2, n1, n2, n),
        compiler_params=params,
        grid=(n2 // block_b,),
        in_specs=[spec_s, blk(kf), blk(kf), blk(nm), blk(nm), blk(ke),
                  blk(ke)],
        out_specs=(spec_bT, spec_bT),
        out_shape=(jax.ShapeDtypeStruct((n2, n1, L), out_dtype),
                   jax.ShapeDtypeStruct((n2, n1, L), out_dtype)),
        interpret=interpret,
    )(scale, fr.reshape(kf, n2, L), fi.reshape(kf, n2, L),
      xr.reshape(nm, n2, L), xi.reshape(nm, n2, L),
      er.reshape(ke, n2, L), ei.reshape(ke, n2, L))



def _fold_pallas_call(z_r, z_i, fold, *, n1, n2, block_b, n_phase,
                      pad_start, n_valid, stokes, params, interpret):
    """Shared K3 launch: inverse stage-A + detect(+Stokes) + MXU fold.

    With ``stokes`` the profile is 3x wider along lanes:
    [power | re(X conj Y) | im(X conj Y)] (cross terms valid on the even
    lanes; the kernel pairs pols by a one-lane roll)."""
    L = z_r.shape[-1]
    wout = 3 * L if stokes else L
    spec_bT = pl.BlockSpec((block_b, n1, L), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_fold = pl.BlockSpec(memory_space=pltpu.SMEM)
    spec_prof = pl.BlockSpec((n_phase + 1, wout), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    spec_cnt = pl.BlockSpec((1, n_phase + 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    prof, cnt = pl.pallas_call(
        functools.partial(_k3_fold_body, n1, n2, pad_start, n_valid,
                          n_phase),
        compiler_params=params,
        grid=(n2 // block_b,),
        in_specs=[spec_fold, spec_bT, spec_bT],
        out_specs=(spec_prof, spec_cnt),
        out_shape=(jax.ShapeDtypeStruct((n_phase + 1, wout), jnp.float32),
                   jax.ShapeDtypeStruct((1, n_phase + 1), jnp.float32)),
        interpret=interpret,
    )(fold, z_r, z_i)
    return prof, cnt[0]




@functools.partial(jax.jit, static_argnames=(
    "n1", "n2", "block_b", "block_c", "n_phase",
    "pad_start", "n_valid", "stokes", "inter_dtype", "interpret"))
def _dedisperse_fold_split_impl(xr, xi, fr, fi, er, ei, chr_, chi, fold,
                                scale, *, n1, n2, block_b, block_c,
                                n_phase, pad_start, n_valid,
                                stokes=False, inter_dtype="float32",
                                interpret=None):
    L = xr.shape[-1]
    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    y_r, y_i = _stage_a_stream2(xr, xi, fr, fi, er, ei, scale, n1=n1,
                                n2=n2, block_b=block_b,
                                interpret=interpret, params=params,
                                out_dtype=jnp.dtype(inter_dtype))
    z_r, z_i = _stage_b(y_r, y_i, chr_, chi, n1=n1, n2=n2,
                        block_c=block_c, interpret=interpret, params=params)
    return _fold_pallas_call(z_r, z_i, fold, n1=n1, n2=n2,
                             block_b=block_b, n_phase=n_phase,
                             pad_start=pad_start, n_valid=n_valid,
                             stokes=stokes, params=params,
                             interpret=interpret)


def dedisperse_fold_split(xr, xi, fr, fi, er, ei, chirp_storage_r,
                          chirp_storage_i, fold, scale, *,
                          n_phase, pad_start, n_valid, stokes=False,
                          block_b=None, block_c=None,
                          inter_dtype="float32", interpret=None):
    """As :func:`dedisperse_fold_stream` with separate re/im planes.

    ``xr``/``xi`` : (T, L); ``fr``/``fi`` : (pad_start, L);
    ``er``/``ei`` : (pad_end, L).  Prefer this on TPU: flat planes
    stream at full HBM bandwidth where a leading-(2, ...) packed array
    measures ~2x slower.

    ``inter_dtype='bfloat16'`` stores the two inter-kernel frequency
    planes (y after K1, z after K2) as bf16, cutting the pipeline's HBM
    traffic from 48 to 32 B/sample (28 with a bf16 chirp — pass
    ``chirp_storage_r/i`` as bf16 arrays; the kernels cast on load).
    All arithmetic stays f32.  The per-*sample* dedispersed voltage
    picks up ~2^-8 relative rounding noise (≈46 dB SNR), so this mode
    is for the fold path, where the profile averages thousands of
    samples per bin and the noise integrates down well below the 60 dB
    correctness bar (see tests/test_pallas_kernels.py).

    Measured (tunnel v5e, tools/profile_kernels.py, 2026-08): the f32
    chain already runs *at* this chip's HBM floor with the Stockham VPU
    work fully hidden, so cutting bytes exposes compute instead of
    saving time — net chain 6.17 ms bf16 vs 5.51 ms f32 at N=2^18
    (bf16 pack/unpack and 16-sublane tiling add more VPU time than the
    33%% traffic cut returns).  Default therefore stays f32; bf16 mode
    is for parts with a higher HBM:compute cost ratio.
    """
    t_main, L = xr.shape
    p0 = fr.shape[0]
    p1 = er.shape[0]
    n = t_main + p0 + p1
    if not _is_pow2(n):
        raise ValueError(f"window {n} must be a power of two")
    n1, n2 = _split_n(n)
    for name, val in (("pad_start", p0), ("pad_end", p1),
                      ("block", t_main)):
        if val % n2 or val == 0:
            raise ValueError(f"{name}={val} must be a non-zero multiple "
                             f"of N2={n2}")
    if p0 != pad_start:
        raise ValueError("front buffer length must equal pad_start")
    block_b, block_c = _choose_blocks(
        n, n1, n2, L, block_b, block_c,
        sub16=jnp.dtype(inter_dtype).itemsize == 2)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _dedisperse_fold_split_impl(
        xr, xi, fr, fi, er, ei, chirp_storage_r, chirp_storage_i,
        _fold_vector(fold),
        scale, n1=n1, n2=n2, block_b=block_b, block_c=block_c,
        n_phase=_check_n_phase(n_phase),
        pad_start=int(pad_start), n_valid=int(n_valid),
        stokes=bool(stokes), inter_dtype=str(inter_dtype),
        interpret=interpret)


def _decode_planes(ref, bits, offset, levels):
    """In-kernel decode of time-plane packed samples.

    ``ref`` holds (rows, bb, L) float32 carriers whose 32-bit words each
    pack ``32/bits`` samples, field k belonging to time plane k (the
    sample k*T/planes later; ops/unpack_device.pack_time_planes).  Each
    plane decodes to a contiguous row block, so the result is shift/mask
    VPU work plus row-block concats — no lane or sublane movement.
    Mosaic has no u32->f32 convert, so fields are masked in int32 (all
    fit) and converted from there.  8/4-bit subtract ``offset``; 2-bit
    maps crumbs through the 4-entry ``levels`` table with nested selects
    (bit-identical to the host LUT); 1-bit maps to levels[0]/levels[3].
    """
    per = 32 // bits
    v = jax.lax.bitcast_convert_type(ref[:], jnp.int32)
    mask = jnp.int32((1 << bits) - 1)
    parts = []
    for k in range(per):
        f = jax.lax.shift_right_logical(v, jnp.int32(bits * k)) & mask
        if bits == 2:
            lv = [jnp.float32(x) for x in levels]
            d = jnp.where(f < 2, jnp.where(f == 0, lv[0], lv[1]),
                          jnp.where(f == 2, lv[2], lv[3]))
        elif bits == 1:
            d = jnp.where(f == 0, jnp.float32(levels[0]),
                          jnp.float32(levels[3]))
        else:
            d = f.astype(jnp.float32) - jnp.float32(offset)
        parts.append(d)
    return jnp.concatenate(parts, axis=0)


def _k1_body_stream2_packed(n1, n2, n, bits, offset, levels, s_ref,
                            fr_ref, fi_ref, xpr_ref, xpi_ref, er_ref,
                            ei_ref, yr_ref, yi_ref):
    """K1 whose MAIN block arrives as packed 1/2/4/8-bit samples.

    The raw packed data is read from HBM exactly once, inside the same
    pass that runs the stage-A FFT — 1/4 (8-bit) to 1/32 (1-bit) of the
    read traffic of float32 planes, with no separate decode pass.  The
    halo edges (pads; a few %% of the block) arrive pre-decoded.
    """
    s = s_ref[0]
    xr = jnp.concatenate([fr_ref[:], _decode_planes(xpr_ref, bits, offset,
                                                    levels),
                          er_ref[:]], axis=0) * s
    xi = jnp.concatenate([fi_ref[:], _decode_planes(xpi_ref, bits, offset,
                                                    levels),
                          ei_ref[:]], axis=0) * s
    rr, ii = _stockham(xr, xi, -1.0)
    _stage_a_twiddle(rr, ii, n1, n, yr_ref, yi_ref)


def _stage_a_stream2_packed(xpr, xpi, fr, fi, er, ei, scale, *, bits,
                            offset, levels, n1, n2, block_b, interpret,
                            params, out_dtype=jnp.float32):
    """K1 from packed sample carriers plus decoded f32 halo edges."""
    n = n1 * n2
    L = xpr.shape[-1]
    kf = fr.shape[0] // n2
    ke = er.shape[0] // n2
    nm = n1 - kf - ke
    planes = 32 // bits
    if nm % planes:
        raise ValueError(f"main rows {nm} must divide by {planes} for "
                         f"{bits}-bit plane-packed input")
    nmp = nm // planes

    def blk(rows):
        return pl.BlockSpec((rows, block_b, L), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    spec_s = pl.BlockSpec(memory_space=pltpu.SMEM)
    spec_bT = pl.BlockSpec((block_b, n1, L), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_k1_body_stream2_packed, n1, n2, n, bits,
                          float(offset), levels),
        compiler_params=params,
        grid=(n2 // block_b,),
        in_specs=[spec_s, blk(kf), blk(kf), blk(nmp), blk(nmp), blk(ke),
                  blk(ke)],
        out_specs=(spec_bT, spec_bT),
        out_shape=(jax.ShapeDtypeStruct((n2, n1, L), out_dtype),
                   jax.ShapeDtypeStruct((n2, n1, L), out_dtype)),
        interpret=interpret,
    )(scale, fr.reshape(kf, n2, L), fi.reshape(kf, n2, L),
      xpr.reshape(nmp, n2, L), xpi.reshape(nmp, n2, L),
      er.reshape(ke, n2, L), ei.reshape(ke, n2, L))


@functools.partial(jax.jit, static_argnames=(
    "bits", "offset", "levels", "n1", "n2", "block_b", "block_c",
    "n_phase", "pad_start", "n_valid", "stokes", "inter_dtype",
    "interpret"))
def _dedisperse_fold_split_packed_impl(xpr, xpi, fr, fi, er, ei, chr_,
                                       chi, fold, scale, *, bits, offset,
                                       levels, n1, n2, block_b, block_c,
                                       n_phase, pad_start, n_valid,
                                       stokes=False,
                                       inter_dtype="float32",
                                       interpret=None):
    L = xpr.shape[-1]
    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    y_r, y_i = _stage_a_stream2_packed(
        xpr, xpi, fr, fi, er, ei, scale, bits=bits, offset=offset,
        levels=levels, n1=n1, n2=n2,
        block_b=block_b, interpret=interpret, params=params,
        out_dtype=jnp.dtype(inter_dtype))
    z_r, z_i = _stage_b(y_r, y_i, chr_, chi, n1=n1, n2=n2,
                        block_c=block_c, interpret=interpret, params=params)
    return _fold_pallas_call(z_r, z_i, fold, n1=n1, n2=n2,
                             block_b=block_b, n_phase=n_phase,
                             pad_start=pad_start, n_valid=n_valid,
                             stokes=stokes, params=params,
                             interpret=interpret)


def dedisperse_fold_split_packed(xpr, xpi, fr, fi, er, ei,
                                 chirp_storage_r, chirp_storage_i, fold,
                                 scale, *, n_phase, pad_start, n_valid,
                                 bits=8, offset=None, levels=None,
                                 stokes=False,
                                 block_b=None, block_c=None,
                                 inter_dtype="float32",
                                 interpret=None):
    """As :func:`dedisperse_fold_split` but the main block arrives as
    packed 1/2/4/8-bit samples riding in float32 carriers.

    ``xpr``/``xpi`` : (t_main * bits // 32, L) float32 carriers (see
    ``ops/unpack_device.pack_time_planes``); ``fr``/``fi``/``er``/
    ``ei`` : decoded float32 halo edges in the SAME units the in-kernel
    decode produces (field - offset, or table levels) — any common
    normalization belongs in ``scale``, which multiplies pads and
    decoded block alike.  ``bits``: 8/4 use ``offset`` (default
    127.5/7.5); 2 maps crumbs through the 4-entry ``levels`` table
    (default VDIF); 1 maps bits to levels[0]/levels[3] (default ±1).
    """
    if bits not in (1, 2, 4, 8):
        raise ValueError("bits must be 1, 2, 4 or 8")
    per = 32 // bits
    if offset is None:
        offset = {8: 127.5, 4: 7.5, 2: 0.0, 1: 0.0}[bits]
    if levels is None:
        levels = ((-3.3359, -1.0, 1.0, 3.3359) if bits == 2
                  else (-1.0, -1.0, 1.0, 1.0))
    levels = tuple(float(v) for v in levels)
    tq, L = xpr.shape
    t_main = tq * per
    p0 = fr.shape[0]
    p1 = er.shape[0]
    n = t_main + p0 + p1
    if not _is_pow2(n):
        raise ValueError(f"window {n} must be a power of two")
    n1, n2 = _split_n(n)
    for name, val in (("pad_start", p0), ("pad_end", p1),
                      ("block", t_main)):
        if val % n2 or val == 0:
            raise ValueError(f"{name}={val} must be a non-zero multiple "
                             f"of N2={n2}")
    if p0 != pad_start:
        raise ValueError("front buffer length must equal pad_start")
    block_b, block_c = _choose_blocks(
        n, n1, n2, L, block_b, block_c,
        sub16=jnp.dtype(inter_dtype).itemsize == 2)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _dedisperse_fold_split_packed_impl(
        xpr, xpi, fr, fi, er, ei, chirp_storage_r, chirp_storage_i,
        _fold_vector(fold), scale, bits=int(bits), offset=float(offset),
        levels=levels, n1=n1, n2=n2,
        block_b=block_b, block_c=block_c,
        n_phase=_check_n_phase(n_phase), pad_start=int(pad_start),
        n_valid=int(n_valid), stokes=bool(stokes),
        inter_dtype=str(inter_dtype), interpret=interpret)


def _stage_a_stream(x2, front, end, scale, *, n1, n2, block_b, interpret,
                    params):
    """K1 assembling padded windows in VMEM from block + halo edges."""
    n = n1 * n2
    L = x2.shape[-1]
    kf = front.shape[1] // n2
    ke = end.shape[1] // n2
    nm = n1 - kf - ke
    v = x2.reshape(2, nm, n2, L)
    vf = front.reshape(2, kf, n2, L)
    ve = end.reshape(2, ke, n2, L)

    def blk(rows):
        return pl.BlockSpec((2, rows, block_b, L), lambda i: (0, 0, i, 0),
                            memory_space=pltpu.VMEM)

    spec_s = pl.BlockSpec(memory_space=pltpu.SMEM)
    spec_bT = pl.BlockSpec((block_b, n1, L), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_k1_body_stream, n1, n2, n),
        compiler_params=params,
        grid=(n2 // block_b,),
        in_specs=[spec_s, blk(kf), blk(nm), blk(ke)],
        out_specs=(spec_bT, spec_bT),
        out_shape=(jax.ShapeDtypeStruct((n2, n1, L), jnp.float32),
                   jax.ShapeDtypeStruct((n2, n1, L), jnp.float32)),
        interpret=interpret,
    )(scale, vf, v, ve)


@functools.partial(jax.jit, static_argnames=(
    "n1", "n2", "block_b", "block_c", "n_phase",
    "pad_start", "n_valid", "stokes", "interpret"))
def _dedisperse_fold_stream_impl(x2, front, end, chr_, chi, fold, scale, *,
                                 n1, n2, block_b, block_c,
                                 n_phase, pad_start, n_valid,
                                 stokes=False, interpret=None):
    L = x2.shape[-1]
    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    y_r, y_i = _stage_a_stream(x2, front, end, scale, n1=n1, n2=n2,
                               block_b=block_b, interpret=interpret,
                               params=params)
    z_r, z_i = _stage_b(y_r, y_i, chr_, chi, n1=n1, n2=n2,
                        block_c=block_c, interpret=interpret, params=params)
    return _fold_pallas_call(z_r, z_i, fold, n1=n1, n2=n2,
                             block_b=block_b, n_phase=n_phase,
                             pad_start=pad_start, n_valid=n_valid,
                             stokes=stokes, params=params,
                             interpret=interpret)


@functools.partial(jax.jit, static_argnames=(
    "n1", "n2", "block_b", "block_c", "n_phase",
    "pad_start", "n_valid", "stokes", "interpret"))
def _dedisperse_fold_stream_theta_impl(x2, front, end, th, fold, scale, *,
                                       n1, n2, block_b, block_c,
                                       n_phase, pad_start, n_valid,
                                       stokes=False, interpret=None):
    L = x2.shape[-1]
    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    y_r, y_i = _stage_a_stream(x2, front, end, scale, n1=n1, n2=n2,
                               block_b=block_b, interpret=interpret,
                               params=params)
    z_r, z_i = _stage_b_theta(y_r, y_i, th, n1=n1, n2=n2,
                              block_c=block_c, interpret=interpret,
                              params=params)
    return _fold_pallas_call(z_r, z_i, fold, n1=n1, n2=n2,
                             block_b=block_b, n_phase=n_phase,
                             pad_start=pad_start, n_valid=n_valid,
                             stokes=stokes, params=params,
                             interpret=interpret)


@functools.partial(jax.jit, static_argnames=(
    "n1", "n2", "block_b", "block_c", "n_phase",
    "pad_start", "n_valid", "stokes", "interpret"))
def _dedisperse_fold_impl(x2, chr_, chi, fold, *, n1, n2, block_b, block_c,
                          n_phase, pad_start, n_valid,
                          stokes=False, interpret=None):
    L = x2.shape[-1]
    params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    y_r, y_i = _stage_a_planes(x2, n1=n1, n2=n2, block_b=block_b,
                               interpret=interpret, params=params)
    z_r, z_i = _stage_b(y_r, y_i, chr_, chi, n1=n1, n2=n2,
                        block_c=block_c, interpret=interpret, params=params)
    return _fold_pallas_call(z_r, z_i, fold, n1=n1, n2=n2,
                             block_b=block_b, n_phase=n_phase,
                             pad_start=pad_start, n_valid=n_valid,
                             stokes=stokes, params=params,
                             interpret=interpret)


def dedisperse_pow2(xr, xi, chirp_storage_r, chirp_storage_i, *,
                    power=False, block_b=None, block_c=None,
                    interpret=None):
    """Fused dedispersion y = IFFT(FFT(x) * chirp) for power-of-two N.

    Parameters
    ----------
    xr, xi : (N, L) float32
        Real/imag planes; N a power of two, L the lane (channel) axis.
    chirp_storage_r/i : (N2, N1, L) float32
        The chirp in d-major four-step storage order: use
        ``permute_to_storage_order(chirp_natural, N1, N2)`` (per-L planes).
    power : bool
        If True return |y|² (single plane) instead of (re, im).
    interpret : bool, optional
        Force pallas interpret mode (auto: True off-TPU).

    Returns (N, L) float32 plane(s).
    """
    n, L = xr.shape
    if not _is_pow2(n):
        raise ValueError(f"N={n} must be a power of two")
    n1, n2 = _split_n(n)
    # K2 holds 6 (block_c, N2, L) f32 tiles double-buffered; prefer
    # block_c=8 (sublane-aligned after the in-kernel transpose) but
    # shrink to keep the total scoped VMEM around <=24 MiB (measured:
    # 2 MiB tiles compile and run fastest, 4 MiB tiles OOM)
    block_b, block_c = _choose_blocks(n, n1, n2, L, block_b, block_c)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _dedisperse_impl(xr, xi, chirp_storage_r, chirp_storage_i,
                            n1=n1, n2=n2, block_b=block_b,
                            block_c=block_c, power=power,
                            interpret=interpret)


def _choose_blocks(n, n1, n2, L, block_b, block_c, sub16=False):
    import os
    if block_b is None:
        block_b = int(os.environ.get("BBT_PALLAS_BLOCK_B", 0)) \
            or max(1, min(8, n2))
    if block_c is None:
        block_c = int(os.environ.get("BBT_PALLAS_BLOCK_C", 0))
        if not block_c:
            # Mosaic requires the sublane (second-to-last) block dim to
            # be a multiple of 8 (16 for 2-byte tiles) or the full dim,
            # so the minimum legal K2 tile is already the choice: wider
            # tiles OOM first (measured: 2 MiB tiles fastest, 4 MiB
            # OOM'd at the flagship shape), and for wide-lane windows
            # (e.g. n2=1024, L=512) even the minimum needs the raised
            # vmem_limit (spectral_filter uses 100 MB) — there is no
            # smaller legal tile to fall back to.
            cap = 16 if (sub16 and n1 % 16 == 0) else 8
            block_c = min(cap, n1)
    while n2 % block_b:
        block_b //= 2
    while n1 % block_c:
        block_c //= 2
    return block_b, block_c


def dedisperse_pow2_planes(x2, chirp_storage_r, chirp_storage_i, *,
                           power=False, block_b=None, block_c=None,
                           interpret=None):
    """As :func:`dedisperse_pow2` but taking one planes-first input.

    ``x2`` : (2, N, L) float32 with ``x2[0]`` the real and ``x2[1]`` the
    imaginary plane.  This is the layout to carry through device loops:
    the stage-A kernel reads it directly, so no separate re/im split pass
    over HBM is needed.
    """
    _, n, L = x2.shape
    if not _is_pow2(n):
        raise ValueError(f"N={n} must be a power of two")
    n1, n2 = _split_n(n)
    block_b, block_c = _choose_blocks(n, n1, n2, L, block_b, block_c)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _dedisperse_impl_planes(x2, chirp_storage_r, chirp_storage_i,
                                   n1=n1, n2=n2, block_b=block_b,
                                   block_c=block_c, power=power,
                                   interpret=interpret)



_FX_BITS = 31
_FX_ONE = 1 << _FX_BITS          # one pulse cycle in fixed-point units
_FX_MASK = _FX_ONE - 1


def fold_phase_vector(phase0_cycles, rate_cycles_per_sample):
    """Host-side encoder for the kernels' fixed-point fold vector.

    Returns the (3,) int32 ``[i0_fx, p_fx, 0]`` consumed by
    :func:`dedisperse_fold_pow2` and friends: pulse phase at local time
    index ``t`` is ``((i0_fx + t * p_fx) mod 2^31) / 2^31`` cycles, with
    ``i0_fx`` = phase at t=0 and ``p_fx`` the phase rate, both in units
    of 2^-31 cycle.  The third slot is reserved (kernels ignore it).
    Rounding here is exact given float64 inputs (31 < 53 bits).
    """
    i0 = int(round((float(phase0_cycles) % 1.0) * _FX_ONE)) & _FX_MASK
    p = int(round((float(rate_cycles_per_sample) % 1.0) * _FX_ONE)) \
        & _FX_MASK
    return np.array([i0, p, 0], dtype=np.int32)


def fold_bins_ref(fold, t, n_phase):
    """Numpy mirror of the kernel's exact bin map, for tests/validation:
    bin = floor(frac(t) * n_phase) with frac per
    :func:`fold_phase_vector`, computed bit-identically to the kernel's
    int32 16-bit-split sequence."""
    fold = np.asarray(fold, np.int64)
    num = (fold[0] + np.asarray(t, np.int64) * fold[1]) & _FX_MASK
    hi = num >> 16
    lo = num & 0xFFFF
    return ((hi * n_phase) + ((lo * n_phase) >> 16)) >> 15


def _fold_vector(fold):
    """Validate/convert the fold vector to the (3,) int32 the kernels
    read from SMEM (see :func:`fold_phase_vector`)."""
    fold = jnp.asarray(fold)
    if fold.shape != (3,):
        raise ValueError("fold must be a (3,) [i0_fx, p_fx, 0] vector; "
                         "build it with fold_phase_vector()")
    return fold.astype(jnp.int32)


def _check_n_phase(n_phase):
    """The in-kernel 16-bit-split bin extraction is exact only for
    n_phase <= 2^15 (see _k3_fold_body)."""
    n_phase = int(n_phase)
    if not 0 < n_phase <= (1 << 15):
        raise ValueError(f"n_phase={n_phase} must be in [1, 32768]")
    return n_phase


def dedisperse_fold_pow2(x2, chirp_storage_r, chirp_storage_i, fold, *,
                         n_phase, pad_start,
                         n_valid, stokes=False,
                         block_b=None, block_c=None,
                         interpret=None):
    """Fully fused dedisperse → detect → fold for one padded window.

    Like :func:`dedisperse_pow2_planes` with ``power=True``, but the final
    kernel folds the detected power straight into pulse-phase bins on the
    MXU instead of writing the (N, L) power array to HBM — the whole
    pipeline step becomes three passes over the data with only a
    (n_phase+1, L) profile coming out.

    Parameters beyond :func:`dedisperse_pow2_planes`:

    fold : (3,) int32 array
        Fixed-point fold vector ``[i0_fx, p_fx, 0]`` from
        :func:`fold_phase_vector`: phase at local time index 0 and phase
        rate per sample, both in units of 2^-31 cycle.
    pad_start, n_valid : int
        Valid (non-halo) rows are ``[pad_start, pad_start + n_valid)``;
        everything else lands in trash row ``n_phase``.

    Returns ``(profile, counts)``: (n_phase+1, L) float32 and
    (n_phase+1,) float32.
    """
    _, n, L = x2.shape
    if not _is_pow2(n):
        raise ValueError(f"N={n} must be a power of two")
    n1, n2 = _split_n(n)
    block_b, block_c = _choose_blocks(n, n1, n2, L, block_b, block_c)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _dedisperse_fold_impl(
        x2, chirp_storage_r, chirp_storage_i,
        _fold_vector(fold),
        n1=n1, n2=n2, block_b=block_b, block_c=block_c,
        n_phase=_check_n_phase(n_phase),
        pad_start=int(pad_start), n_valid=int(n_valid),
        stokes=bool(stokes), interpret=interpret)


def dedisperse_fold_stream(x2, front, end, chirp_storage_r,
                           chirp_storage_i, fold, scale, *,
                           n_phase, pad_start, n_valid, stokes=False,
                           block_b=None, block_c=None, interpret=None):
    """As :func:`dedisperse_fold_pow2` but windowless: the padded
    overlap-save window is assembled *inside* the stage-A kernel from the
    raw block and two halo edge buffers, and the per-iteration ``scale``
    (SMEM, (1,) float32) is applied there too — no XLA pass ever touches
    the full block before the FFT.

    ``x2`` : (2, T, L); ``front`` : (2, pad_start, L); ``end`` :
    (2, pad_end, L).  ``pad_start``, ``pad_end`` and ``T`` must be
    multiples of N2 with T + pads a power of two (round pads up with
    :func:`split_n`).

    If ``chirp_storage_i`` is None, ``chirp_storage_r`` is interpreted as
    the chirp *phase in cycles* (mod 1, float32, host-reduced in float64)
    and cos/sin are computed in-kernel — half the chirp HBM traffic.
    """
    _, t_main, L = x2.shape
    p0 = front.shape[1]
    p1 = end.shape[1]
    n = t_main + p0 + p1
    if not _is_pow2(n):
        raise ValueError(f"window {n} must be a power of two")
    n1, n2 = _split_n(n)
    for name, val in (("pad_start", p0), ("pad_end", p1), ("block", t_main)):
        if val % n2 or val == 0:
            raise ValueError(f"{name}={val} must be a non-zero multiple "
                             f"of N2={n2}")
    if p0 != pad_start:
        raise ValueError("front buffer length must equal pad_start")
    block_b, block_c = _choose_blocks(n, n1, n2, L, block_b, block_c)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kw = dict(n1=n1, n2=n2, block_b=block_b, block_c=block_c,
              n_phase=_check_n_phase(n_phase),
              pad_start=int(pad_start), n_valid=int(n_valid),
              stokes=bool(stokes), interpret=interpret)
    fold = _fold_vector(fold)
    if chirp_storage_i is None:
        return _dedisperse_fold_stream_theta_impl(
            x2, front, end, chirp_storage_r, fold, scale, **kw)
    return _dedisperse_fold_stream_impl(
        x2, front, end, chirp_storage_r, chirp_storage_i, fold, scale,
        **kw)


def split_n(n):
    """Public helper mirroring the internal N = N1*N2 split."""
    return _split_n(n)
