"""Per-pass decomposition of the config-3 QUAD graph on the TPU
(VERDICT round-3 item 5).

The round-trip ``PolyphaseFilterBank → InversePolyphaseFilterBank``
graph compiles to four pallas HBM passes (models/compiled.py quad
fusion; the forward DFT and dechannelize IDFT cancel analytically):

    FIR   ops/pfb_pallas.pfb_forward_stream with fr=None (tap-sum only)
    K1    Wiener stage-A: streaming window assembly + Stockham over N1
          + twiddle + transpose to (N2, N1, L) storage order
    K2    Wiener stage-B: Stockham over N2 + gain multiply + inverse
          stage-B (aliased in/out)
    K3    Wiener inverse stage-A + trim to the valid rows

This tool times each pass INDIVIDUALLY at config 3's production
geometry (window N=2^15 rows, L=512 lanes, 256-row pads -> 32256 valid
rows) in the same run as a pure-bandwidth base loop, and compares each
against its own HBM byte model at the measured bandwidth.  The residual
(measured - model) per pass is that pass's compute/latency cost the HBM
stream cannot hide — the decomposition of the chain's "last 22%".

    python tools/profile_quad.py            # real TPU
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from baseband_tasks_tpu.ops.dedisperse_pallas import (_choose_blocks,
                                                      _split_n, _stage_b)
from baseband_tasks_tpu.ops.spectral_filter import (_k1_filter_body,
                                                    _k3_trim_body,
                                                    spectral_filter_stream)
from baseband_tasks_tpu.ops.pfb_pallas import pfb_forward_stream
from baseband_tasks_tpu.ops.dft_matmul import matmul_precision

N_ITER = 16
N_TAP = 8

#: geometries: config3 = the PFB round-trip quad graph; config2 = the
#: fused Dedisperse->Dechannelize chain (no FIR, chirp gain, post
#: IDFT lane matmul in K3)
MODES = {
    "config3": dict(N=1 << 15, L=512, PAD=256, fir=True, post=False),
    "config2": dict(N=1 << 18, L=128, PAD=512, fir=False, post=True),
}
MODE = "config3"
N = L = PAD = M = N1 = N2 = KF = KE = PLANE = None


def set_mode(mode):
    global MODE, N, L, PAD, M, N1, N2, KF, KE, PLANE
    MODE = mode
    g = MODES[mode]
    N, L, PAD = g["N"], g["L"], g["PAD"]
    M = N - 2 * PAD
    N1, N2 = _split_n(N)
    KF = KE = PAD // N2
    PLANE = N * L * 4    # one f32 window plane, bytes


def prepare(name, make_inputs, fn, bytes_model, n_iter=N_ITER):
    """Compile + warm a pass now; return a (name, measure, bytes) tuple
    so all passes can be MEASURED back-to-back afterwards.  The tunnel
    chip's throughput drifts on the timescale of the multi-minute
    compiles, so measuring each pass right after its own compile (the
    first version of this tool) compared passes across different drift
    windows — the base loop and every pass must be timed within
    seconds of each other."""
    xs = tuple(jax.block_until_ready(x) for x in make_inputs())

    @jax.jit
    def run(*xs):
        def s(carry, i):
            y = fn(xs, 1.0 + 1e-6 * i.astype(jnp.float32))
            out = sum(jnp.sum(p[:2, :2] ** 2) for p in y)
            return carry, out
        _, ys = jax.lax.scan(s, 0.0, jnp.arange(n_iter, dtype=jnp.int32))
        return jnp.sum(ys).reshape(1)

    np.asarray(run(*xs))  # compile + warm

    def measure():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(*xs))
            best = min(best, time.perf_counter() - t0)
        return best / n_iter * 1e3

    return name, measure, bytes_model


def planes(shape, seed):
    @jax.jit
    def mk(sf):
        k = jax.random.key(sf[0].astype(jnp.int32))
        return (jax.random.normal(k, shape, jnp.float32),
                jax.random.normal(jax.random.fold_in(k, 1), shape,
                                  jnp.float32))
    return mk(np.full((1,), seed + 1, np.float32))


def main():
    prec = matmul_precision()
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    block_b, block_c = _choose_blocks(N, N1, N2, L, None, None)

    passes = []

    # ---- base loops: pallas copy-with-scale at three sizes -------------
    # (read + write, the bandwidth yardstick; a plain XLA y = x * s with
    # a sliced checksum gets its write dead-code-eliminated).  Three
    # sizes let a linear fit separate the device's FIXED per-scan-step
    # cost (measured 0.85-2 ms on this tunnel chip, CLAUDE.md) from the
    # streaming bandwidth — a single-size base folds the fixed cost into
    # "bandwidth" and then multi-pass kernels look faster than light.
    def _copy_body(s_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:] * s_ref[0]

    def base_fn_for(rows):
        cblk = pl.BlockSpec((1024, L), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

        def base_fn(xs, s):
            def one(x):
                return pl.pallas_call(
                    _copy_body, grid=(rows // 1024,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                              cblk],
                    out_specs=cblk,
                    out_shape=jax.ShapeDtypeStruct((rows, L),
                                                   jnp.float32),
                )(s.reshape(1), x)
            return one(xs[0]), one(xs[1])
        return base_fn

    base_sizes = (N, 2 * N, 4 * N)
    for rows in base_sizes:
        passes.append(prepare(
            f"base_{rows}",
            (lambda r: (lambda: planes((r, L), 0)))(rows),
            base_fn_for(rows),
            bytes_model=4 * rows * L * 4))

    # ---- FIR pass (quad form: fr=None, tap-sum only; config3 only) ----
    if MODES[MODE]["fir"]:
        taps = jnp.asarray(np.random.default_rng(0).standard_normal(
            (N_TAP, L)).astype(np.float32))
        cr0 = jnp.zeros((N_TAP - 1, L), jnp.float32)

        def fir(xs, s):
            return pfb_forward_stream(cr0, cr0, xs[0], xs[1], taps,
                                      n_tap=N_TAP, scale=s)

        passes.append(prepare(
            "fir", lambda: planes((M, L), 1), fir,
            # read carry+block twice (re+im), write both output planes
            bytes_model=4 * M * L * 4))

    # config2's K3 carries the dechannelize inverse-DFT as a post lane
    # matmul (the _FusedDisperseDechan fusion)
    post_mats = None
    if MODES[MODE]["post"]:
        from baseband_tasks_tpu.ops.spectral_filter import lane_dft_mats
        post_mats = tuple(jnp.asarray(m) for m in
                          lane_dft_mats(L, inverse=True))

    # ---- Wiener K1: streaming stage-A (window assembly + FFT_N1) -----
    gr, gi = planes((N2, N1, L), 2)
    kc = KF + KE
    spec_bT = pl.BlockSpec((block_b, N1, L), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)

    def blk(rows_):
        return pl.BlockSpec((rows_, block_b, L), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def k1(xs, s):
        crr, cri, xr_, xi_ = xs
        return pl.pallas_call(
            functools.partial(_k1_filter_body, N1, N2, N, False, True,
                              prec),
            compiler_params=params,
            grid=(N2 // block_b,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      blk(kc), blk(kc), blk(N1 - kc), blk(N1 - kc)],
            out_specs=(spec_bT, spec_bT),
            out_shape=(jax.ShapeDtypeStruct((N2, N1, L), jnp.float32),
                       jax.ShapeDtypeStruct((N2, N1, L), jnp.float32)),
        )(s.reshape(1), crr, cri, xr_, xi_)

    def mk_k1():
        cr_, ci_ = planes((kc, N2, L), 3)
        xr_, xi_ = planes((N1 - kc, N2, L), 4)
        return cr_, ci_, xr_, xi_

    passes.append(prepare("k1_stageA", mk_k1, k1,
                          bytes_model=4 * PLANE))

    # ---- Wiener K2: stage-B + gain + inverse stage-B (aliased) -------
    # the gain planes ride as runtime ARGUMENTS: closed-over device
    # arrays embed as HLO constants, and at config2 geometry the
    # 2 x 134 MB constants overflow the axon remote-compile request
    # body (HTTP 413)
    def k2(xs, s):
        yr, yi = xs[0] * s, xs[1]
        return _stage_b(yr, yi, xs[2], xs[3], n1=N1, n2=N2,
                        block_c=block_c, interpret=False, params=params)

    passes.append(prepare(
        "k2_stageB_gain",
        lambda: planes((N2, N1, L), 5) + (gr, gi), k2,
        # r 2 planes + r gain (2 planes) + w 2 planes (aliased storage,
        # but the bytes still move) + the XLA `yr*s` probe pass (r+w)
        bytes_model=8 * PLANE))

    # ---- Wiener K3: inverse stage-A + trim ----------------------------
    n1v = N1 - KF - KE
    spec_out = pl.BlockSpec((n1v, block_b, L), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    spec_full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def k3(xs, s):
        zr, zi = xs[0] * s, xs[1]
        post = post_mats is not None
        extra_specs = [spec_full, spec_full] if post else []
        extra_args = list(post_mats) if post else []
        return pl.pallas_call(
            functools.partial(_k3_trim_body, N1, KF, KE, post, prec),
            compiler_params=params,
            grid=(N2 // block_b,),
            in_specs=extra_specs + [spec_bT, spec_bT],
            out_specs=(spec_out, spec_out),
            out_shape=(jax.ShapeDtypeStruct((n1v, N2, L), jnp.float32),
                       jax.ShapeDtypeStruct((n1v, N2, L), jnp.float32)),
        )(*extra_args, zr, zi)

    passes.append(prepare(
        "k3_invA_trim",
        lambda: planes((N2, N1, L), 6), k3,
        # r 2 planes + w 2 trimmed planes + the `zr*s` probe pass (r+w)
        bytes_model=(2 + 2 * n1v / N1 + 2) * PLANE))

    # ---- full Wiener (K1+K2+K3 in one call) ---------------------------
    def wiener(xs, s):
        cr_, ci_, xr_, xi_, gr_, gi_ = xs
        return spectral_filter_stream(cr_, ci_, xr_, xi_, gr_, gi_,
                                      pad_start=PAD, pad_end=PAD,
                                      scale=s, post=post_mats)

    def mk_w():
        cr_, ci_ = planes((2 * PAD, L), 7)
        xr_, xi_ = planes((M, L), 8)
        return cr_, ci_, xr_, xi_, gr, gi

    passes.append(prepare(
        "wiener_full", mk_w, wiener,
        # K1 (4) + K2 (6: r+gain+w) + K3 (2 + trimmed write)
        bytes_model=(4 + 6 + 2 + 2 * n1v / N1) * PLANE))

    # ---- measure everything back-to-back (same drift window) ----------
    # bases first and last: if they disagree by >15% the window was
    # noisy and the whole run should be repeated
    ms = {}
    n_base = len(base_sizes)
    base_first = [p[1]() for p in passes[:n_base]]
    for name, measure, _ in passes[n_base:]:
        ms[name] = measure()
    base_last = [p[1]() for p in passes[:n_base]]
    base_ms = np.minimum(base_first, base_last)
    stable = all(abs(a - b) / max(a, b) < 0.15
                 for a, b in zip(base_first, base_last))
    # linear fit t_ms = fixed + bytes / BW across the three base sizes
    bvec = np.array([p[2] for p in passes[:n_base]], float)
    coef = np.linalg.lstsq(
        np.stack([np.ones(n_base), bvec], 1), base_ms, rcond=None)[0]
    fixed_ms, per_byte_ms = float(coef[0]), float(coef[1])
    # per_byte_ms is ms/byte -> bytes/s = (1/per_byte_ms) bytes/ms * 1e3
    bw = 1e3 / per_byte_ms if per_byte_ms > 0 else float("inf")
    print(json.dumps({
        "pass": "base_fit",
        "base_ms": [round(float(b), 3) for b in base_ms],
        "base_MB": [round(b / 1e6, 1) for b in bvec],
        "fixed_ms_per_step": round(fixed_ms, 3),
        "GBps": round(bw / 1e9, 1), "stable": stable,
        "geometry": {"N": N, "N1": N1, "N2": N2, "L": L,
                     "pads": PAD, "valid": M},
        "precision": str(prec)}), flush=True)
    rows = []
    for name, _, bytes_model in passes[n_base:]:
        model_ms = fixed_ms + bytes_model / bw * 1e3
        row = {"pass": name, "ms": round(ms[name], 3),
               "model_ms": round(model_ms, 3),
               "of_model": round(model_ms / ms[name], 2),
               "residual_ms": round(ms[name] - model_ms, 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    k123 = sum(r["ms"] for r in rows if r["pass"].startswith("k"))
    print(json.dumps({
        "pass": "summary",
        "fir+wiener_ms": round(rows[0]["ms"] + rows[-1]["ms"], 3),
        "k1+k2+k3_ms": round(k123, 3),
        "note": "models are fixed_ms + bytes/BW from the base fit; "
                "k2/k3 rows include an XLA `*s` input pass (2 extra "
                "plane units, counted in their byte models); "
                "wiener_full has no probe passes but pays the fixed "
                "cost once for its three chained kernels"}),
        flush=True)


if __name__ == "__main__":
    modes = [a for a in sys.argv[1:] if a in MODES] or ["config3"]
    for m in modes:
        set_mode(m)
        print(json.dumps({"mode": m}), flush=True)
        main()
