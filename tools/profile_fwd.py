"""Forward-PFB (FIR + channelizing DFT) variant shootout on the TPU.

The config-3 roofline gap lives in this stage (profile_cfg23:
cfg3_fir_channelize = 2.96 ms at m=2^14 vs ~0.6 ms of bytes).  Candidate
formulations, all computing the same (m, 256, 2) channelized planes:

  axis      current: FIR on (samples, P) then dft_matmul_planes axis=1
            (middle-axis contraction -> XLA relayouts around 4 matmuls)
  flat      planes-native: FIR as shifted row-adds on (m+7, 512), then
            one (m,512)@(512,512) F (x) I_2 matmul per real component
            (2x the useful flops, zero relayouts)
  fir_only  the tap-sum alone (bytes bound) — locates the matmul share

Each at matmul precision highest/high.   python tools/profile_fwd.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from baseband_tasks_tpu.ops.dft_matmul import (dft_matmul_planes,
                                               dft_matmul_planes_flat,
                                               set_matmul_precision)

N_ITER = 16
N_TAP, N_CHAN, P = 8, 256, 2
M = 1 << 14
L = N_CHAN * P


def timed(name, make_inputs, fn, n_iter=N_ITER):
    xs = make_inputs()
    if not isinstance(xs, tuple):
        xs = (xs,)
    xs = tuple(jax.block_until_ready(x) for x in xs)

    @jax.jit
    def run(*xs):
        def s(carry, i):
            y = fn(xs, 1.0 + 1e-6 * i.astype(jnp.float32))
            return carry, jnp.sum(jnp.abs(y) ** 2)
        _, ys = jax.lax.scan(s, 0.0, jnp.arange(n_iter, dtype=jnp.int32))
        return jnp.sum(ys).reshape(1)

    np.asarray(run(*xs))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(*xs))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"name": name,
                      "ms_per_iter": round(best / n_iter * 1e3, 3)}),
          flush=True)


def make_planes(shape, seed=0):
    @jax.jit
    def mk(sf):
        k = jax.random.key(sf[0].astype(jnp.int32))
        return (jax.random.normal(k, shape, jnp.float32),
                jax.random.normal(jax.random.fold_in(k, 1), shape,
                                  jnp.float32))
    return lambda: mk(np.full((1,), seed + 1, np.float32))


def main():
    taps_ax = jnp.asarray(np.random.default_rng(0).standard_normal(
        (N_TAP, 1, N_CHAN, 1)).astype(np.float32))
    # flat form: per-lane taps, chan-major pol-minor
    taps_flat = jnp.asarray(np.repeat(
        np.asarray(taps_ax).reshape(N_TAP, N_CHAN), P, axis=1
    ).reshape(N_TAP, 1, L))

    rows_in = M + N_TAP - 1
    mk_ax = make_planes(((rows_in) * N_CHAN, P))
    mk_flat = make_planes((rows_in, L), seed=3)

    def fwd_axis(xs, s):
        xr = (xs[0] * s).reshape(-1, N_CHAN, P)
        xi = xs[1].reshape(-1, N_CHAN, P)

        def fir(x):
            acc = taps_ax[0] * x[:M]
            for t in range(1, N_TAP):
                acc = acc + taps_ax[t] * x[t:t + M]
            return acc
        yr, yi = dft_matmul_planes(fir(xr), fir(xi), axis=1,
                                   direction="forward", n=N_CHAN)
        return yr + yi

    def fwd_flat(xs, s):
        xr, xi = xs[0] * s, xs[1]

        def fir(x):
            acc = taps_flat[0] * x[:M]
            for t in range(1, N_TAP):
                acc = acc + taps_flat[t] * x[t:t + M]
            return acc
        yr, yi = dft_matmul_planes_flat(fir(xr), fir(xi),
                                        direction="forward", n=N_CHAN,
                                        reps=P)
        return yr + yi

    def fir_only(xs, s):
        xr = xs[0] * s

        def fir(x):
            acc = taps_flat[0] * x[:M]
            for t in range(1, N_TAP):
                acc = acc + taps_flat[t] * x[t:t + M]
            return acc
        return fir(xr) + fir(xs[1])

    timed("fir_only_flat", mk_flat, fir_only)
    for prec in ("highest", "high"):
        with set_matmul_precision(prec):
            timed(f"fwd_axis_{prec}", mk_ax, fwd_axis)
            timed(f"fwd_flat_{prec}", mk_flat, fwd_flat)


if __name__ == "__main__":
    main()
