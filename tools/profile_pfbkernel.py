"""Standalone timing of ops/pfb_pallas.pfb_forward_stream on the TPU:
bytes-bound target vs MXU-matmul cost at each matmul precision, plus a
no-DFT (taps-only) variant to split VPU/HBM from MXU time.

    python tools/profile_pfbkernel.py
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

from baseband_tasks_tpu.ops.dft_matmul import (_expanded_mats,
                                               set_matmul_precision)
from baseband_tasks_tpu.ops.pfb_pallas import pfb_forward_stream

N_ITER = 16
N, REPS, N_TAP = 256, 2, 8
L = N * REPS
M = 1 << 15


def timed(name, fn):
    np.asarray(fn())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"name": name,
                      "ms_per_iter": round(best / N_ITER * 1e3, 3)}),
          flush=True)


def main():
    key = jax.random.key(3)
    xr = jax.random.normal(key, (M, L), jnp.float32)
    xi = jax.random.normal(jax.random.fold_in(key, 1), (M, L),
                           jnp.float32)
    cr = jnp.zeros((N_TAP - 1, L), jnp.float32)
    taps = np.random.default_rng(0).standard_normal(
        (N_TAP, L)).astype(np.float32)
    fr, fi = _expanded_mats(N, REPS, "forward")
    eye = (np.eye(L, dtype=np.float32), np.zeros((L, L), np.float32))

    def make(mats, prec):
        @jax.jit
        def run(xr, xi):
            def s(carry, i):
                yr, yi = pfb_forward_stream(
                    cr, cr, xr, xi, taps, mats[0], mats[1],
                    n_tap=N_TAP, scale=1.0 + 1e-6 * i.astype(jnp.float32))
                return carry, jnp.sum(yr) + jnp.sum(yi)
            _, ys = jax.lax.scan(s, 0.0,
                                 jnp.arange(N_ITER, dtype=jnp.int32))
            return jnp.sum(ys).reshape(1)

        def go():
            with set_matmul_precision(prec):
                return run(xr, xi)
        return go

    # pure-bandwidth base: one r+w of the same planes
    @jax.jit
    def base(xr, xi):
        def s(carry, i):
            y = xr * (1.0 + 1e-6 * i.astype(jnp.float32)) + xi
            return carry, jnp.sum(y)
        _, ys = jax.lax.scan(s, 0.0, jnp.arange(N_ITER, dtype=jnp.int32))
        return jnp.sum(ys).reshape(1)

    timed("base_rw_134MB", lambda: base(xr, xi))
    for prec in ("highest", "high", "default"):
        timed(f"pfb_fwd_{prec}", make((fr, fi), prec))
    timed("pfb_fwd_identity_mats", make(eye, "highest"))


if __name__ == "__main__":
    main()
