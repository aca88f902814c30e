"""Benchmark: single-pass resident kernel vs the three-pass pipeline.

Run on the real TPU (axon default backend):
    python tools/bench_resident.py [n_window ...]

Methodology per BASELINE.md round-2 notes: device-resident inputs
generated outside the timed loop, best-of-three repeats, a same-run
HBM base loop for context, ~0.13 GB blocks so the fixed per-dispatch
cost is amortized.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from baseband_tasks_tpu.ops.dedisperse_pallas import (   # noqa: E402
    dedisperse_fold_split, fold_phase_vector, permute_to_storage_order,
    split_n)
from baseband_tasks_tpu.ops.dedisperse_resident import (  # noqa: E402
    dedisperse_fold_resident, resident_geometry)

L = 128
N_PHASE = 64
T = (1 << 18) - 1024          # 261120 = lcm-friendly for both paths


def timed(fn, iters=16, repeats=3):
    out = fn()
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def chirp_np(n):
    k = np.fft.fftfreq(n)
    lane = 1.0 + np.arange(L) / L
    phase = 40.0 * n * k ** 2 / 2
    return np.exp(-2j * np.pi * np.outer(phase, lane) / n)


def main():
    windows = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096]
    key = jax.random.key(0)
    xr = jax.random.normal(key, (T, L), jnp.float32)
    xi = jax.random.normal(jax.random.fold_in(key, 1), (T, L), jnp.float32)
    scale = jnp.ones(1, jnp.float32)
    foldv = jnp.asarray(np.asarray(fold_phase_vector(0.1, 1 / 300.7)))

    # base HBM loop: one read+write pass over the same block.  The
    # operands are jit *arguments* with a per-call scalar perturbation,
    # so XLA cannot constant-fold the pass away (same methodology as
    # tools/profile_kernels.py).
    base_fn = jax.jit(lambda a, b, s: (a * s, b * s))
    k = [0]

    def base_call():
        k[0] += 1
        return base_fn(xr, xi, jnp.float32(1.0 + 1e-6 * k[0]))

    base = timed(base_call)
    gbs = 2 * T * L * 4 * 2 / base / 1e9
    print(f"base pass: {base*1e3:.2f} ms  ({gbs:.0f} GB/s rw)")

    # three-pass pipeline (pads 512 -> window 2^18)
    ps = pe = 512
    n = T + ps + pe
    n1, n2 = split_n(n)
    st = permute_to_storage_order(chirp_np(n).astype(np.complex64),
                                  n1, n2)
    csr = jnp.asarray(st.real.copy())
    csi = jnp.asarray(st.imag.copy())
    fr = jnp.zeros((ps, L), jnp.float32)
    er = jnp.zeros((pe, L), jnp.float32)

    def split_fn():
        return dedisperse_fold_split(
            xr, xi, fr, fr, er, er, csr, csi, foldv, scale,
            n_phase=N_PHASE, pad_start=ps, n_valid=T)

    dt = timed(split_fn)
    print(f"three-pass (N={n}): {dt*1e3:.2f} ms  "
          f"{T * L / dt / 1e9:.2f}e9 samples/s")

    for nw in windows:
        psr = per = 256
        try:
            hop, rn1, rn2 = resident_geometry(nw, psr, per)
        except ValueError as e:
            print(f"resident N={nw}: skip ({e})")
            continue
        t_r = (T // hop) * hop
        st_r = permute_to_storage_order(chirp_np(nw).astype(np.complex64),
                                        rn1, rn2)
        rcr = jnp.asarray(st_r.real.copy())
        rci = jnp.asarray(st_r.imag.copy())
        frr = jnp.zeros((psr, L), jnp.float32)
        err = jnp.zeros((per, L), jnp.float32)
        xr_r = xr[:t_r]
        xi_r = xi[:t_r]

        for engine in ("stockham", "mxu"):
            def res_fn():
                return dedisperse_fold_resident(
                    xr_r, xi_r, frr, frr, err, err, rcr, rci, foldv,
                    scale, n_window=nw, n_phase=N_PHASE, pad_start=psr,
                    pad_end=per, engine=engine)

            try:
                dt = timed(res_fn)
            except Exception as e:
                print(f"resident[{engine}] N={nw}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}")
                continue
            print(f"resident[{engine}] N={nw} (hop {hop}, "
                  f"eff {hop/nw:.0%}): {dt*1e3:.2f} ms  "
                  f"{t_r * L / dt / 1e9:.2f}e9 samples/s")


if __name__ == "__main__":
    main()
