"""Per-kernel timing of the fused dedispersion step on the real TPU.

Times each pallas kernel (and the full chain) via on-device fori_loops
synchronized by host fetches — on the axon tunnel backend a host fetch is
the only reliable barrier.  A 'base' loop (scale multiply + scalar
readout) measures the loop floor; subtract it from each case.

Usage:  python tools/profile_kernels.py          (on the TPU host)

Typical v5e output at N=2^18, L=128 (2026-08, radix-8 kernels + K2
in-place tiles):
  base   ~1.9 ms   (~293 GB/s effective HBM on this tunnel chip)
  k1     ~2.5 ms net    k2 ~3.3 ms net*   k3f ~1.1 ms net
  chain  ~5.7 ms net  (was ~7.8 before K2 input_output_aliases)
  * isolated k2 is inflated by a donation copy (the probe reuses its
    input every iteration; in the chain K1's fresh output donates
    cleanly — trust the chain number)
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from baseband_tasks_tpu.ops import dedisperse_pallas as dp

N = 1 << 18
L = 128
N1, N2 = dp.split_n(N)
BB, BC = dp._choose_blocks(N, N1, N2, L, None, None)
PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
N_ITER = 16
PAD = 3584


def timed(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / N_ITER


def loop(body):
    @jax.jit
    def run(a, b, c, d):
        def step(k, acc):
            return acc + body(k, a, b, c, d)
        return jax.lax.fori_loop(0, N_ITER, step,
                                 jnp.zeros((1,), jnp.float32))
    return run


def main():
    print(f"split {N1}x{N2}  blocks bb={BB} bc={BC}", flush=True)
    rng = np.random.default_rng(0)
    x2 = jax.device_put(rng.standard_normal((2, N, L)).astype(np.float32))
    yr = jax.device_put(rng.standard_normal((N1, N2, L)).astype(np.float32))
    yT = jax.device_put(rng.standard_normal((N2, N1, L)).astype(np.float32))
    cr = jax.device_put((yT * 0.5).copy())
    ci = jax.device_put((yT * 0.3).copy())

    spec_bT = pl.BlockSpec((BB, N1, L), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_i0 = pl.BlockSpec(memory_space=pltpu.SMEM)
    spec_prof = pl.BlockSpec((65, L), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    spec_cnt = pl.BlockSpec((1, 65), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    k3_call = pl.pallas_call(
        functools.partial(dp._k3_fold_body, N1, N2, PAD, N - 2 * PAD, 64),
        compiler_params=PARAMS, grid=(N2 // BB,),
        in_specs=[spec_i0, spec_bT, spec_bT],
        out_specs=(spec_prof, spec_cnt),
        out_shape=(jax.ShapeDtypeStruct((65, L), jnp.float32),
                   jax.ShapeDtypeStruct((1, 65), jnp.float32)),
    )
    foldv = jnp.asarray(dp.fold_phase_vector(0.0, 3.0 / 160000.0))

    def base_body(k, a, b, c, d):
        s = a * (1.0 + 1e-6 * k.astype(jnp.float32))
        return s.reshape(-1)[:1]

    def k1_body(k, a, b, c, d):
        s = a * (1.0 + 1e-6 * k.astype(jnp.float32))
        r, i = dp._stage_a_planes(s, n1=N1, n2=N2, block_b=BB,
                                  interpret=False, params=PARAMS)
        return r[0, 0, :1] + i[0, 0, :1]

    def k2_body(k, a, b, c, d):
        s = a * (1.0 + 1e-6 * k.astype(jnp.float32))
        r, i = dp._stage_b(s, b, c, d, n1=N1, n2=N2, block_c=BC,
                           interpret=False, params=PARAMS)
        return r[0, 0, :1] + i[0, 0, :1]

    def k3_body(k, a, b, c, d):
        s = a * (1.0 + 1e-6 * k.astype(jnp.float32))
        prof, cnt = k3_call(foldv, s, b)
        return prof[0, :1]

    def chain_body(k, a, b, c, d):
        s = a * (1.0 + 1e-6 * k.astype(jnp.float32))
        r, i = dp._stage_a_planes(s, n1=N1, n2=N2, block_b=BB,
                                  interpret=False, params=PARAMS)
        r, i = dp._stage_b(r, i, c, d, n1=N1, n2=N2, block_c=BC,
                           interpret=False, params=PARAMS)
        prof, cnt = k3_call(foldv, r, i)
        return prof[0, :1]

    # bf16 intermediate-plane variant (bandwidth mode): K1 writes bf16,
    # K2 reads/writes bf16 with a bf16 chirp, K3 casts on load
    BC16 = BC
    if N1 % 16 == 0:
        BC16 = max(BC, 16)
    cr16 = cr.astype(jnp.bfloat16)
    ci16 = ci.astype(jnp.bfloat16)
    k3_call16 = pl.pallas_call(
        functools.partial(dp._k3_fold_body, N1, N2, PAD, N - 2 * PAD, 64),
        compiler_params=PARAMS, grid=(N2 // BB,),
        in_specs=[spec_i0, spec_bT, spec_bT],
        out_specs=(spec_prof, spec_cnt),
        out_shape=(jax.ShapeDtypeStruct((65, L), jnp.float32),
                   jax.ShapeDtypeStruct((1, 65), jnp.float32)),
    )

    def chain16_body(k, a, b, c, d):
        s = a * (1.0 + 1e-6 * k.astype(jnp.float32))
        r, i = dp._stage_a_planes(s, n1=N1, n2=N2, block_b=BB,
                                  interpret=False, params=PARAMS,
                                  out_dtype=jnp.bfloat16)
        r, i = dp._stage_b(r, i, cr16, ci16, n1=N1, n2=N2, block_c=BC16,
                           interpret=False, params=PARAMS)
        prof, cnt = k3_call16(foldv, r, i)
        return prof[0, :1]

    results = {}
    for name, body, args in [
            ("base", base_body, (x2, yT, cr, ci)),
            ("k1", k1_body, (x2, yT, cr, ci)),
            ("k2", k2_body, (yT, yT, cr, ci)),
            ("k3f", k3_body, (yT, yT, cr, ci)),
            ("chain", chain_body, (x2, yT, cr, ci)),
            ("chain16", chain16_body, (x2, yT, cr, ci)),
    ]:
        dt = timed(loop(body), *args)
        results[name] = dt * 1e3
        print(f"{name:6s} {dt*1e3:8.3f} ms/iter", flush=True)
    for name in ("k1", "k2", "k3f", "chain", "chain16"):
        print(f"net {name:6s} {results[name] - results['base']:.3f} ms")


if __name__ == "__main__":
    main()
