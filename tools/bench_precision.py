"""Matmul-precision experiment for the compute-bound PFB chain.

Config 3 (PFB 8x256 + Wiener inverse) is the one headline config that
runs well below the HBM roofline: its cost is MXU matmuls at
``Precision.HIGHEST`` (six bf16 passes per real f32 matmul) plus the
relayouts around the forward pass's middle-axis contractions
(BASELINE.md round-3 roofline: 45% of the byte model).  This script
measures whether ``set_matmul_precision('high')`` (three passes) is a
free lunch:

* throughput of the compiled planes chain at 'highest' vs 'high';
* on-device SNR of the 'high' output against the 'highest' output of
  the SAME input block (f32-only fetch, axon-safe) — the error the
  three-pass mode adds on top of the chain's own 84 dB floor.

    python tools/bench_precision.py

Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench_full import N_ITER, _timed_planes_chain  # noqa: E402


def build_config3(precision):
    from baseband_tasks_tpu import (InversePolyphaseFilterBank,
                                    NoiseGenerator, PolyphaseFilterBank,
                                    sinc_hamming)
    from baseband_tasks_tpu.models.compiled import CompiledPipeline
    from baseband_tasks_tpu.fourier import fft_maker
    from baseband_tasks_tpu.ops.dft_matmul import set_matmul_precision
    from baseband_tasks_tpu.utils import Time, units as u

    n_tap, n_chan = 8, 256
    h = sinc_hamming(n_tap, n_chan).reshape(n_tap, n_chan)
    src = NoiseGenerator(shape=(1 << 24, 2),
                         start_time=Time.from_mjd(58000.0),
                         sample_rate=4 * u.MHz, samples_per_frame=1 << 16,
                         seed=2)
    with fft_maker.set("pallas"), set_matmul_precision(precision):
        pfb = PolyphaseFilterBank(src, h, samples_per_frame=32256)
        inv = InversePolyphaseFilterBank(
            pfb, h, sn=30, pad_start=128, pad_end=128,
            samples_per_frame=32256, dtype=src.dtype, engine="pallas")
        return CompiledPipeline(inv)


def run_block(cp, precision, xr, xi, n_steps=2):
    """Last-step output planes of the compiled chain on (xr, xi)."""
    import jax
    from baseband_tasks_tpu.ops.dft_matmul import set_matmul_precision

    with set_matmul_precision(precision):
        step_c, caches = cp.cached_planes_step()

        @jax.jit
        def run(xr, xi, *cs):
            carry = cp.init_carry(planes=True)
            out = None
            for _ in range(n_steps):
                carry, out = step_c(carry, (xr, xi), np.float32(1.0), cs)
            return out

        yr, yi = run(xr, xi, *caches)
        jax.block_until_ready(yr)
    return yr, yi


def main():
    import jax
    import jax.numpy as jnp
    from baseband_tasks_tpu.ops.dft_matmul import set_matmul_precision

    out = {"backend": jax.default_backend(), "n_iter": N_ITER}

    # -- throughput at each precision (same-run comparison) -----------
    rates = {}
    cps = {}
    for prec in ("highest", "high"):
        cp = build_config3(prec)
        cps[prec] = cp
        with set_matmul_precision(prec):
            dt = _timed_planes_chain(cp, (cp.block_samples, 2))
        rates[prec] = cp.block_samples * 2 / dt
        out[f"samples_per_s_{prec}"] = round(rates[prec], 1)
        out[f"ms_per_step_{prec}"] = round(dt * 1e3, 3)
    out["speedup_high"] = round(rates["high"] / rates["highest"], 3)

    # -- SNR of 'high' vs 'highest' on the same input block -----------
    cp = cps["highest"]
    shape = (cp.block_samples, 2)
    key = jax.random.key(11)
    xr = jax.random.normal(key, shape, jnp.float32)
    xi = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32)
    ref_r, ref_i = run_block(cps["highest"], "highest", xr, xi)
    got_r, got_i = run_block(cps["high"], "high", xr, xi)

    @jax.jit
    def snr_db(ar, ai, br, bi):
        sig = jnp.sum(ar.astype(jnp.float32) ** 2)
        if ai is not None:
            sig = sig + jnp.sum(ai.astype(jnp.float32) ** 2)
        res = jnp.sum((ar - br).astype(jnp.float32) ** 2)
        if ai is not None:
            res = res + jnp.sum((ai - bi).astype(jnp.float32) ** 2)
        return (10.0 * jnp.log10(sig / jnp.maximum(res, 1e-30))
                ).reshape(1)

    out["snr_high_vs_highest_db"] = round(
        float(np.asarray(snr_db(ref_r, ref_i, got_r, got_i))[0]), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
