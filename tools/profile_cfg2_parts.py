"""Same-run breakdown of the fused config-2 step on the TPU."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N_ITER = 16


def timed(name, make_inputs, fn, n_iter=N_ITER):
    xs = tuple(jax.block_until_ready(x) for x in make_inputs())

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
                      "ms": round(best / n_iter * 1e3, 3)}), flush=True)


def fnoise(shape, seed=0):
    @jax.jit
    def mk(sf):
        return jax.random.normal(jax.random.key(sf[0].astype(jnp.int32)),
                                 shape, jnp.float32)
    return mk(np.full((1,), seed + 1, np.float32))


def main():
    from baseband_tasks_tpu import (Dechannelize, Dedisperse,
                                    NoiseGenerator, SetAttribute)
    from baseband_tasks_tpu.models.compiled import CompiledPipeline
    from baseband_tasks_tpu.ops.dedisperse_pallas import split_n
    from baseband_tasks_tpu.ops.spectral_filter import (
        lane_dft_mats, spectral_filter_pow2, spectral_filter_stream)
    from baseband_tasks_tpu.utils import Time, units as u

    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    n_chan = 64
    freq = (1400 + (np.arange(n_chan) - n_chan / 2) * 0.25) * u.MHz
    src = SetAttribute(
        NoiseGenerator(shape=(1 << 23, n_chan),
                       start_time=Time.from_mjd(58000.0),
                       sample_rate=250 * u.kHz, samples_per_frame=8192,
                       seed=1),
        frequency=freq, sideband=1)
    ded = Dedisperse(src, 29.7, samples_per_frame=1 << 18,
                     engine="pallas")
    cp = CompiledPipeline(Dechannelize(ded))
    cp._prepare_caches()
    spf = cp.block_samples
    pad = ded.pad_start + ded.pad_end
    n = spf + pad
    csr, csi = ded._storage_chirp_cache
    post = lane_dft_mats(n_chan, inverse=True)
    print(json.dumps({"n": n, "spf": spf, "pad": pad,
                      "split": split_n(n)}), flush=True)

    # HBM floor probe at the block scale
    timed("base_scale_267MB", lambda: (fnoise((2, spf, n_chan)),),
          lambda xs, s: xs[0] * s)

    # full window op (no stream assembly), no post
    timed("filter_pow2_nopost",
          lambda: (fnoise((n, n_chan)), fnoise((n, n_chan), 1), csr, csi),
          lambda xs, s: sum(spectral_filter_pow2(
              xs[0] * s, xs[1], xs[2], xs[3],
              pad_start=ded.pad_start, pad_end=ded.pad_end)))

    # full window op with post lane matmul
    timed("filter_pow2_post",
          lambda: (fnoise((n, n_chan)), fnoise((n, n_chan), 1), csr, csi),
          lambda xs, s: sum(spectral_filter_pow2(
              xs[0] * s, xs[1], xs[2], xs[3], post=post,
              pad_start=ded.pad_start, pad_end=ded.pad_end)))

    # streaming form with in-kernel scale + post
    def stream_fn(xs, s):
        cr, ci, xr, xi, gr, gi = xs
        yr, yi = spectral_filter_stream(
            cr, ci, xr, xi, gr, gi, scale=s.reshape(1), post=post,
            pad_start=ded.pad_start, pad_end=ded.pad_end)
        return yr + yi
    timed("filter_stream_post",
          lambda: (fnoise((pad, n_chan)), fnoise((pad, n_chan), 2),
                   fnoise((spf, n_chan)), fnoise((spf, n_chan), 3),
                   csr, csi),
          stream_fn)

    # the compiled planes step end-to-end
    step_c, caches = cp.cached_planes_step()

    def full_fn(xs, s):
        xr, xi = xs[0], xs[1]
        _, (yr, yi) = step_c(cp.init_carry(planes=True), (xr, xi),
                             s, xs[2:])
        return jnp.sum(yr ** 2) + jnp.sum(yi ** 2)
    timed("planes_step_full",
          lambda: (fnoise((spf, n_chan)), fnoise((spf, n_chan), 1))
          + tuple(caches),
          full_fn)


if __name__ == "__main__":
    main()
