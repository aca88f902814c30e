"""Stage-by-stage timing of BASELINE configs 2 and 3 on the real TPU.

Times each component of the two pipelines separately (same methodology
as tools/profile_kernels.py: on-device inputs, per-iteration scaling,
f32-scalar fetch barrier, best-of-three, same-run HBM base loop) to
locate where the current paths fall off the roofline.

    python tools/profile_cfg23.py [names...]
"""

import json
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N_ITER = 16


def timed(name, make_inputs, fn, n_iter=N_ITER):
    """fn(x_or_tuple, i_f32) -> array; returns best ms/iter."""
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

    np.asarray(run(*xs))  # compile+warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(*xs))
        best = min(best, time.perf_counter() - t0)
    ms = best / n_iter * 1e3
    print(json.dumps({"name": name, "ms_per_iter": round(ms, 3)}),
          flush=True)
    return ms


def cnoise(key, shape):
    kr, ki = jax.random.split(key)
    return jax.lax.complex(jax.random.normal(kr, shape, jnp.float32),
                           jax.random.normal(ki, shape, jnp.float32))


@jax.jit
def _mk_c(shape_key):
    pass


def make_cnoise(shape, seed=0):
    @jax.jit
    def mk(sf):
        return cnoise(jax.random.key(sf[0].astype(jnp.int32)), shape)
    return lambda: mk(np.full((1,), seed + 1, np.float32))


def make_fnoise(shape, seed=0):
    @jax.jit
    def mk(sf):
        return jax.random.normal(jax.random.key(sf[0].astype(jnp.int32)),
                                 shape, jnp.float32)
    return lambda: mk(np.full((1,), seed + 1, np.float32))


def base_loop():
    """HBM floor probe: elementwise scale of 2x(2^17, 64) f32 (67 MB)."""
    mk = make_fnoise((2, 1 << 17, 64))
    timed("base_67MB", mk, lambda xs, s: xs[0] * s)
    mk2 = make_fnoise((2, 1 << 18, 128))
    timed("base_268MB", mk2, lambda xs, s: xs[0] * s)


def cfg2_parts():
    n_chan = 64
    n = 1 << 17  # padded window

    # complex split / recombine costs at the config-2 scale
    mkc = make_cnoise((n, n_chan))
    timed("c64_scale", mkc, lambda xs, s: xs[0] * s)
    timed("c64_split_planes", mkc,
          lambda xs, s: jnp.real(xs[0]) * s + jnp.imag(xs[0]))

    # four-step dedisperse passes alone, planes in/out
    from baseband_tasks_tpu.ops.dedisperse_pallas import (
        dedisperse_pow2, split_n)
    n1, n2 = split_n(n)
    mkp = make_fnoise((2, n, n_chan))
    mkch = make_fnoise((2, n2, n1, n_chan), seed=5)

    def ded(xs, s):
        x, ch = xs
        yr, yi = dedisperse_pow2(x[0] * s, x[1], ch[0], ch[1])
        return yr + yi
    timed("cfg2_dedisperse_pow2", lambda: (mkp(), mkch()), ded)

    # trim + dechannelize matmul from planes (spf rows valid)
    spf = n - 2 * 640
    th = -2.0 * np.pi / n_chan * np.outer(np.arange(n_chan),
                                          np.arange(n_chan))
    wr = jnp.asarray(np.cos(th).astype(np.float32) / n_chan)
    wi = jnp.asarray(np.sin(th).astype(np.float32) / n_chan)

    def trim_mm(xs, s):
        x = xs[0]
        rr = jax.lax.dynamic_slice_in_dim(x[0], 640, spf, 0) * s
        ii = jax.lax.dynamic_slice_in_dim(x[1], 640, spf, 0)
        outr = rr @ wr - ii @ wi
        outi = rr @ wi + ii @ wr
        return outr + outi
    timed("cfg2_trim_dechan_matmul", mkp, trim_mm)

    # the current task path: complex in, _task_pallas-style
    def cur(xs, s):
        x = xs[0] * s
        xr = jnp.real(x)
        xi = jnp.imag(x)
        ch = xs[1]
        yr, yi = dedisperse_pow2(xr, xi, ch[0], ch[1])
        out = jax.lax.complex(yr, yi)
        out = jax.lax.dynamic_slice_in_dim(out, 640, spf, 0)
        # dechannelize via complex matmul (dft_matmul path)
        from baseband_tasks_tpu.ops.dft_matmul import dft_matmul
        out = dft_matmul(out, axis=1, direction="backward", ortho=False,
                         real=False, n=n_chan)
        return jnp.abs(out)
    timed("cfg2_current_complex_path", lambda: (mkc(), mkch()), cur)


def cfg2_full():
    from baseband_tasks_tpu import (Dechannelize, Dedisperse,
                                    NoiseGenerator, SetAttribute)
    from baseband_tasks_tpu.models.compiled import CompiledPipeline
    from baseband_tasks_tpu.utils import Time, units as u
    from baseband_tasks_tpu.fourier import fft_maker

    n_chan = 64
    freq = (1400 + (np.arange(n_chan) - n_chan / 2) * 0.25) * u.MHz
    src = SetAttribute(
        NoiseGenerator(shape=(1 << 22, n_chan),
                       start_time=Time.from_mjd(58000.0),
                       sample_rate=250 * u.kHz, samples_per_frame=8192,
                       seed=1),
        frequency=freq, sideband=1)
    with fft_maker.set("pallas"):
        ded = Dedisperse(src, 29.7, samples_per_frame=1 << 17)
        cp = CompiledPipeline(Dechannelize(ded))
    step_c, caches = cp.cached_step()
    mk = make_cnoise((cp.block_samples, n_chan))

    def fn(xs, s):
        _, y = step_c(cp.init_carry(), xs[0] * s, xs[1:])
        return jnp.sum(jnp.abs(y) ** 2)
    ms = timed("cfg2_full_step", lambda: (mk(),) + tuple(caches), fn)
    print(json.dumps({"name": "cfg2_rate",
                      "samples_per_s": round(
                          cp.block_samples * n_chan / (ms / 1e3), 1)}),
          flush=True)


def cfg3_parts():
    n_tap, n_chan, P = 8, 256, 2
    m = 1 << 14              # spectra per window
    L = n_chan * P

    # XLA fallback: fft along axis 0, complex, (m, 256, 2)
    mkc = make_cnoise((m, n_chan, P))
    timed("cfg3_xla_fft_axis0", mkc,
          lambda xs, s: jnp.abs(jnp.fft.fft(xs[0] * s, axis=0)))

    # four-step planes at (m, 512)
    from baseband_tasks_tpu.ops.fft_pallas import fft_pow2_planes
    mkp = make_fnoise((2, m, L))
    timed("cfg3_fourstep_fft", mkp,
          lambda xs, s: sum(fft_pow2_planes(xs[0][0] * s, xs[0][1])))

    # full wiener via dedisperse_pow2 with gain planes
    from baseband_tasks_tpu.ops.dedisperse_pallas import (
        dedisperse_pow2, split_n)
    n1, n2 = split_n(m)
    mkg = make_fnoise((2, n2, n1, L), seed=9)

    def wiener(xs, s):
        x, g = xs
        yr, yi = dedisperse_pow2(x[0] * s, x[1], g[0], g[1])
        return yr + yi
    timed("cfg3_wiener_fourstep", lambda: (mkp(), mkg()), wiener)

    # FIR tap-sum + channelize DFT matmul (complex in, complex out)
    from baseband_tasks_tpu.ops.dft_matmul import dft_matmul
    taps = jnp.asarray(np.random.default_rng(0).standard_normal(
        (n_tap, 1, n_chan, 1)).astype(np.float32))
    mkx = make_cnoise(((m + n_tap - 1) * n_chan, P))

    def fwd(xs, s):
        x = (xs[0] * s).reshape(-1, n_chan, P)
        acc = taps[0] * x[:m]
        for t in range(1, n_tap):
            acc = acc + taps[t] * x[t:t + m]
        z = dft_matmul(acc, axis=1, direction="forward", ortho=False,
                       real=False, n=n_chan)
        return jnp.abs(z)
    timed("cfg3_fir_channelize", mkx, fwd)

    # dechannelize matmul
    mkz = make_cnoise((m, n_chan, P))
    timed("cfg3_dechan_matmul", mkz,
          lambda xs, s: jnp.abs(dft_matmul(
              xs[0] * s, axis=1, direction="backward", ortho=False,
              real=False, n=n_chan)))


def cfg3_full():
    from baseband_tasks_tpu import (InversePolyphaseFilterBank,
                                    NoiseGenerator, PolyphaseFilterBank,
                                    sinc_hamming)
    from baseband_tasks_tpu.models.compiled import CompiledPipeline
    from baseband_tasks_tpu.utils import Time, units as u
    from baseband_tasks_tpu.fourier import fft_maker

    n_tap, n_chan = 8, 256
    h = sinc_hamming(n_tap, n_chan).reshape(n_tap, n_chan)
    src = NoiseGenerator(shape=(1 << 22, 2),
                         start_time=Time.from_mjd(58000.0),
                         sample_rate=4 * u.MHz, samples_per_frame=1 << 16,
                         seed=2)
    with fft_maker.set("pallas"):
        pfb = PolyphaseFilterBank(src, h, samples_per_frame=2048)
        inv = InversePolyphaseFilterBank(
            pfb, h, sn=30, pad_start=8, pad_end=8,
            samples_per_frame=2048, dtype=src.dtype)
        cp = CompiledPipeline(inv)
    step_c, caches = cp.cached_step()
    mk = make_cnoise((cp.block_samples, 2))

    def fn(xs, s):
        _, y = step_c(cp.init_carry(), xs[0] * s, xs[1:])
        return jnp.sum(jnp.abs(y) ** 2)
    ms = timed("cfg3_full_step", lambda: (mk(),) + tuple(caches), fn)
    print(json.dumps({"name": "cfg3_rate",
                      "samples_per_s": round(
                          cp.block_samples * 2 / (ms / 1e3), 1)}),
          flush=True)


def main():
    names = sys.argv[1:] or ["base_loop", "cfg2_parts", "cfg2_full",
                             "cfg3_parts", "cfg3_full"]
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    for n in names:
        try:
            globals()[n]()
        except Exception as exc:
            import traceback
            print(json.dumps({"name": n, "error": repr(exc),
                              "tb": traceback.format_exc()
                              .splitlines()[-6:]}), flush=True)


if __name__ == "__main__":
    main()
