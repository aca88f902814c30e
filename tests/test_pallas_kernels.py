"""Direct unit tests of the pallas dedispersion kernels (interpret mode on
CPU; the same code paths run compiled on TPU).  Reference results come from
plain numpy FFTs — the kernels must reproduce FFT → chirp → IFFT exactly
up to float32 noise."""

import numpy as np
import pytest

from baseband_tasks_tpu.ops.dedisperse_pallas import (
    dedisperse_pow2, dedisperse_pow2_planes, dedisperse_fold_pow2,
    fold_phase_vector, fold_bins_ref,
    permute_to_storage_order, stockham_ref, split_n)


def make_case(n=1024, L=8, seed=0):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((n, L)) + 1j * rng.standard_normal((n, L))
         ).astype(np.complex64)
    chirp = np.exp(2j * np.pi * rng.standard_normal((n, L)) * 0.1
                   ).astype(np.complex64)
    expected = np.fft.ifft(np.fft.fft(x, axis=0) * chirp, axis=0)
    n1, n2 = split_n(n)
    cs = permute_to_storage_order(chirp, n1, n2)
    return x, cs, expected


class TestStockhamRef:
    @pytest.mark.parametrize("n", [8, 64, 256, 512])
    def test_matches_numpy_fft(self, n):
        rng = np.random.default_rng(1)
        x = (rng.standard_normal((n, 4)) + 1j * rng.standard_normal((n, 4))
             ).astype(np.complex64)
        np.testing.assert_allclose(np.asarray(stockham_ref(x)),
                                   np.fft.fft(x, axis=0),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(stockham_ref(x, inverse=True)),
                                   np.fft.ifft(x, axis=0),
                                   rtol=1e-4, atol=1e-4)


class TestDedispersePow2:
    def test_matches_numpy(self):
        x, cs, expected = make_case()
        yr, yi = dedisperse_pow2(
            np.real(x).astype(np.float32), np.imag(x).astype(np.float32),
            np.real(cs).astype(np.float32), np.imag(cs).astype(np.float32))
        got = np.asarray(yr) + 1j * np.asarray(yi)
        np.testing.assert_allclose(got, expected, rtol=1e-3, atol=2e-3)

    def test_power_output(self):
        x, cs, expected = make_case(seed=2)
        p = dedisperse_pow2(
            np.real(x).astype(np.float32), np.imag(x).astype(np.float32),
            np.real(cs).astype(np.float32), np.imag(cs).astype(np.float32),
            power=True)
        np.testing.assert_allclose(np.asarray(p), np.abs(expected) ** 2,
                                   rtol=1e-3, atol=2e-3)

    def test_planes_input_matches(self):
        x, cs, expected = make_case(seed=3)
        x2 = np.stack([np.real(x), np.imag(x)]).astype(np.float32)
        p = dedisperse_pow2_planes(
            x2, np.real(cs).astype(np.float32),
            np.imag(cs).astype(np.float32), power=True)
        np.testing.assert_allclose(np.asarray(p), np.abs(expected) ** 2,
                                   rtol=1e-3, atol=2e-3)

    def test_rejects_non_pow2(self):
        with pytest.raises(ValueError, match="power of two"):
            dedisperse_pow2(np.zeros((100, 8), np.float32),
                            np.zeros((100, 8), np.float32),
                            None, None)


class TestFoldEncoding:
    def test_vector_and_bins_match_f64_phase(self):
        """fold_phase_vector + fold_bins_ref reproduce floor(frac * n)
        of the f64 linear phase (up to the 2^-31 quantization)."""
        phase0, rate, n_phase = 0.8117, 3 / 700, 64
        fold = fold_phase_vector(phase0, rate)
        assert fold.dtype == np.int32 and fold.shape == (3,)
        t = np.arange(1 << 14)
        bins = fold_bins_ref(fold, t, n_phase)
        frac = (phase0 + t * rate) % 1.0
        ref = np.minimum((frac * n_phase).astype(np.int64), n_phase - 1)
        bad = bins != ref
        # only bin-boundary flips from the 2^-31 quantization are allowed
        assert bad.mean() < 1e-3
        if bad.any():
            d = (bins[bad] - ref[bad]) % n_phase
            assert np.all((d == 1) | (d == n_phase - 1))

    def test_bin_range(self):
        fold = np.array([(1 << 31) - 1, 12345, 0], np.int32)
        bins = fold_bins_ref(fold, np.arange(4096), 32768)
        assert bins.min() >= 0 and bins.max() <= 32767


class TestFusedFold:
    def test_matches_power_plus_host_fold(self):
        n, L = 1024, 8
        n_phase = 16
        pad_start, n_valid = 128, 768
        fold = fold_phase_vector(55 * 3 / 700, 3 / 700)
        x, cs, expected = make_case(n, L, seed=4)
        power = np.abs(expected) ** 2
        # host fold over the valid rows only, with the kernel's exact map
        j = np.arange(n)
        bins = fold_bins_ref(fold, j, n_phase)
        valid = (j >= pad_start) & (j < pad_start + n_valid)
        prof_ref = np.zeros((n_phase + 1, L), np.float32)
        cnt_ref = np.zeros(n_phase + 1, np.float32)
        for jj in range(n):
            b = bins[jj] if valid[jj] else n_phase
            prof_ref[b] += power[jj]
            cnt_ref[b] += 1
        x2 = np.stack([np.real(x), np.imag(x)]).astype(np.float32)
        prof, cnt = dedisperse_fold_pow2(
            x2, np.real(cs).astype(np.float32),
            np.imag(cs).astype(np.float32),
            fold, n_phase=n_phase,
            pad_start=pad_start, n_valid=n_valid)
        np.testing.assert_allclose(np.asarray(cnt), cnt_ref, atol=0)
        np.testing.assert_allclose(np.asarray(prof), prof_ref,
                                   rtol=1e-3, atol=2e-3)

    def test_trash_bin_collects_halo(self):
        n, L = 512, 8
        n_phase = 8
        x, cs, _ = make_case(n, L, seed=5)
        x2 = np.stack([np.real(x), np.imag(x)]).astype(np.float32)
        prof, cnt = dedisperse_fold_pow2(
            x2, np.real(cs).astype(np.float32),
            np.imag(cs).astype(np.float32),
            fold_phase_vector(0.0, 1 / 100), n_phase=n_phase,
            pad_start=64, n_valid=n - 128)
        cnt = np.asarray(cnt)
        assert cnt[n_phase] == 128          # pad_start + pad_end rows
        assert cnt[:n_phase].sum() == n - 128

    def test_rejects_bad_fold_vector(self):
        n, L = 512, 8
        x, cs, _ = make_case(n, L, seed=6)
        x2 = np.stack([np.real(x), np.imag(x)]).astype(np.float32)
        with pytest.raises(ValueError, match="fold_phase_vector"):
            dedisperse_fold_pow2(
                x2, np.real(cs).astype(np.float32),
                np.imag(cs).astype(np.float32),
                np.array([0], np.int32), n_phase=8,
                pad_start=64, n_valid=n - 128)
        with pytest.raises(ValueError, match="n_phase"):
            dedisperse_fold_pow2(
                x2, np.real(cs).astype(np.float32),
                np.imag(cs).astype(np.float32),
                fold_phase_vector(0.0, 0.01), n_phase=1 << 16,
                pad_start=64, n_valid=n - 128)


class TestStreamWindow:
    def test_stream_matches_padded_window(self):
        """The windowless kernel (block + edge buffers + in-kernel scale)
        must equal the padded-window fold on the assembled window."""
        from baseband_tasks_tpu.ops.dedisperse_pallas import (
            dedisperse_fold_stream)
        import jax.numpy as jnp
        n, L = 2048, 8
        n1, n2 = split_n(n)                 # 32, 64
        p0, p1 = 2 * n2, 3 * n2
        t_main = n - p0 - p1
        rng = np.random.default_rng(7)
        xm = rng.standard_normal((2, t_main, L)).astype(np.float32)
        fr = rng.standard_normal((2, p0, L)).astype(np.float32)
        en = rng.standard_normal((2, p1, L)).astype(np.float32)
        chirp = np.exp(2j * np.pi * rng.standard_normal((n, L)) * 0.05
                       ).astype(np.complex64)
        cs = permute_to_storage_order(chirp, n1, n2)
        scale = np.float32(1.25)
        window = np.concatenate([fr, xm, en], axis=1) * scale
        fold = fold_phase_vector(17 * 3 / 500, 3 / 500)
        kw = dict(n_phase=16, pad_start=p0, n_valid=t_main)
        prof_ref, cnt_ref = dedisperse_fold_pow2(
            window, np.real(cs).astype(np.float32),
            np.imag(cs).astype(np.float32), fold, **kw)
        prof, cnt = dedisperse_fold_stream(
            xm, fr, en, np.real(cs).astype(np.float32),
            np.imag(cs).astype(np.float32), fold,
            jnp.asarray([scale], jnp.float32), **kw)
        np.testing.assert_allclose(np.asarray(cnt), np.asarray(cnt_ref),
                                   atol=0)
        np.testing.assert_allclose(np.asarray(prof), np.asarray(prof_ref),
                                   rtol=1e-4, atol=1e-3)

    def test_rejects_misaligned_pads(self):
        from baseband_tasks_tpu.ops.dedisperse_pallas import (
            dedisperse_fold_stream)
        import jax.numpy as jnp
        n = 1024
        n1, n2 = split_n(n)
        with pytest.raises(ValueError, match="multiple"):
            dedisperse_fold_stream(
                np.zeros((2, n - n2 - 3, 8), np.float32),
                np.zeros((2, n2, 8), np.float32),
                np.zeros((2, 3, 8), np.float32),
                np.zeros((n2, n1, 8), np.float32),
                np.zeros((n2, n1, 8), np.float32),
                fold_phase_vector(0.0, 0.01),
                jnp.asarray([1.0], jnp.float32),
                n_phase=8, pad_start=n2,
                n_valid=n - n2 - 3)

    def test_theta_plane_matches_cos_sin(self):
        """Single-phase-plane chirp (in-kernel cos/sin) must match the
        two-plane cos/sin chirp."""
        from baseband_tasks_tpu.ops.dedisperse_pallas import (
            dedisperse_fold_stream)
        import jax.numpy as jnp
        n, L = 2048, 8
        n1, n2 = split_n(n)
        p0 = p1 = 2 * n2
        t_main = n - p0 - p1
        rng = np.random.default_rng(9)
        xm = rng.standard_normal((2, t_main, L)).astype(np.float32)
        fr = rng.standard_normal((2, p0, L)).astype(np.float32)
        en = rng.standard_normal((2, p1, L)).astype(np.float32)
        theta = (rng.standard_normal((n, L)) * 0.3).astype(np.float64)
        chirp = np.exp(2j * np.pi * theta)
        cs = permute_to_storage_order(chirp.astype(np.complex64), n1, n2)
        ts = permute_to_storage_order(theta.astype(np.float32), n1, n2)
        fold = fold_phase_vector(3 / 300, 1 / 300)
        sc = jnp.asarray([1.0], jnp.float32)
        kw = dict(n_phase=8, pad_start=p0, n_valid=t_main)
        prof_ref, cnt_ref = dedisperse_fold_stream(
            xm, fr, en, np.real(cs).astype(np.float32),
            np.imag(cs).astype(np.float32), fold, sc, **kw)
        prof, cnt = dedisperse_fold_stream(xm, fr, en, ts, None, fold, sc,
                                           **kw)
        np.testing.assert_allclose(np.asarray(cnt), np.asarray(cnt_ref),
                                   atol=0)
        np.testing.assert_allclose(np.asarray(prof), np.asarray(prof_ref),
                                   rtol=1e-4, atol=1e-3)


class TestStokesFold:
    def test_matches_host_stokes_fold(self):
        """stokes=True folds [power | Re(X Y*) | Im(X Y*)] with pols
        paired by a one-lane roll (lanes = (chan, pol), pol minor)."""
        n, L = 1024, 8  # 4 channels x 2 pols
        n_phase = 16
        pad_start, n_valid = 128, 768
        fold = fold_phase_vector(55 * 3 / 700, 3 / 700)
        x, cs, expected = make_case(n, L, seed=11)
        power = np.abs(expected) ** 2
        nbr = np.roll(expected, -1, axis=1)     # lane+1 = my Y (even lanes)
        cross = expected * np.conj(nbr)
        j = np.arange(n)
        bins = fold_bins_ref(fold, j, n_phase)
        valid = (j >= pad_start) & (j < pad_start + n_valid)
        prof_ref = np.zeros((n_phase + 1, 3 * L), np.float32)
        for jj in range(n):
            b = bins[jj] if valid[jj] else n_phase
            prof_ref[b, :L] += power[jj]
            prof_ref[b, L:2 * L] += np.real(cross[jj])
            prof_ref[b, 2 * L:] += np.imag(cross[jj])
        x2 = np.stack([np.real(x), np.imag(x)]).astype(np.float32)
        prof, cnt = dedisperse_fold_pow2(
            x2, np.real(cs).astype(np.float32),
            np.imag(cs).astype(np.float32),
            fold, n_phase=n_phase, stokes=True,
            pad_start=pad_start, n_valid=n_valid)
        prof = np.asarray(prof)
        assert prof.shape == (n_phase + 1, 3 * L)
        np.testing.assert_allclose(prof, prof_ref, rtol=1e-3, atol=3e-3)

    def test_power_part_matches_nonstokes(self):
        n, L = 512, 8
        n_phase = 8
        fold = fold_phase_vector(0.1, 5 / 512)
        x, cs, _ = make_case(n, L, seed=12)
        x2 = np.stack([np.real(x), np.imag(x)]).astype(np.float32)
        args = (x2, np.real(cs).astype(np.float32),
                np.imag(cs).astype(np.float32), fold)
        kw = dict(n_phase=n_phase, pad_start=64, n_valid=384)
        p0, c0 = dedisperse_fold_pow2(*args, **kw)
        p1, c1 = dedisperse_fold_pow2(*args, stokes=True, **kw)
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
        np.testing.assert_allclose(np.asarray(p1)[:, :L], np.asarray(p0),
                                   rtol=1e-6, atol=1e-6)


class TestBF16Intermediates:
    """inter_dtype='bfloat16' trades inter-kernel plane precision for
    HBM bandwidth; the folded profile must stay above the 60 dB bar."""

    def _run(self, inter_dtype, chirp_dtype, seed=12):
        import jax.numpy as jnp
        from baseband_tasks_tpu.ops.dedisperse_pallas import (
            dedisperse_fold_split)
        rng = np.random.default_rng(seed)
        T, L, ps, pe, n_phase = 7168, 8, 512, 512, 32
        n = T + ps + pe
        n1, n2 = split_n(n)
        x = (rng.standard_normal((T, L))
             + 1j * rng.standard_normal((T, L))).astype(np.complex64)
        k = np.fft.fftfreq(n)
        chirp = np.exp(-2j * np.pi * np.outer(30.0 * n * k ** 2 / 2,
                                              1 + np.arange(L) / L) / n
                       ).astype(np.complex64)
        cs = permute_to_storage_order(chirp, n1, n2)
        fr = jnp.zeros((ps, L), jnp.float32)
        er = jnp.zeros((pe, L), jnp.float32)
        return dedisperse_fold_split(
            jnp.asarray(x.real), jnp.asarray(x.imag), fr, fr, er, er,
            jnp.asarray(cs.real.copy()).astype(chirp_dtype),
            jnp.asarray(cs.imag.copy()).astype(chirp_dtype),
            jnp.asarray(np.asarray(fold_phase_vector(0.2, 1 / 97.3))),
            jnp.ones(1, np.float32), n_phase=n_phase, pad_start=ps,
            n_valid=T, inter_dtype=inter_dtype, interpret=True)

    def test_bf16_profile_above_60db(self):
        import jax.numpy as jnp
        p32, c32 = self._run("float32", jnp.float32)
        p16, c16 = self._run("bfloat16", jnp.bfloat16)
        np.testing.assert_array_equal(np.asarray(c32), np.asarray(c16))
        ref = np.asarray(p32, np.float64)
        got = np.asarray(p16, np.float64)
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        # 224 samples/bin here; bench-scale blocks average further down
        assert rel < 1e-3, f"profile error {rel:.2e} below 60 dB"

    def test_bf16_counts_and_trash_bin_exact(self):
        import jax.numpy as jnp
        p16, c16 = self._run("bfloat16", jnp.bfloat16, seed=13)
        c = np.asarray(c16)
        assert c[-1] == 1024 and c[:-1].sum() == 7168
