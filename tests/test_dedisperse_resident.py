"""Single-pass resident dedisperse+fold kernel vs references.

Two independent checks (CPU interpret mode):
- a float64 numpy overlap-save mirror with the kernel's exact
  fixed-point bin map (fold_bins_ref);
- the production three-kernel path (dedisperse_fold_split) at a
  *different* (whole-block) window size — overlap-save equality across
  window sizes is the strongest semantic check.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from baseband_tasks_tpu.ops.dedisperse_pallas import (
    _FX_MASK, dedisperse_fold_split, fold_bins_ref, fold_phase_vector,
    permute_to_storage_order, split_n)
from baseband_tasks_tpu.ops.dedisperse_resident import (
    dedisperse_fold_resident, resident_geometry)


def make_case(seed=0, T=1536 * 4, L=8, n_window=2048, ps=256, pe=256,
              n_causal=200, n_anti=100):
    """Random complex block + halos + a short random FIR (support
    [-n_anti, n_causal] ⊂ [-pe, ps]) whose frequency response serves as
    the 'chirp' at any window length."""
    rng = np.random.default_rng(seed)
    x = (rng.normal(size=(T, L)) + 1j * rng.normal(size=(T, L))
         ).astype(np.complex64)
    front = (rng.normal(size=(ps, L)) + 1j * rng.normal(size=(ps, L))
             ).astype(np.complex64)
    end = (rng.normal(size=(pe, L)) + 1j * rng.normal(size=(pe, L))
           ).astype(np.complex64)
    h_causal = (rng.normal(size=(n_causal + 1, L))
                + 1j * rng.normal(size=(n_causal + 1, L)))
    h_anti = (rng.normal(size=(n_anti, L))
              + 1j * rng.normal(size=(n_anti, L)))
    norm = np.sqrt(n_causal + n_anti + 1.0)
    return x, front, end, h_causal / norm, h_anti / norm


def chirp_at(n, h_causal, h_anti):
    L = h_causal.shape[1]
    h = np.zeros((n, L), np.complex128)
    h[:len(h_causal)] = h_causal
    h[-len(h_anti):] = h_anti
    return np.fft.fft(h, axis=0)


def fold_ref_numpy(detect, foldv, n_phase, ps):
    """Reference fold of the valid samples with the kernel's bin map;
    t=0 at the front-halo start (include-pad convention)."""
    T = detect.shape[0]
    bins = fold_bins_ref(np.asarray(foldv), np.arange(T) + ps, n_phase)
    prof = np.zeros((n_phase + 1, detect.shape[1]), np.float64)
    cnt = np.zeros(n_phase + 1, np.float64)
    np.add.at(prof, bins, detect)
    np.add.at(cnt, bins, 1.0)
    return prof, cnt


def overlap_save_numpy(x, front, end, chirp, n_window, ps, pe):
    """Float64 overlap-save convolution over the kernel's windows."""
    hop = n_window - ps - pe
    padded = np.concatenate([front, x, end], axis=0).astype(np.complex128)
    T = x.shape[0]
    out = np.zeros((T, x.shape[1]), np.complex128)
    for w0 in range(0, T, hop):
        win = padded[w0:w0 + n_window]
        y = np.fft.ifft(np.fft.fft(win, axis=0) * chirp, axis=0)
        out[w0:w0 + hop] = y[ps:ps + hop]
    return out


def run_resident(x, front, end, chirp, foldv, *, n_window, ps, pe,
                 n_phase, stokes=False, engine="stockham"):
    hop, n1, n2 = resident_geometry(n_window, ps, pe)
    stor = permute_to_storage_order(chirp.astype(np.complex64), n1, n2)
    return dedisperse_fold_resident(
        jnp.asarray(x.real), jnp.asarray(x.imag),
        jnp.asarray(front.real), jnp.asarray(front.imag),
        jnp.asarray(end.real), jnp.asarray(end.imag),
        jnp.asarray(stor.real.copy()), jnp.asarray(stor.imag.copy()),
        jnp.asarray(np.asarray(foldv)), jnp.ones(1, jnp.float32),
        n_window=n_window, n_phase=n_phase, pad_start=ps, pad_end=pe,
        stokes=stokes, engine=engine, interpret=True)


class TestResidentKernel:
    @pytest.mark.parametrize("stokes", [False, True])
    @pytest.mark.parametrize("engine", ["stockham", "mxu"])
    def test_matches_numpy_reference(self, stokes, engine):
        n_window, ps, pe, n_phase = 2048, 256, 256, 16
        x, front, end, hc, ha = make_case()
        chirp = chirp_at(n_window, hc, ha)
        foldv = fold_phase_vector(0.123, 1.0 / 300.7)
        prof, cnt = run_resident(x, front, end, chirp, foldv,
                                 n_window=n_window, ps=ps, pe=pe,
                                 n_phase=n_phase, stokes=stokes,
                                 engine=engine)
        y = overlap_save_numpy(x, front, end, chirp, n_window, ps, pe)
        if stokes:
            power = np.abs(y) ** 2
            y1 = np.roll(y, -1, axis=1)
            detect = np.concatenate(
                [power, (y * np.conj(y1)).real, (y * np.conj(y1)).imag],
                axis=1)
        else:
            detect = np.abs(y) ** 2
        prof_ref, cnt_ref = fold_ref_numpy(detect, foldv, n_phase, ps)
        # row n_phase is the kernel's pad trash bin (one count per pad
        # row); compare the valid bins
        assert np.array_equal(np.asarray(cnt)[:n_phase],
                              cnt_ref[:n_phase])
        assert np.asarray(cnt)[n_phase] == (ps + pe) * (x.shape[0]
                                                        // (n_window
                                                            - ps - pe))
        scale = np.abs(prof_ref).max()
        assert np.allclose(np.asarray(prof)[:n_phase],
                           prof_ref[:n_phase], atol=2e-4 * scale)

    def test_matches_three_pass_pipeline(self):
        """Same FIR, two window sizes, two kernels — equal profiles."""
        n_window, ps, pe, n_phase = 2048, 256, 256, 8
        x, front, end, hc, ha = make_case(seed=3)
        T, L = x.shape
        foldv = np.asarray(fold_phase_vector(0.4, 1.0 / 173.3))
        prof_r, cnt_r = run_resident(
            x, front, end, chirp_at(n_window, hc, ha), foldv,
            n_window=n_window, ps=ps, pe=pe, n_phase=n_phase)
        # whole-block path: window T + pads = 8192; its halos must hold
        # the same effective history, i.e. [real ps-halo | zeros] front
        # and [real pe-halo | zeros] end — but the FIR support is inside
        # [-pe, ps], so only the adjacent ps/pe samples influence valid
        # outputs and the extension content beyond them cannot matter.
        PS = PE = (8192 - T) // 2
        bn1, bn2 = split_n(8192)
        assert PS % bn2 == 0 and T % bn2 == 0
        chirp_big = chirp_at(8192, hc, ha).astype(np.complex64)
        stor_big = permute_to_storage_order(chirp_big, bn1, bn2)
        frb = np.zeros((PS, L), np.complex64)
        frb[-ps:] = front
        erb = np.zeros((PE, L), np.complex64)
        erb[:pe] = end
        # shift i0 exactly in fixed point: resident t=0 sits (PS - ps)
        # samples later than the big window's t=0
        i0 = np.int64(foldv[0]) - np.int64(PS - ps) * np.int64(foldv[1])
        foldv_big = np.array([i0 & _FX_MASK, foldv[1], 0], np.int64)
        prof_s, cnt_s = dedisperse_fold_split(
            jnp.asarray(x.real), jnp.asarray(x.imag),
            jnp.asarray(frb.real), jnp.asarray(frb.imag),
            jnp.asarray(erb.real), jnp.asarray(erb.imag),
            jnp.asarray(stor_big.real.copy()),
            jnp.asarray(stor_big.imag.copy()),
            jnp.asarray(foldv_big.astype(np.int32)),
            jnp.ones(1, jnp.float32),
            n_phase=n_phase, pad_start=PS, n_valid=T, interpret=True)
        assert np.array_equal(np.asarray(cnt_r[:n_phase]),
                              np.asarray(cnt_s[:n_phase]))
        ref = np.asarray(prof_s[:n_phase], np.float64)
        got = np.asarray(prof_r[:n_phase], np.float64)
        scale = np.abs(ref).max()
        assert np.allclose(got, ref, atol=5e-4 * scale)

    def test_geometry_validation(self):
        with pytest.raises(ValueError, match="power of two"):
            resident_geometry(3000, 256, 256)
        with pytest.raises(ValueError, match="divisor"):
            resident_geometry(2048, 300, 256)
        hop, n1, n2 = resident_geometry(4096, 256, 256)
        assert hop == 3584 and n1 * n2 == 4096
        with pytest.raises(ValueError, match="engine"):
            x, front, end, hc, ha = make_case(T=1536)
            run_resident(x, front, end, chirp_at(2048, hc, ha),
                         fold_phase_vector(0.1, 0.01), n_window=2048,
                         ps=256, pe=256, n_phase=8, engine="vpu")

    def test_engines_agree(self):
        """Stockham and MXU window FFTs give the same profiles."""
        n_window, ps, pe, n_phase = 2048, 256, 256, 8
        x, front, end, hc, ha = make_case(seed=11)
        chirp = chirp_at(n_window, hc, ha)
        foldv = fold_phase_vector(0.25, 1.0 / 211.9)
        prof_s, cnt_s = run_resident(x, front, end, chirp, foldv,
                                     n_window=n_window, ps=ps, pe=pe,
                                     n_phase=n_phase, engine="stockham")
        prof_m, cnt_m = run_resident(x, front, end, chirp, foldv,
                                     n_window=n_window, ps=ps, pe=pe,
                                     n_phase=n_phase, engine="mxu")
        assert np.array_equal(np.asarray(cnt_s), np.asarray(cnt_m))
        scale = np.abs(np.asarray(prof_s)).max()
        assert np.allclose(np.asarray(prof_m), np.asarray(prof_s),
                           atol=2e-4 * scale)
