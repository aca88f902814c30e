import numpy as np
import pytest

from baseband_tasks_tpu.fourier import (
    fft_maker, FFT_MAKER_CLASSES, next_fast_len, NumpyFFTMaker, XLAFFTMaker)
from baseband_tasks_tpu.utils import units as u


class TestNextFastLen:
    @pytest.mark.parametrize("n,expected", [
        (1, 1), (7, 8), (8, 8), (9, 9), (10, 10), (11, 12), (13, 15),
        (17, 18), (1000, 1000), (1001, 1024), (7919, 8000),
    ])
    def test_values(self, n, expected):
        got = next_fast_len(n)
        assert got == expected

    def test_smoothness(self):
        for n in [123, 457, 12345, 99999]:
            m = next_fast_len(n)
            assert m >= n
            x = m
            for p in (2, 3, 5):
                while x % p == 0:
                    x //= p
            assert x == 1


class TestRegistry:
    def test_engines_registered(self):
        assert "xla" in FFT_MAKER_CLASSES
        assert "numpy" in FFT_MAKER_CLASSES

    def test_default_engine_is_xla(self):
        assert isinstance(fft_maker.get(), XLAFFTMaker)

    def test_set_context_manager(self):
        with fft_maker.set("numpy"):
            assert isinstance(fft_maker.get(), NumpyFFTMaker)
        assert isinstance(fft_maker.get(), XLAFFTMaker)


@pytest.mark.parametrize("maker_name", ["xla", "numpy"])
class TestFFTEngines:
    def _maker(self, name):
        return FFT_MAKER_CLASSES[name]()

    def test_complex_roundtrip(self, maker_name):
        maker = self._maker(maker_name)
        rng = np.random.default_rng(1)
        x = (rng.standard_normal((64, 4)) + 1j * rng.standard_normal((64, 4))
             ).astype(np.complex64)
        fft = maker(x.shape, x.dtype, axis=0)
        X = np.asarray(fft(x))
        np.testing.assert_allclose(X, np.fft.fft(x, axis=0), rtol=2e-4,
                                   atol=1e-3)
        back = np.asarray(fft.inverse()(X))
        np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-4)

    def test_real_rfft(self, maker_name):
        maker = self._maker(maker_name)
        rng = np.random.default_rng(2)
        x = rng.standard_normal((128, 2)).astype(np.float32)
        fft = maker(x.shape, x.dtype, axis=0)
        assert fft.frequency_shape == (65, 2)
        X = np.asarray(fft(x))
        np.testing.assert_allclose(X, np.fft.rfft(x, axis=0), rtol=2e-4,
                                   atol=2e-3)
        back = np.asarray(fft.inverse()(X))
        np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-4)

    def test_axis1(self, maker_name):
        maker = self._maker(maker_name)
        rng = np.random.default_rng(3)
        x = (rng.standard_normal((8, 32, 2)) + 0j).astype(np.complex64)
        fft = maker(x.shape, x.dtype, axis=1)
        X = np.asarray(fft(x))
        np.testing.assert_allclose(X, np.fft.fft(x, axis=1), rtol=2e-4,
                                   atol=1e-3)

    def test_ortho_norm(self, maker_name):
        maker = self._maker(maker_name)
        x = np.ones((16,), dtype=np.complex64)
        fft = maker(x.shape, x.dtype, ortho=True)
        X = np.asarray(fft(x))
        assert X[0] == pytest.approx(4.0)  # 16/sqrt(16)

    def test_odd_and_prime_sizes(self, maker_name):
        maker = self._maker(maker_name)
        rng = np.random.default_rng(4)
        for n in (15, 17, 251):
            x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
                 ).astype(np.complex64)
            fft = maker(x.shape, x.dtype)
            np.testing.assert_allclose(np.asarray(fft(x)), np.fft.fft(x),
                                       rtol=1e-3, atol=2e-3)

    def test_frequency_axis(self, maker_name):
        maker = self._maker(maker_name)
        fft = maker((32, 2), np.complex64, sample_rate=32 * u.Hz)
        freq = fft.frequency
        assert freq.shape == (32, 1)
        assert freq[1, 0].to_value(u.Hz) == pytest.approx(1.0)
        assert freq[31, 0].to_value(u.Hz) == pytest.approx(-1.0)

    def test_frequency_real(self, maker_name):
        maker = self._maker(maker_name)
        fft = maker((32,), np.float32, sample_rate=32 * u.Hz)
        freq = fft.frequency
        assert freq.shape == (17,)
        assert freq[16].to_value(u.Hz) == pytest.approx(16.0)

    def test_cross_engine_match(self, maker_name):
        rng = np.random.default_rng(5)
        x = (rng.standard_normal((96, 3)) + 1j * rng.standard_normal((96, 3))
             ).astype(np.complex64)
        ours = np.asarray(self._maker(maker_name)(x.shape, x.dtype, axis=0)(x))
        host = np.asarray(NumpyFFTMaker()(x.shape, x.dtype, axis=0)(x))
        np.testing.assert_allclose(ours, host, rtol=2e-4, atol=2e-3)


class TestPallasEngine:
    def test_registered(self):
        from baseband_tasks_tpu.fourier import FFT_MAKER_CLASSES
        assert "pallas" in FFT_MAKER_CLASSES

    @pytest.mark.parametrize("ortho", [False, True])
    def test_forward_inverse_match_numpy(self, ortho):
        from baseband_tasks_tpu.fourier import PallasFFTMaker
        maker = PallasFFTMaker()
        rng = np.random.default_rng(0)
        x = (rng.standard_normal((1024, 16))
             + 1j * rng.standard_normal((1024, 16))).astype(np.complex64)
        fwd = maker((1024, 16), np.complex64, ortho=ortho)
        assert fwd._use_pallas
        got = np.asarray(fwd(x))
        norm = "ortho" if ortho else None
        np.testing.assert_allclose(got, np.fft.fft(x, axis=0, norm=norm),
                                   rtol=1e-3, atol=1e-2)
        back = np.asarray(fwd.inverse()(got))
        np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-3)

    def test_fallback_paths(self):
        from baseband_tasks_tpu.fourier import PallasFFTMaker
        maker = PallasFFTMaker()
        rng = np.random.default_rng(1)
        # non-pow2 length and real input both fall back to XLA
        x = rng.standard_normal((600, 16)).astype(np.float32)
        fft = maker((600, 16), np.float32)
        assert not fft._use_pallas
        np.testing.assert_allclose(np.asarray(fft(x)),
                                   np.fft.rfft(x, axis=0),
                                   rtol=1e-4, atol=1e-3)

    def test_with_fft_maker_context(self):
        from baseband_tasks_tpu.fourier import fft_maker
        rng = np.random.default_rng(2)
        x = (rng.standard_normal((512, 8))
             + 1j * rng.standard_normal((512, 8))).astype(np.complex64)
        with fft_maker.set("pallas"):
            fft = fft_maker((512, 8), np.complex64)
            got = np.asarray(fft(x))
        np.testing.assert_allclose(got, np.fft.fft(x, axis=0),
                                   rtol=1e-3, atol=1e-2)

    def test_channelize_under_pallas_engine(self):
        from baseband_tasks_tpu.fourier import fft_maker
        from baseband_tasks_tpu import Channelize, NoiseGenerator
        from baseband_tasks_tpu.utils import Time, units as u
        sh = NoiseGenerator(shape=(16384,),
                            start_time=Time("2018-01-01T00:00:00.0"),
                            sample_rate=1 * u.MHz, samples_per_frame=16384,
                            dtype=np.complex64, seed=7)
        raw = np.asarray(sh.read())
        sh.seek(0)
        with fft_maker.set("pallas"):
            ch = Channelize(sh, 512)
            data = np.asarray(ch.read(8))
        expected = np.fft.fft(raw[:8 * 512].reshape(8, 512), axis=1)
        np.testing.assert_allclose(data, expected, rtol=1e-3, atol=1e-2)

    def test_pfb_under_pallas_engine(self):
        """PolyphaseFilterBank + inverse roundtrip under the 'pallas'
        engine (small sizes fall back to XLA; the point is the global
        engine switch leaves the whole PFB stack numerically intact)."""
        from baseband_tasks_tpu.fourier import fft_maker
        from baseband_tasks_tpu import (sinc_hamming, PolyphaseFilterBank,
                                        InversePolyphaseFilterBank,
                                        NoiseGenerator)
        from baseband_tasks_tpu.utils import Time, units as u
        h = sinc_hamming(4, 32)
        with fft_maker.set("pallas"):
            sh = NoiseGenerator(shape=(65536,),
                                start_time=Time("2018-01-01T00:00:00.0"),
                                sample_rate=1 * u.MHz,
                                samples_per_frame=65536,
                                dtype=np.complex64, seed=5)
            raw = np.asarray(sh.read())
            sh.seek(0)
            pfb = PolyphaseFilterBank(sh, h)
            inv = InversePolyphaseFilterBank(pfb, h, sn=1e4,
                                             dtype=np.complex64)
            data = np.asarray(inv.read(4096))
        dt = int(round(float((inv.start_time
                              - sh.start_time).sec) * 1e6))
        expected = raw[dt:dt + 4096]
        err = np.mean(np.abs(data - expected) ** 2) \
            / np.mean(np.abs(expected) ** 2)
        assert err < 1e-6


class TestMatmulDFT:
    """Short transforms route to the MXU DFT matmul (ops/dft_matmul.py)
    on TPU (forced here by monkeypatching the backend; dft_matmul itself
    runs anywhere) and must be numpy-exact to f32 level."""

    @pytest.fixture(autouse=True)
    def _force_tpu_gate(self, monkeypatch):
        import jax
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    @pytest.mark.parametrize("n", [16, 64, 100, 256])
    @pytest.mark.parametrize("ortho", [False, True])
    def test_complex_forward_inverse(self, n, ortho):
        from baseband_tasks_tpu.fourier import PallasFFTMaker
        maker = PallasFFTMaker()
        rng = np.random.default_rng(3)
        x = (rng.standard_normal((40, n))
             + 1j * rng.standard_normal((40, n))).astype(np.complex64)
        fwd = maker((40, n), np.complex64, axis=1, ortho=ortho)
        assert fwd._use_matmul and not fwd._use_pallas
        norm = "ortho" if ortho else None
        got = np.asarray(fwd(x))
        np.testing.assert_allclose(got, np.fft.fft(x, axis=1, norm=norm),
                                   rtol=2e-5, atol=2e-4)
        back = np.asarray(fwd.inverse()(got))
        np.testing.assert_allclose(back, x, rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("n", [32, 63, 256])
    def test_real_rfft_irfft(self, n):
        from baseband_tasks_tpu.fourier import PallasFFTMaker
        maker = PallasFFTMaker()
        rng = np.random.default_rng(4)
        x = rng.standard_normal((24, n)).astype(np.float32)
        fwd = maker((24, n), np.float32, axis=1)
        assert fwd._use_matmul
        got = np.asarray(fwd(x))
        assert got.shape == (24, n // 2 + 1)
        np.testing.assert_allclose(got, np.fft.rfft(x, axis=1),
                                   rtol=2e-5, atol=2e-4)
        back = np.asarray(fwd.inverse()(got))
        np.testing.assert_allclose(back, x, rtol=2e-5, atol=2e-5)

    def test_axis0_and_trailing_dims(self):
        from baseband_tasks_tpu.fourier import PallasFFTMaker
        maker = PallasFFTMaker()
        rng = np.random.default_rng(5)
        x = (rng.standard_normal((128, 10, 2))
             + 1j * rng.standard_normal((128, 10, 2))).astype(np.complex64)
        fft = maker((128, 10, 2), np.complex64, axis=0)
        assert fft._use_matmul
        np.testing.assert_allclose(np.asarray(fft(x)),
                                   np.fft.fft(x, axis=0),
                                   rtol=2e-5, atol=2e-4)
        # middle axis with a trailing (pol) dim — Channelize's shape
        fft1 = maker((64, 100, 2), np.complex64, axis=1)
        y = (rng.standard_normal((64, 100, 2))
             + 1j * rng.standard_normal((64, 100, 2))).astype(np.complex64)
        np.testing.assert_allclose(np.asarray(fft1(y)),
                                   np.fft.fft(y, axis=1),
                                   rtol=2e-5, atol=2e-4)

    def test_channelize_256_under_pallas_engine(self):
        """BASELINE config-1 shape: 256-channel channelizer + detect."""
        from baseband_tasks_tpu.fourier import fft_maker
        from baseband_tasks_tpu import Channelize, NoiseGenerator, Square
        from baseband_tasks_tpu.utils import Time, units as u
        sh = NoiseGenerator(shape=(8192,),
                            start_time=Time("2018-01-01T00:00:00.0"),
                            sample_rate=1 * u.MHz, samples_per_frame=8192,
                            dtype=np.complex64, seed=11)
        raw = np.asarray(sh.read())
        sh.seek(0)
        with fft_maker.set("pallas"):
            sq = Square(Channelize(sh, 256))
            data = np.asarray(sq.read(16))
        expected = np.abs(np.fft.fft(raw[:16 * 256].reshape(16, 256),
                                     axis=1)) ** 2
        np.testing.assert_allclose(data, expected, rtol=2e-5, atol=2e-3)


class TestXLAEngineMatmulGate:
    """The default engine substitutes the MXU DFT matmul only on TPU and
    only for short f32/c64 transforms; on CPU (these tests) jnp.fft runs."""

    def test_gate_logic(self, monkeypatch):
        import jax
        from baseband_tasks_tpu.fourier import XLAFFTMaker
        maker = XLAFFTMaker()
        fft = maker((40, 256), np.complex64, axis=1)
        assert not fft._use_matmul  # CPU backend here
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert fft._use_matmul
        assert not maker((40, 512), np.complex64, axis=1)._use_matmul
        assert not maker((40, 2), np.complex64, axis=1)._use_matmul

    def test_matmul_result_matches_fft(self, monkeypatch):
        """Force the matmul branch (still executing on CPU) and compare
        against numpy — the exact substitution users get on TPU."""
        import jax
        from baseband_tasks_tpu.fourier import XLAFFTMaker
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        maker = XLAFFTMaker()
        rng = np.random.default_rng(8)
        x = (rng.standard_normal((32, 128))
             + 1j * rng.standard_normal((32, 128))).astype(np.complex64)
        fwd = maker((32, 128), np.complex64, axis=1)
        assert fwd._use_matmul
        np.testing.assert_allclose(np.asarray(fwd(x)),
                                   np.fft.fft(x, axis=1),
                                   rtol=2e-5, atol=2e-4)
        back = np.asarray(fwd.inverse()(np.fft.fft(x, axis=1)))
        np.testing.assert_allclose(back, x, rtol=2e-5, atol=2e-5)


class TestNegativeAxis:
    def test_axis_minus_one(self):
        from baseband_tasks_tpu.fourier import fft_maker
        fft = fft_maker((64, 4), "float32", axis=-1)
        assert fft.frequency_shape == (64, 3)
        x = np.random.default_rng(0).standard_normal((64, 4)
                                                     ).astype(np.float32)
        np.testing.assert_allclose(np.asarray(fft(x)),
                                   np.fft.rfft(x, axis=-1), rtol=1e-5,
                                   atol=1e-5)


class TestFrequencyInfoValidation:
    def test_empty_shape_rejected(self):
        from baseband_tasks_tpu.fourier import fft_maker
        with pytest.raises(ValueError, match="empty shape"):
            fft_maker.get().get_frequency_data_info((), "complex64")

    def test_axis_out_of_bounds(self):
        from baseband_tasks_tpu.fourier import fft_maker
        with pytest.raises(ValueError, match="out of bounds"):
            fft_maker.get().get_frequency_data_info((8, 4), "complex64",
                                                    axis=2)
