"""Public helper functions mirrored from the reference's module API.

Covers the small reference-public names the parity sweep found missing:
``complex_square`` (functions.py:15), ``is_index`` (integration.py:42),
``to_sample`` (sampling.py:17), ``adjust_response_dims``
(convolution.py:13), ``check_imaginary`` (phases/phase.py:113),
``fortran_fmt``/``int_frac`` (phases/predictor.py:315,408), and the
psrfits ``get_readers``/``get_writer`` dispatchers (core.py:92,134).
"""

import numpy as np
import pytest

from baseband_tasks_tpu import NoiseGenerator
from baseband_tasks_tpu.convolution import adjust_response_dims
from baseband_tasks_tpu.functions import complex_square
from baseband_tasks_tpu.integration import is_index
from baseband_tasks_tpu.phases import Phase
from baseband_tasks_tpu.phases.phase import check_imaginary
from baseband_tasks_tpu.phases.predictor import fortran_fmt, int_frac
from baseband_tasks_tpu.sampling import to_sample
from baseband_tasks_tpu.utils import Time, units as u

START = Time("2018-01-01T00:00:00")


def stream(shape=(2048, 4), rate_hz=1000.0):
    return NoiseGenerator(shape=shape, start_time=START,
                          sample_rate=u.Quantity(rate_hz, u.Hz),
                          samples_per_frame=256, seed=7)


class TestComplexSquare:
    def test_complex(self):
        z = np.array([3 + 4j, 1 - 2j])
        assert np.allclose(complex_square(z), [25.0, 5.0])
        assert complex_square(z).dtype.kind == "f"


class TestIsIndex:
    @pytest.mark.parametrize("n,expected", [
        (3, True), (np.int64(5), True), (3.0, False), ("4", False),
        (None, False), (u.Quantity(3, u.one), False)])
    def test_cases(self, n, expected):
        assert is_index(n) is expected


class TestToSample:
    def test_time_quantity(self):
        ih = stream()
        assert np.allclose(to_sample(ih, u.Quantity(0.25, u.s)), 250.0)

    def test_dimensionless_and_plain(self):
        ih = stream()
        assert np.allclose(to_sample(ih, u.Quantity([1.5, 2.5], u.one)),
                           [1.5, 2.5])
        assert np.allclose(to_sample(ih, 7), 7.0)


class TestAdjustResponseDims:
    def test_1d_gains_trailing_axes(self):
        ih = stream(shape=(2048, 4))
        r = adjust_response_dims(np.ones(5), ih)
        assert r.shape == (5, 1)

    def test_matching_passes_and_mismatch_raises(self):
        ih = stream(shape=(2048, 4))
        r = adjust_response_dims(np.ones((5, 4)), ih)
        assert r.shape == (5, 4)
        with pytest.raises(ValueError):
            adjust_response_dims(np.ones((5, 3)), ih)


class TestCheckImaginary:
    def test_real(self):
        a, imag = check_imaginary(np.array([1.0, 2.0]))
        assert not imag and np.all(a == [1.0, 2.0])

    def test_pure_imaginary(self):
        a, imag = check_imaginary(np.array([1j, 2j]))
        assert imag and np.all(a == [1.0, 2.0])

    def test_pure_real_complex_dtype(self):
        a, imag = check_imaginary(np.array([1.0 + 0j]))
        assert not imag and np.all(a == [1.0])

    def test_mixed_raises(self):
        with pytest.raises(ValueError):
            check_imaginary(np.array([1.0 + 1j]))

    def test_consistent_with_phase_imaginary(self):
        ph = Phase(np.array([1j, 2j]))
        assert ph.imaginary


class TestFortranFmt:
    def test_reference_shape(self):
        s = fortran_fmt(89667.09123456789012)
        # mantissa in [0.1, 1), D exponent, same overall width + 1
        assert s.endswith("D+05")
        assert "0.8966709123456789" in s

    def test_negative(self):
        s = fortran_fmt(-0.5)
        assert s.strip().startswith("-0.5")
        assert s.endswith("D+00")

    def test_roundtrip(self):
        for x in (1.2345e-7, -9.87654321e12, 3.0):
            s = fortran_fmt(x)
            assert float(s.replace("D", "e")) == pytest.approx(x, rel=1e-15)


class TestIntFrac:
    def test_split_is_lossless(self):
        v = int_frac(" 58000.91234567890123 ")
        assert v["int"] == 58000
        assert v["frac"] == float("0.91234567890123")

    def test_no_fraction(self):
        v = int_frac("42")
        assert v["int"] == 42 and v["frac"] == 0.0


class TestPsrfitsDispatch:
    def test_get_readers_and_writer_roundtrip(self, tmp_path):
        from baseband_tasks_tpu.io import psrfits

        rng = np.random.default_rng(5)
        profiles = rng.normal(size=(3, 16, 4, 2)).astype(np.float32)

        class FoldTemplate:
            shape = profiles.shape
            start_time = START
            sample_rate = u.Quantity(0.1, u.Hz)
            meta = {"__attributes__": {
                "frequency": u.Quantity(
                    np.linspace(1400.0, 1430.0, 4)[:, np.newaxis], u.MHz)}}

        name = str(tmp_path / "disp.fits")
        w = psrfits.get_writer(name, FoldTemplate())
        assert isinstance(w, psrfits.PSRFITSWriter)
        with w:
            w.write(profiles)
        readers = psrfits.get_readers(name)
        assert len(readers) == 1
        r = readers[0]
        assert isinstance(r, psrfits.PSRFITSReader)
        got = r.read(3)
        # 16-bit quantization: 1 part in ~3e4 of the per-row range
        assert np.allclose(got, profiles, atol=np.ptp(profiles) * 1e-4)
