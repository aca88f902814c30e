"""SIGPROC filterbank reader/writer (io/sigproc.py)."""

import numpy as np
import pytest

from baseband_tasks_tpu import (Channelize, NoiseGenerator, SetAttribute,
                                Square)
from baseband_tasks_tpu.io import sigproc
from baseband_tasks_tpu.utils import Time, units as u

T0 = Time("2021-03-04T05:06:07.000000000")


def make_filterbank_stream(n=1 << 12, nchan=16):
    # Real-input channelizer: nfft // 2 + 1 monotonic, evenly spaced
    # channels — the layout sigproc expects.
    nfft = 2 * (nchan - 1)
    src = NoiseGenerator(shape=(n * nfft,), start_time=T0,
                         sample_rate=nfft * 10 * u.kHz,
                         samples_per_frame=n * nfft // 4, seed=3,
                         dtype=np.float32)
    src = SetAttribute(src, frequency=400 * u.MHz, sideband=1)
    return Square(Channelize(src, nfft))


class TestRoundTrip:
    def test_f32(self, tmp_path):
        fb = make_filterbank_stream()
        data = np.asarray(fb.read())
        fb.seek(0)
        path = str(tmp_path / "x.fil")
        with sigproc.open(path, "w", template=fb,
                          source_name="FAKE") as fw:
            fw.write(data)
        rh = sigproc.open(path)
        assert rh.shape == fb.shape
        assert rh.header["source_name"] == "FAKE"
        assert abs(float((rh.start_time - T0).sec)) < 1e-6
        assert rh.sample_rate == fb.sample_rate
        np.testing.assert_allclose(np.asarray(rh.frequency.to_value(u.MHz)),
                                   np.asarray(fb.frequency.to_value(u.MHz)
                                              ).ravel(), rtol=1e-9)
        got = np.asarray(rh.read())
        np.testing.assert_array_equal(got, data)
        rh.close()

    def test_8bit_quantized(self, tmp_path):
        fb = make_filterbank_stream()
        data = np.asarray(fb.read(1024))
        fb.seek(0)
        path = str(tmp_path / "x8.fil")
        scale = 200.0 / data.max()
        with sigproc.open(path, "w", template=fb, nbits=8,
                          scale=scale, offset=0.0) as fw:
            fw.write(data)
        rh = sigproc.open(path)
        got = np.asarray(rh.read(1024)) / scale
        assert np.max(np.abs(got - data)) <= 0.5 / scale + 1e-6
        rh.close()

    def test_16bit_quantized(self, tmp_path):
        fb = make_filterbank_stream()
        data = np.asarray(fb.read(1024))
        fb.seek(0)
        path = str(tmp_path / "x16.fil")
        scale = 60000.0 / data.max()
        with sigproc.open(path, "w", template=fb, nbits=16,
                          scale=scale, offset=0.0) as fw:
            fw.write(data)
        rh = sigproc.open(path)
        assert rh.header["nbits"] == 16
        got = np.asarray(rh.read(1024)) / scale
        # half a quantization step plus the f32 ulp near the top of
        # the 16-bit range (~60000 * eps)
        tol = (0.5 + 60000 * np.finfo(np.float32).eps) / scale
        assert np.max(np.abs(got - data)) <= tol
        rh.close()

    def test_registry_open_and_detect(self, tmp_path):
        from baseband_tasks_tpu import open as bopen
        from baseband_tasks_tpu.registry import detect_format
        fb = make_filterbank_stream()
        path = str(tmp_path / "auto.fil")
        with sigproc.open(path, "w", template=fb) as fw:
            fw.write(np.asarray(fb.read(512)))
        assert detect_format(path) == "sigproc"
        rh = bopen(path)
        assert rh.shape[1] == 16
        rh.close()

    def test_seek_by_time(self, tmp_path):
        fb = make_filterbank_stream()
        path = str(tmp_path / "seek.fil")
        with sigproc.open(path, "w", template=fb) as fw:
            fw.write(np.asarray(fb.read()))
        rh = sigproc.open(path)
        rh.seek(T0 + 100 / rh.sample_rate)
        assert rh.tell() == 100
        rh.close()

    def test_writer_validates_before_creating_file(self, tmp_path):
        """Bad keywords/strings must fail BEFORE the output file exists
        (no truncated files, no leaked handles — round-3 review)."""
        import os
        fb = make_filterbank_stream()
        bad = str(tmp_path / "bad.fil")
        with pytest.raises(ValueError, match="unknown sigproc"):
            sigproc.open(bad, "w", template=fb, bogus_key=3)
        assert not os.path.exists(bad)
        with pytest.raises(ValueError, match="1-127"):
            sigproc.open(bad, "w", template=fb,
                         source_name="J" + "x" * 130)
        assert not os.path.exists(bad)

    def test_rejects_complex_and_bad_nbits(self, tmp_path):
        src = NoiseGenerator(shape=(256, 4), start_time=T0,
                             sample_rate=1 * u.kHz,
                             samples_per_frame=256, seed=1)
        src = SetAttribute(src, frequency=(100 + np.arange(4)) * u.MHz,
                           sideband=1)
        with pytest.raises(ValueError, match="detected"):
            sigproc.open(str(tmp_path / "c.fil"), "w", template=src)
        fb = make_filterbank_stream()
        with pytest.raises(ValueError, match="nbits"):
            sigproc.open(str(tmp_path / "b.fil"), "w", template=fb,
                         nbits=2)

    def test_feeds_dm_search(self, tmp_path):
        """The survey loop: filterbank file -> DMTrialSearch."""
        from baseband_tasks_tpu.models import DMTrialSearch
        fb = make_filterbank_stream(n=1 << 12, nchan=16)
        path = str(tmp_path / "survey.fil")
        with sigproc.open(path, "w", template=fb) as fw:
            fw.write(np.asarray(fb.read()))
        rh = sigproc.open(path)
        s = DMTrialSearch(u.Quantity(
            np.asarray(rh.frequency.to_value(u.MHz)), u.MHz),
            rh.sample_rate, [0.0, 5.0], 1 << 10)
        out = s.search(np.asarray(rh.read(1 << 10)))
        assert out.shape == (1 << 10, 2)
        assert np.isfinite(np.asarray(out)).all()
        rh.close()
