"""HDF5 container round-trip tests (reference strategy:
io/hdf5/tests/test_hdf5.py write->read equality incl. encoded payloads)."""

import numpy as np
import pytest

from baseband_tasks_tpu import NoiseGenerator, SetAttribute, Channelize
from baseband_tasks_tpu.io import hdf5
from baseband_tasks_tpu.utils import Time, units as u

START = Time("2018-04-01T13:00:00.000000000")


def make_stream(dtype=np.complex64, shape=(4096, 2)):
    sh = NoiseGenerator(shape=shape, start_time=START, sample_rate=1 * u.MHz,
                        samples_per_frame=1024, dtype=dtype, seed=17)
    return SetAttribute(sh, frequency=[400.0, 400.0] * u.MHz, sideband=1,
                        polarization=["X", "Y"])


class TestRawRoundtrip:
    def test_write_read(self, tmp_path):
        sh = make_stream()
        data = np.asarray(sh.read())
        sh.seek(0)
        path = str(tmp_path / "stream.h5")
        with hdf5.open(path, "w", template=sh) as fw:
            fw.write(data)
        with hdf5.open(path, "r") as fr:
            assert fr.shape == sh.shape
            assert fr.dtype == sh.dtype
            assert fr.sample_rate == sh.sample_rate
            assert abs((fr.start_time - sh.start_time).sec) < 1e-10
            np.testing.assert_allclose(fr.frequency.to_value(u.MHz), 400.0)
            assert list(fr.polarization) == ["X", "Y"]
            back = np.asarray(fr.read())
        np.testing.assert_array_equal(back, data)

    def test_seek_by_time_after_reopen(self, tmp_path):
        sh = make_stream()
        data = np.asarray(sh.read())
        sh.seek(0)
        path = str(tmp_path / "stream.h5")
        with hdf5.open(path, "w", template=sh) as fw:
            fw.write(data)
        fr = hdf5.open(path, "r")
        fr.seek(START + 1 * u.ms)
        assert fr.tell() == 1000
        np.testing.assert_array_equal(np.asarray(fr.read(10)),
                                      data[1000:1010])

    def test_chunked_writes(self, tmp_path):
        sh = make_stream()
        data = np.asarray(sh.read())
        path = str(tmp_path / "stream.h5")
        with hdf5.open(path, "w", template=sh) as fw:
            for i in range(0, 4096, 512):
                fw.write(data[i:i + 512])
        back = np.asarray(hdf5.open(path).read())
        np.testing.assert_array_equal(back, data)

    def test_processed_stream_template(self, tmp_path):
        # write an intermediate product (channelized stream)
        ct = Channelize(make_stream(), 256)
        data = np.asarray(ct.read())
        path = str(tmp_path / "chan.h5")
        with hdf5.open(path, "w", template=ct) as fw:
            fw.write(data)
        fr = hdf5.open(path)
        assert fr.shape == ct.shape
        assert fr.frequency.shape == (256, 2)


class TestC4Roundtrip:
    def test_half_precision(self, tmp_path):
        sh = make_stream()
        data = np.asarray(sh.read())
        path = str(tmp_path / "c4.h5")
        with hdf5.open(path, "w", template=sh, encoding="c4") as fw:
            fw.write(data)
        back = np.asarray(hdf5.open(path).read())
        assert back.dtype == np.complex64
        np.testing.assert_allclose(back, data, atol=0.01)


class TestBpsRoundtrip:
    @pytest.mark.parametrize("bps,min_corr", [(8, 0.999), (4, 0.99),
                                              (2, 0.85)])
    def test_bit_encodings(self, tmp_path, bps, min_corr):
        sh = make_stream()
        data = np.asarray(sh.read())
        path = str(tmp_path / f"b{bps}.h5")
        with hdf5.open(path, "w", template=sh, bps=bps) as fw:
            fw.write(data)
        fr = hdf5.open(path)
        assert fr.bps == bps
        back = np.asarray(fr.read())
        assert back.dtype == np.complex64
        # quantized: check correlation rather than equality
        corr = np.abs(np.vdot(back, data)) \
            / np.sqrt(np.vdot(back, back).real * np.vdot(data, data).real)
        assert corr > min_corr

    def test_eof_write_raises(self, tmp_path):
        sh = make_stream(shape=(100, 2))
        path = str(tmp_path / "x.h5")
        fw = hdf5.open(path, "w", template=sh)
        with pytest.raises(EOFError):
            fw.write(np.zeros((200, 2), np.complex64))
        fw.close()


class TestBitAlignment:
    def test_pathological_frame_size_realigned(self, tmp_path):
        """Sub-byte-packed payloads force byte-aligned frame starts."""
        sh = make_stream(shape=(4096, 2))
        data = np.asarray(sh.read())
        path = str(tmp_path / "a.h5")
        with hdf5.open(path, "w", template=sh, bps=2) as fw:
            fw.write(data)
        fr = hdf5.open(path, samples_per_frame=3)
        full = np.asarray(hdf5.open(path).read())
        out = np.asarray(fr.read())
        np.testing.assert_allclose(out, full, atol=1e-6)


class TestValidFlag:
    """Reference io/hdf5/frame.py:51-59 ``valid`` flag, generalized to
    per-range validity: invalid ranges read back as zeros."""

    def test_invalid_range_reads_zero(self, tmp_path):
        from baseband_tasks_tpu.io import hdf5
        from baseband_tasks_tpu import NoiseGenerator
        from baseband_tasks_tpu.utils import Time, units as u

        src = NoiseGenerator(shape=(3000,),
                             start_time=Time("2020-01-01T00:00:00.0"),
                             sample_rate=1 * u.kHz,
                             samples_per_frame=1000, seed=12)
        path = str(tmp_path / "valid.h5")
        src.seek(0)
        with hdf5.open(path, "w", template=src) as wh:
            wh.write(np.asarray(src.read(1000)))
            wh.write(np.asarray(src.read(1000)), valid=False)
            wh.write(np.asarray(src.read(1000)))
        rh = hdf5.open(path)
        assert not rh.valid
        assert rh.invalid_ranges == [(1000, 2000)]
        out = np.asarray(rh.read(3000))
        src.seek(0)
        want = np.asarray(src.read(3000))
        np.testing.assert_array_equal(out[:1000], want[:1000])
        np.testing.assert_array_equal(out[1000:2000], 0)
        np.testing.assert_array_equal(out[2000:], want[2000:])
        rh.close()

    def test_all_valid_by_default(self, tmp_path):
        from baseband_tasks_tpu.io import hdf5
        from baseband_tasks_tpu import NoiseGenerator
        from baseband_tasks_tpu.utils import Time, units as u

        src = NoiseGenerator(shape=(100,),
                             start_time=Time("2020-01-01T00:00:00.0"),
                             sample_rate=1 * u.kHz,
                             samples_per_frame=100, seed=13)
        path = str(tmp_path / "allvalid.h5")
        with hdf5.open(path, "w", template=src) as wh:
            wh.write(np.asarray(src.read(100)))
        rh = hdf5.open(path)
        assert rh.valid and rh.invalid_ranges == []
        rh.close()


class TestUnpairedAttributes:
    """Files carrying frequency without sideband (written before the
    pairing invariant, or by other tools) must stay readable: the reader
    defaults the sideband to upper / drops an unpaired sideband."""

    def test_frequency_only_header(self, tmp_path):
        import h5py
        from baseband_tasks_tpu.io.hdf5 import _attrs_from_header
        out = _attrs_from_header(
            {"frequency": {"value": [1.4e9, 1.41e9]}})
        assert np.all(out["sideband"] == 1)
        out = _attrs_from_header({"sideband": [1, -1]})
        assert "sideband" not in out
