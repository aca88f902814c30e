"""VDIF read/write round-trip tests (self-consistent; the reference used
the external `baseband` package for this layer)."""

import numpy as np
import os
import pytest

from baseband_tasks_tpu import NoiseGenerator
from baseband_tasks_tpu.io import vdif
from baseband_tasks_tpu.utils import Time, units as u

START = Time("2018-06-15T07:00:00.000000000")


RATE = u.Quantity(1 << 20, u.Hz)  # 1.048576 MHz: frames are 2^k


def stream(shape=(32768, 2), dtype=np.complex64, rate=RATE):
    return NoiseGenerator(shape=shape, start_time=START, sample_rate=rate,
                          samples_per_frame=8192, dtype=dtype, seed=23)


class TestVDIFRoundtrip:
    @pytest.mark.parametrize("bps", [8, 4, 2])
    def test_dual_pol_complex(self, tmp_path, bps):
        sh = stream()
        # scale to good quantization range for offset-binary encodings
        data = np.asarray(sh.read()) * (16 if bps == 8 else
                                        2 if bps == 4 else 1)
        path = str(tmp_path / f"b{bps}.vdif")
        with vdif.open(path, "w", template=sh, bps=bps) as fw:
            fw.write(data)
        with vdif.open(path, sample_rate=RATE) as fr:
            assert fr.shape == (32768, 2)
            assert fr.dtype == np.complex64
            assert fr.sample_rate == RATE
            assert abs((fr.start_time - START).sec) < 1e-9
            back = np.asarray(fr.read())
        corr = np.abs(np.vdot(back, data)) / np.sqrt(
            np.vdot(back, back).real * np.vdot(data, data).real)
        assert corr > (0.995 if bps == 8 else 0.98 if bps == 4 else 0.85)

    def test_real_single_channel(self, tmp_path):
        sh = stream(shape=(16384,), dtype=np.float32)
        data = np.asarray(sh.read()) * 16
        path = str(tmp_path / "real.vdif")
        with vdif.open(path, "w", template=sh, bps=8) as fw:
            fw.write(data)
        with vdif.open(path, sample_rate=RATE) as fr:
            assert fr.shape == (16384,)
            assert fr.dtype == np.float32
            back = np.asarray(fr.read())
        assert np.corrcoef(back, data)[0, 1] > 0.995

    def test_seek_and_partial_reads(self, tmp_path):
        sh = stream()
        data = np.asarray(sh.read()) * 16
        path = str(tmp_path / "x.vdif")
        with vdif.open(path, "w", template=sh, bps=8) as fw:
            for i in range(0, 32768, 4096):
                fw.write(data[i:i + 4096])
        with vdif.open(path, sample_rate=RATE) as fr:
            fr.seek(10000)
            a = np.asarray(fr.read(100))
        corr = np.abs(np.vdot(a, data[10000:10100])) / np.sqrt(
            np.vdot(a, a).real
            * np.vdot(data[10000:10100], data[10000:10100]).real)
        assert corr > 0.99

    def test_header_fields(self, tmp_path):
        sh = stream()
        path = str(tmp_path / "h.vdif")
        with vdif.open(path, "w", template=sh, bps=8, station=42) as fw:
            fw.write(np.asarray(sh.read()))
        with open(path, "rb") as fh:
            hdr = vdif._parse_header(fh.read(32))
        assert hdr["station"] == 42
        assert hdr["bps"] == 8
        assert hdr["complex"] is True
        assert not hdr["legacy"]

    def test_mid_second_start_time(self, tmp_path):
        t0 = Time("2018-06-15T07:00:00.250000000")
        sh = NoiseGenerator(shape=(8192, 2), start_time=t0,
                            sample_rate=RATE, samples_per_frame=8192,
                            dtype=np.complex64, seed=1)
        path = str(tmp_path / "m.vdif")
        with vdif.open(path, "w", template=sh, bps=8) as fw:
            fw.write(np.asarray(sh.read()))
        with vdif.open(path, sample_rate=RATE) as fr:
            assert abs((fr.start_time - t0).sec) < 1e-9


    def test_rate_inference_across_seconds(self, tmp_path):
        rate = 8192 * u.Hz
        sh = NoiseGenerator(shape=(16384, 2), start_time=START,
                            sample_rate=rate, samples_per_frame=8192,
                            dtype=np.complex64, seed=2)
        path = str(tmp_path / "infer.vdif")
        with vdif.open(path, "w", template=sh, bps=8) as fw:
            fw.write(np.asarray(sh.read()) * 16)
        with vdif.open(path) as fr:  # no sample_rate given
            assert fr.sample_rate.to_value(u.Hz) == pytest.approx(8192)

    def test_short_file_requires_rate(self, tmp_path):
        sh = stream(shape=(8192, 2))
        path = str(tmp_path / "short.vdif")
        with vdif.open(path, "w", template=sh, bps=8) as fw:
            fw.write(np.asarray(sh.read()))
        with pytest.raises(ValueError, match="sample_rate"):
            vdif.open(path)


class TestInterleaving:
    def test_shuffled_frame_order(self, tmp_path):
        """Frames shuffled on disk must still read correctly (real VDIF
        files interleave threads arbitrarily)."""
        sh = stream(shape=(16384, 2))
        data = np.asarray(sh.read()) * 16
        path = str(tmp_path / "ord.vdif")
        with vdif.open(path, "w", template=sh, bps=8) as fw:
            fw.write(data)
        with open(path, "rb") as fh:
            raw = fh.read()
        fb = vdif._parse_header(raw[:32])["frame_len8"] * 8
        frames = [raw[i:i + fb] for i in range(0, len(raw), fb)]
        rng = np.random.default_rng(0)
        order = rng.permutation(len(frames))
        shuffled = str(tmp_path / "shuf.vdif")
        with open(shuffled, "wb") as fh:
            for k in order:
                fh.write(frames[k])
        with vdif.open(path, sample_rate=RATE) as fa:
            a = np.asarray(fa.read())
        with vdif.open(shuffled, sample_rate=RATE) as fb_:
            b = np.asarray(fb_.read())
        np.testing.assert_array_equal(a, b)

    def test_missing_frame_zero_filled(self, tmp_path):
        sh = stream(shape=(8192, 2))
        data = np.asarray(sh.read()) * 16
        path = str(tmp_path / "m.vdif")
        with vdif.open(path, "w", template=sh, bps=8) as fw:
            fw.write(data)
        with open(path, "rb") as fh:
            raw = fh.read()
        fb = vdif._parse_header(raw[:32])["frame_len8"] * 8
        # drop the 3rd frame on disk
        cut = raw[:2 * fb] + raw[3 * fb:]
        dropped = str(tmp_path / "drop.vdif")
        with open(dropped, "wb") as fh:
            fh.write(cut)
        with vdif.open(dropped, sample_rate=RATE) as fr:
            out = np.asarray(fr.read())
        assert out.shape[0] == 8192
        # one (frame, thread) slab is zero, the rest intact
        with vdif.open(path, sample_rate=RATE) as fr:
            full = np.asarray(fr.read())
        diff = np.abs(out - full) > 1e-6
        assert diff.any() and diff.mean() < 0.3


class TestVDIFEdgeCases:
    def test_invalid_frames_zero_filled(self, tmp_path):
        """Frames flagged invalid carry junk payloads: they must read as
        zeros, exactly like missing frames."""
        import builtins
        name = str(tmp_path / "inv.vdif")
        src = NoiseGenerator(shape=(64,), start_time=START,
                             sample_rate=16 * u.Hz, seed=3,
                             samples_per_frame=16, dtype=np.float32)
        with vdif.open(name, "w", template=src, bps=8,
                       samples_per_frame=16) as w:
            w.write(np.asarray(src.read()))
        # set the invalid bit on frame 1
        frame_bytes = os.path.getsize(name) // 4
        with builtins.open(name, "r+b") as fh:
            fh.seek(frame_bytes)
            w0 = int.from_bytes(fh.read(4), "little") | (1 << 31)
            fh.seek(frame_bytes)
            fh.write(w0.to_bytes(4, "little"))
        rd = vdif.open(name)
        data = np.asarray(rd.read())
        assert np.all(data[16:32] == 0)
        assert not np.all(data[:16] == 0)
        rd.close()

    def test_multichannel_roundtrip_keeps_channels(self, tmp_path):
        """A read->write->read cycle of a multi-channel single-thread
        file must preserve the channel axis meaning."""
        name1 = str(tmp_path / "a.vdif")
        src = NoiseGenerator(shape=(64, 4), start_time=START,
                             sample_rate=16 * u.Hz, seed=5,
                             samples_per_frame=16, dtype=np.complex64)
        with vdif.open(name1, "w", template=src, bps=8,
                       samples_per_frame=16) as w:
            w.write(np.asarray(src.read()))
        r1 = vdif.open(name1)
        assert r1.sample_shape == (4,)
        data1 = np.asarray(r1.read())
        name2 = str(tmp_path / "b.vdif")
        r1.seek(0)
        with vdif.open(name2, "w", template=r1, bps=8,
                       samples_per_frame=16) as w:
            w.write(np.asarray(r1.read()))
        r2 = vdif.open(name2)
        assert r2.sample_shape == (4,)
        np.testing.assert_allclose(np.asarray(r2.read()), data1,
                                   atol=0.05)
        r1.close(); r2.close()

    def test_non_pow2_channels_rejected(self):
        src = NoiseGenerator(shape=(64, 3, 2), start_time=START,
                             sample_rate=16 * u.Hz, seed=5,
                             samples_per_frame=16, dtype=np.complex64)
        with pytest.raises(ValueError, match="power-of-two"):
            vdif.open("/tmp/never.vdif", "w", template=src)
