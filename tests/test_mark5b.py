"""Mark 5B read/write round-trip tests (self-consistent; the reference
used the external `baseband` package for this layer).

Format facts pinned here: 16-byte header (sync 0xABADDEED, 15-bit frame
number, BCD day/seconds/fraction, VLBA CRC-16), fixed 10000-byte
payload, LSB-first channel-fastest packing, and the mark5access
sign-magnitude 2-bit level order (-3.3359, +1, -1, +3.3359).
"""

import numpy as np
import pytest

import baseband_tasks_tpu
from baseband_tasks_tpu import NoiseGenerator
from baseband_tasks_tpu.io import mark5b
from baseband_tasks_tpu.utils import Time, units as u

START = Time("2023-03-01T12:00:00.000000000")  # MJD 60004.5


def stream(shape, rate, spf=10000):
    return NoiseGenerator(shape=shape, start_time=START, sample_rate=rate,
                          samples_per_frame=spf, dtype=np.float32, seed=7)


class TestHeaderPieces:
    def test_bcd(self):
        assert mark5b._bcd_encode(60004 % 1000, 3) == 0x004
        assert mark5b._bcd_decode(0x004, 3) == 4
        assert mark5b._bcd_encode(43200, 5) == 0x43200
        assert mark5b._bcd_decode(0x43200, 5) == 43200
        with pytest.raises(ValueError):
            mark5b._bcd_decode(0xA, 1)

    def test_crc16_linearity(self):
        # CRC of zero is zero; CRC is linear over GF(2)
        assert mark5b.crc16_vlba(0) == 0
        a, b = 0x123456789ABC, 0x0F0F0F0F0F0F
        assert mark5b.crc16_vlba(a ^ b) == \
            mark5b.crc16_vlba(a) ^ mark5b.crc16_vlba(b)

    def test_header_roundtrip(self):
        raw = mark5b._build_header(123, 4, 43200, 9876, user=7)
        assert len(raw) == mark5b.HEADER_BYTES
        h = mark5b._parse_header(raw)
        assert h["frame_nr"] == 123 and h["user"] == 7
        assert mark5b._bcd_decode(h["bcd_jjjsssss"] >> 20, 3) == 4
        assert mark5b._bcd_decode(h["bcd_jjjsssss"] & 0xFFFFF, 5) == 43200
        assert mark5b._bcd_decode(h["bcd_frac"], 4) == 9876
        # written CRC covers w2 + BCD fraction
        assert h["crc"] == mark5b.crc16_vlba(
            (mark5b._bcd_encode(4, 3) << 36)
            | (mark5b._bcd_encode(43200, 5) << 16)
            | mark5b._bcd_encode(9876, 4))

    def test_bad_sync_rejected(self):
        with pytest.raises(ValueError, match="sync"):
            mark5b._parse_header(b"\x00" * 16)


class TestPayloadCodec:
    def test_2bit_levels_are_sign_magnitude(self):
        # wire codes 0..3 packed LSB-first into one byte: 0b11100100
        raw = np.array([0b11100100], np.uint8)
        vals = mark5b._decode_payload(raw.tobytes(), 2, 4)
        np.testing.assert_allclose(vals, [-3.3359, 1.0, -1.0, 3.3359],
                                   rtol=1e-6)

    @pytest.mark.parametrize("bps", [1, 2, 4, 8])
    def test_encode_decode_identity(self, bps):
        rng = np.random.default_rng(5)
        n = 4000
        x = rng.standard_normal(n).astype(np.float32) * \
            (1.5 if bps <= 2 else 4 if bps == 4 else 60)
        enc = mark5b._encode_payload(x, bps)
        dec = mark5b._decode_payload(enc, bps, n)
        # re-encoding the decoded values is exact (codec is idempotent)
        assert mark5b._encode_payload(dec, bps) == enc
        if bps == 1:
            np.testing.assert_array_equal(np.sign(dec), np.where(
                x > 0, 1.0, -1.0))


class TestMark5BRoundtrip:
    @pytest.mark.parametrize("bps,nchan", [(2, 4), (2, 16), (8, 4),
                                           (4, 8), (1, 32), (2, 1)])
    def test_roundtrip(self, tmp_path, bps, nchan):
        spf = mark5b.PAYLOAD_BYTES * 8 // (bps * nchan)
        rate = u.Quantity(spf * 4, u.Hz)   # 4 frames/s
        shape = (spf * 3, nchan) if nchan > 1 else (spf * 3,)
        sh = stream(shape, rate)
        data = np.asarray(sh.read()) * (1.5 if bps <= 2 else
                                        4 if bps == 4 else 60)
        path = str(tmp_path / f"b{bps}c{nchan}.m5b")
        with mark5b.open(path, "w", template=sh, bps=bps) as fw:
            fw.write(data)
        with mark5b.open(path, nchan=nchan, bps=bps, ref_time=START,
                         sample_rate=rate) as fr:
            assert fr.shape == shape
            assert fr.dtype == np.float32
            assert fr.sample_rate == rate
            assert abs((fr.start_time - START).sec) < 1e-9
            back = np.asarray(fr.read())
        flat_b, flat_d = back.ravel(), data.ravel()
        corr = np.corrcoef(flat_b, flat_d)[0, 1]
        assert corr > {1: 0.6, 2: 0.85, 4: 0.98, 8: 0.995}[bps]

    def test_mid_second_start_and_seek(self, tmp_path):
        nchan, bps = 4, 2
        spf = mark5b.PAYLOAD_BYTES * 8 // (bps * nchan)   # 10000
        rate = u.Quantity(spf * 8, u.Hz)
        t0 = START + u.Quantity(3 * spf / (spf * 8), u.s)  # frame 3
        sh = NoiseGenerator(shape=(spf * 2, nchan), start_time=t0,
                            sample_rate=rate, samples_per_frame=spf,
                            dtype=np.float32, seed=3)
        data = np.asarray(sh.read()) * 1.5
        path = str(tmp_path / "mid.m5b")
        with mark5b.open(path, "w", template=sh) as fw:
            fw.write(data)
        with mark5b.open(path, nchan=nchan, ref_time=START,
                         sample_rate=rate) as fr:
            assert abs((fr.start_time - t0).sec) < 1e-9
            fr.seek(spf)
            tail = np.asarray(fr.read(spf))
            fr.seek(0)
            full = np.asarray(fr.read())
        np.testing.assert_array_equal(tail, full[spf:])

    def test_rate_inference_across_seconds(self, tmp_path):
        nchan, bps = 4, 2
        spf = mark5b.PAYLOAD_BYTES * 8 // (bps * nchan)
        rate = u.Quantity(spf * 2, u.Hz)     # 2 frames per second
        sh = stream((spf * 4, nchan), rate)  # 2 seconds
        data = np.asarray(sh.read()) * 1.5
        path = str(tmp_path / "infer.m5b")
        with mark5b.open(path, "w", template=sh) as fw:
            fw.write(data)
        with mark5b.open(path, nchan=nchan, ref_time=START) as fr:
            assert fr.sample_rate == rate
            assert fr.shape[0] == spf * 4

    def test_short_file_requires_rate(self, tmp_path):
        nchan = 4
        spf = mark5b.PAYLOAD_BYTES * 8 // (2 * nchan)
        rate = u.Quantity(spf * 8, u.Hz)
        sh = stream((spf, nchan), rate)
        path = str(tmp_path / "short.m5b")
        with mark5b.open(path, "w", template=sh) as fw:
            fw.write(np.asarray(sh.read()))
        with pytest.raises(ValueError, match="sample_rate"):
            mark5b.open(path, nchan=nchan, ref_time=START)

    def test_era_resolution(self, tmp_path):
        """The 3-digit header day resolves against ref_time or kday."""
        nchan = 4
        spf = mark5b.PAYLOAD_BYTES * 8 // (2 * nchan)
        rate = u.Quantity(spf * 4, u.Hz)
        sh = stream((spf, nchan), rate)
        path = str(tmp_path / "era.m5b")
        with mark5b.open(path, "w", template=sh) as fw:
            fw.write(np.asarray(sh.read()))
        for kw in (dict(ref_time=START + u.Quantity(400 * 86400, u.s)),
                   dict(ref_time=START - u.Quantity(400 * 86400, u.s)),
                   dict(kday=60000)):
            with mark5b.open(path, nchan=nchan, sample_rate=rate,
                             **kw) as fr:
                assert abs((fr.start_time - START).sec) < 1e-9
        with pytest.raises(ValueError, match="ref_time"):
            mark5b.open(path, nchan=nchan, sample_rate=rate)
        with pytest.raises(ValueError, match="multiple of 1000"):
            mark5b.open(path, nchan=nchan, sample_rate=rate, kday=60500)

    def test_millennium_day_wrap(self, tmp_path):
        """A file spanning the 999 -> 000 era-day wrap must order its
        frames correctly and keep the pre-wrap start time."""
        nchan, bps = 4, 2
        spf = mark5b.PAYLOAD_BYTES * 8 // (bps * nchan)
        rate = u.Quantity(spf * 2, u.Hz)        # 2 frames/s
        t0 = Time.from_mjd(60999) + u.Quantity(86399.5, u.s)
        sh = NoiseGenerator(shape=(spf * 4, nchan), start_time=t0,
                            sample_rate=rate, samples_per_frame=spf,
                            dtype=np.float32, seed=9)
        data = np.asarray(sh.read()) * 1.5
        path = str(tmp_path / "wrap.m5b")
        with mark5b.open(path, "w", template=sh) as fw:
            fw.write(data)
        with open(path, "rb") as fh:
            raw = fh.read()
        h_first = mark5b._parse_header(raw[:16])
        h_last = mark5b._parse_header(raw[-mark5b.FRAME_BYTES:]
                                      [:16])
        assert mark5b._bcd_decode(h_first["bcd_jjjsssss"] >> 20, 3) == 999
        assert mark5b._bcd_decode(h_last["bcd_jjjsssss"] >> 20, 3) == 0
        with mark5b.open(path, nchan=nchan, sample_rate=rate,
                         ref_time=t0) as fr:
            assert abs((fr.start_time - t0).sec) < 1e-9
            assert fr.shape[0] == spf * 4
            back = np.asarray(fr.read())
        corr = np.corrcoef(back.ravel(), data.ravel())[0, 1]
        assert corr > 0.85

    def test_gap_zero_filled(self, tmp_path):
        nchan = 4
        spf = mark5b.PAYLOAD_BYTES * 8 // (2 * nchan)
        rate = u.Quantity(spf * 8, u.Hz)
        sh = stream((spf * 3, nchan), rate)
        data = np.asarray(sh.read()) * 1.5
        path = str(tmp_path / "gap.m5b")
        with mark5b.open(path, "w", template=sh) as fw:
            fw.write(data)
        # drop the middle frame
        with open(path, "rb") as fh:
            raw = fh.read()
        with open(path, "wb") as fh:
            fh.write(raw[:mark5b.FRAME_BYTES])
            fh.write(raw[2 * mark5b.FRAME_BYTES:])
        with mark5b.open(path, nchan=nchan, ref_time=START,
                         sample_rate=rate) as fr:
            assert fr.shape[0] == spf * 3
            back = np.asarray(fr.read())
        assert np.all(back[spf:2 * spf] == 0)
        assert not np.all(back[:spf] == 0)
        assert not np.all(back[2 * spf:] == 0)

    def test_partial_final_frame_padded_with_warning(self, tmp_path):
        nchan = 4
        spf = mark5b.PAYLOAD_BYTES * 8 // (2 * nchan)
        rate = u.Quantity(spf * 8, u.Hz)
        sh = stream((spf + 100, nchan), rate, spf + 100)
        path = str(tmp_path / "tail.m5b")
        fw = mark5b.open(path, "w", template=sh)
        fw.write(np.asarray(sh.read()))
        with pytest.warns(UserWarning, match="zero-padding"):
            fw.close()
        with mark5b.open(path, nchan=nchan, ref_time=START,
                         sample_rate=rate) as fr:
            assert fr.shape[0] == 2 * spf

    def test_complex_rejected(self, tmp_path):
        sh = NoiseGenerator(shape=(1000, 4), start_time=START,
                            sample_rate=40 * u.kHz,
                            samples_per_frame=1000,
                            dtype=np.complex64, seed=1)
        with pytest.raises(ValueError, match="real"):
            mark5b.open(str(tmp_path / "c.m5b"), "w", template=sh)


class TestRegistry:
    def test_autodetect_by_sync_word(self, tmp_path):
        nchan = 4
        spf = mark5b.PAYLOAD_BYTES * 8 // (2 * nchan)
        rate = u.Quantity(spf * 4, u.Hz)
        sh = stream((spf, nchan), rate)
        path = str(tmp_path / "auto.dat")   # suffix gives no hint
        with mark5b.open(path, "w", template=sh) as fw:
            fw.write(np.asarray(sh.read()))
        with baseband_tasks_tpu.open(path, nchan=nchan, ref_time=START,
                                     sample_rate=rate) as fr:
            assert isinstance(fr, mark5b.Mark5BStreamReader)
            assert fr.shape == (spf, nchan)
