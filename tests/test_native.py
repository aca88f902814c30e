"""Native bit-unpack runtime: C LUT decoder vs numpy reference."""

import numpy as np
import pytest

from baseband_tasks_tpu import native


class TestNative:
    def test_compiles(self):
        assert native.available()

    def test_8bit(self):
        raw = np.arange(256, dtype=np.uint8)
        out = native.unpack_8bit(raw)
        np.testing.assert_allclose(out, np.arange(256) - 127.5)

    def test_4bit(self):
        raw = np.array([0x21, 0xFF], np.uint8)
        out = native.unpack_4bit(raw)
        np.testing.assert_allclose(out, [1 - 7.5, 2 - 7.5, 7.5, 7.5])

    def test_2bit(self):
        levels = np.array([-3.0, -1.0, 1.0, 3.0], np.float32)
        raw = np.array([0b11100100], np.uint8)  # codes 0,1,2,3
        out = native.unpack_2bit(raw, levels)
        np.testing.assert_allclose(out, levels)

    def test_pack_unpack_2bit_roundtrip(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(4096).astype(np.float32)
        thr = np.array([-0.9816, 0.0, 0.9816], np.float32)
        levels = np.array([-3.3359, -1.0, 1.0, 3.3359],
                          np.float32) * 0.4528
        packed = native.pack_2bit(x, thr)
        assert packed.dtype == np.uint8
        assert packed.size == 1024
        back = native.unpack_2bit(packed, levels)
        corr = np.dot(back, x) / np.sqrt(np.dot(back, back) * np.dot(x, x))
        assert corr > 0.85  # 2-bit quantization efficiency ~0.88

    def test_matches_numpy_fallback(self):
        rng = np.random.default_rng(1)
        raw = rng.integers(0, 256, 1000).astype(np.uint8)
        levels = np.linspace(-3, 3, 4).astype(np.float32)
        fast = native.unpack_2bit(raw, levels)
        # force the fallback path
        vals = np.empty(raw.size * 4, np.uint8)
        vals[0::4] = raw & 0x3
        vals[1::4] = (raw >> 2) & 0x3
        vals[2::4] = (raw >> 4) & 0x3
        vals[3::4] = raw >> 6
        slow = levels[vals]
        np.testing.assert_array_equal(fast, slow)


def test_pack_2bit_tail_padding_matches_fallback():
    """Tail samples (n % 4 != 0) pad with code 0 in both the C library
    and the numpy fallback, so packed bytes are identical regardless of
    which implementation ran."""
    from baseband_tasks_tpu import native
    thr = np.array([-2.0, 0.0, 2.0], np.float32)
    x = np.array([-3.0, 3.0, -3.0], np.float32)   # n % 4 == 3
    via_lib = native.pack_2bit(x, thr)
    # numpy fallback: digitize + pad code 0 (mirror of the <no-compiler>
    # branch in native.pack_2bit)
    idx = np.digitize(x, thr).astype(np.uint8)
    idx = np.concatenate([idx, np.zeros(1, np.uint8)])
    via_np = (idx[0::4] | (idx[1::4] << 2) | (idx[2::4] << 4)
              | (idx[3::4] << 6))
    np.testing.assert_array_equal(via_lib, via_np)
    assert via_lib[0] & 0b11000000 == 0           # padded slot = code 0
