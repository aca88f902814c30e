"""On-device bit-unpack (ops/unpack_device.py) vs the host C decoder.

The device decode must be bit-identical to native/unpack.c for every
possible input byte — the carrier trick (packed bytes riding in float32
bit patterns) must also survive jit exactly, including payloads whose
f32 interpretation is NaN/Inf.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from baseband_tasks_tpu import native
from baseband_tasks_tpu.ops.unpack_device import (
    VDIF_2BIT_LEVELS, pack_bytes_to_f32, unpack_1bit_device,
    unpack_2bit_device, unpack_4bit_device, unpack_8bit_device,
    words_from_f32)


def all_bytes():
    """Every byte value in every lane position, plus random payloads."""
    rng = np.random.default_rng(42)
    seq = np.arange(256, dtype=np.uint8)
    return np.concatenate([
        seq, seq[::-1], np.repeat(seq, 4)[:1024],
        rng.integers(0, 256, 4096, dtype=np.uint8)])


class TestCarrier:
    def test_roundtrip_bits(self):
        raw = all_bytes()
        xf = pack_bytes_to_f32(raw)
        words = np.asarray(jax.jit(words_from_f32)(xf))
        assert words.dtype == np.uint32
        np.testing.assert_array_equal(words.view(np.uint8)[:raw.size], raw)

    def test_nan_payload_survives(self):
        # bytes forming sNaN/qNaN/Inf float32 patterns
        raw = np.array([1, 0, 128, 127,     # 0x7F800001 sNaN
                        0, 0, 192, 127,     # 0x7FC00000 qNaN
                        0, 0, 128, 255],    # 0xFF800000 -Inf
                       dtype=np.uint8)
        xf = pack_bytes_to_f32(raw)
        words = np.asarray(jax.jit(words_from_f32)(xf))
        np.testing.assert_array_equal(words.view(np.uint8), raw)

    def test_padding(self):
        xf = pack_bytes_to_f32(np.array([1, 2, 3, 4, 5], np.uint8))
        assert xf.size == 2  # padded to 8 bytes


class TestAgainstHostDecoder:
    def test_8bit(self):
        raw = all_bytes()
        host = native.unpack_8bit(raw)
        dev = np.asarray(jax.jit(unpack_8bit_device)(
            pack_bytes_to_f32(raw)))[:raw.size]
        np.testing.assert_array_equal(dev, host)

    def test_4bit(self):
        raw = all_bytes()
        host = native.unpack_4bit(raw)
        dev = np.asarray(jax.jit(unpack_4bit_device)(
            pack_bytes_to_f32(raw)))[:raw.size * 2]
        np.testing.assert_array_equal(dev, host)

    def test_2bit(self):
        raw = all_bytes()
        host = native.unpack_2bit(raw, VDIF_2BIT_LEVELS)
        dev = np.asarray(jax.jit(unpack_2bit_device)(
            pack_bytes_to_f32(raw)))[:raw.size * 4]
        np.testing.assert_array_equal(dev, host)

    def test_2bit_custom_levels(self):
        raw = all_bytes()
        levels = np.array([-7.0, -2.0, 2.0, 7.0], np.float32)
        host = native.unpack_2bit(raw, levels)
        fn = jax.jit(lambda x: unpack_2bit_device(x, levels))
        dev = np.asarray(fn(pack_bytes_to_f32(raw)))[:raw.size * 4]
        np.testing.assert_array_equal(dev, host)

    def test_1bit(self):
        raw = np.array([0b10110001, 0xFF, 0x00, 0x55], np.uint8)
        dev = np.asarray(jax.jit(unpack_1bit_device)(
            pack_bytes_to_f32(raw)))[:32]
        bits = np.unpackbits(raw, bitorder="little").astype(np.float32)
        np.testing.assert_array_equal(dev, bits * 2 - 1)


class TestShapes:
    def test_batched_carrier(self):
        """Leading axes pass through; expansion is on the last axis."""
        rng = np.random.default_rng(3)
        raw = rng.integers(0, 256, (2, 3, 64), dtype=np.uint8)
        xf = np.stack([np.stack([pack_bytes_to_f32(raw[i, j])
                                 for j in range(3)])
                       for i in range(2)])
        out = np.asarray(jax.jit(unpack_8bit_device)(xf))
        assert out.shape == (2, 3, 64)
        host = native.unpack_8bit(raw.ravel()).reshape(2, 3, 64)
        np.testing.assert_array_equal(out, host)

    def test_decode_feeds_pipeline_dtype(self):
        x = pack_bytes_to_f32(all_bytes())
        out = jax.jit(lambda v: unpack_2bit_device(v) ** 2)(x)
        assert out.dtype == jnp.float32
