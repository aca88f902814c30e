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
    VDIF_2BIT_LEVELS, pack_bytes_to_f32, pack_time_planes,
    pack_time_quarters, plane_edges_device, quarter_edges_device,
    unpack_1bit_device, unpack_2bit_device, unpack_4bit_device,
    unpack_8bit_device, words_from_f32)


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


class TestQuarterPacking:
    """Fused-decode layout (pack_time_quarters + in-K1 decode): the
    packed pipeline must reproduce the float path bit-for-bit at the
    decode and to float roundoff through the kernels."""

    def test_quarter_edges_match_decode(self):
        rng = np.random.default_rng(5)
        b = rng.integers(0, 256, (64, 16), dtype=np.uint8)
        xp = jnp.asarray(pack_time_quarters(b))
        front, end = quarter_edges_device(xp, 5, 7)
        dec = b.astype(np.float32) - 127.5
        np.testing.assert_array_equal(np.asarray(front), dec[:5])
        np.testing.assert_array_equal(np.asarray(end), dec[-7:])

    def test_fused_kernel_matches_split_path(self):
        from baseband_tasks_tpu.ops import dedisperse_pallas as dp
        t_main, p0, p1 = 896, 32, 96    # window 1024, rows%4==0
        L, n_phase = 128, 8
        rng = np.random.default_rng(0)
        br = rng.integers(0, 256, (t_main, L), dtype=np.uint8)
        bi = rng.integers(0, 256, (t_main, L), dtype=np.uint8)
        dec_r = br.astype(np.float32) - 127.5
        dec_i = bi.astype(np.float32) - 127.5
        fr, er = dec_r[-p0:], dec_r[:p1]
        fi, ei = dec_i[-p0:], dec_i[:p1]
        ph = rng.uniform(-0.5, 0.5, (t_main + p0 + p1, L))
        cr = np.cos(2 * np.pi * ph).astype(np.float32)
        ci = np.sin(2 * np.pi * ph).astype(np.float32)
        n1, n2 = dp.split_n(t_main + p0 + p1)
        csr = dp.permute_to_storage_order(cr, n1, n2)
        csi = dp.permute_to_storage_order(ci, n1, n2)
        fold = dp.fold_phase_vector(0.1, 1.0 / 97.0)
        scale = np.float32(1 / 64.0).reshape(1)
        ref = dp.dedisperse_fold_split(
            dec_r, dec_i, fr, fi, er, ei, csr, csi, fold, scale,
            n_phase=n_phase, pad_start=p0, n_valid=t_main)
        got = dp.dedisperse_fold_split_packed(
            jnp.asarray(pack_time_quarters(br)),
            jnp.asarray(pack_time_quarters(bi)),
            fr, fi, er, ei, csr, csi, fold, scale,
            n_phase=n_phase, pad_start=p0, n_valid=t_main)
        np.testing.assert_array_equal(np.asarray(ref[1]),
                                      np.asarray(got[1]))
        np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(got[0]),
                                   rtol=1e-5, atol=1e-3)

    def test_packed_pipeline_matches_float_on_mesh(self):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from baseband_tasks_tpu.models import WidebandPulsarPipeline
        from baseband_tasks_tpu.utils import units as u

        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                    ("time", "chan"))
        pipe = WidebandPulsarPipeline(
            n_chan=8, n_pol=2, dm=0.5, freq_center=600 * u.MHz,
            chan_rate=250 * u.kHz, period_samples=(512, 1), n_phase=8,
            block_samples=1024, mesh=mesh, use_pallas=True)
        T = pipe.global_block
        rng = np.random.default_rng(1)
        br = rng.integers(0, 256, (T, 8, 2), dtype=np.uint8)
        bi = rng.integers(0, 256, (T, 8, 2), dtype=np.uint8)
        xr = (br.astype(np.float32) - 127.5) / 64.0
        xi = (bi.astype(np.float32) - 127.5) / 64.0
        csr, csi = pipe._chirp_storage_np()
        spec = NamedSharding(mesh, P(None, None, "chan"))
        cs = (jax.device_put(csr, spec), jax.device_put(csi, spec))
        foldv = pipe._foldv_device(jnp.asarray(np.float32(0)))

        def run(fn, a, b):
            sharded = jax.shard_map(
                fn, mesh=mesh,
                in_specs=(P("time", "chan"), P("time", "chan"),
                          P(None, None, "chan"), P(None, None, "chan"),
                          P(), P()),
                out_specs=(P(None, "chan"), P()), check_vma=False)
            return jax.jit(lambda x, y: sharded(
                x, y, *cs, jnp.zeros(()), foldv))(a, b)

        prof_ref, cnt_ref = run(pipe._local_step_pallas_split,
                                jnp.asarray(xr), jnp.asarray(xi))

        half = T // 2

        def pack_sharded(bb):
            parts = [pack_time_quarters(
                bb[s * half:(s + 1) * half].reshape(half, -1)
            ).reshape(half // 4, 8, 2) for s in range(2)]
            return np.concatenate(parts, axis=0)

        import functools
        prof_p, cnt_p = run(
            functools.partial(pipe._local_step_pallas_split_packed, 8),
            jnp.asarray(pack_sharded(br)),
            jnp.asarray(pack_sharded(bi)))
        np.testing.assert_array_equal(np.asarray(cnt_ref),
                                      np.asarray(cnt_p))
        np.testing.assert_allclose(np.asarray(prof_ref),
                                   np.asarray(prof_p),
                                   rtol=1e-5, atol=1e-3)


class TestTwoBitFusedIngest:
    """2-bit (VDIF-style) plane-packed ingest through the fused kernel:
    1/16 the HBM read traffic of float planes, bit-identical decode."""

    def test_fused_kernel_matches_host_decode(self):
        from baseband_tasks_tpu.ops import dedisperse_pallas as dp
        t_main, p0, p1 = 512, 256, 256   # window 1024, nm=16
        L, n_phase = 128, 8
        rng = np.random.default_rng(2)
        cr2 = rng.integers(0, 4, (t_main, L), dtype=np.uint8)
        ci2 = rng.integers(0, 4, (t_main, L), dtype=np.uint8)
        dec_r = VDIF_2BIT_LEVELS[cr2]
        dec_i = VDIF_2BIT_LEVELS[ci2]
        fr, er = dec_r[-p0:], dec_r[:p1]
        fi, ei = dec_i[-p0:], dec_i[:p1]
        ph = rng.uniform(-0.5, 0.5, (t_main + p0 + p1, L))
        n1, n2 = dp.split_n(1024)
        csr = dp.permute_to_storage_order(
            np.cos(2 * np.pi * ph).astype(np.float32), n1, n2)
        csi = dp.permute_to_storage_order(
            np.sin(2 * np.pi * ph).astype(np.float32), n1, n2)
        fold = dp.fold_phase_vector(0.1, 1.0 / 97.0)
        scale = np.float32(0.5).reshape(1)
        ref = dp.dedisperse_fold_split(
            dec_r, dec_i, fr, fi, er, ei, csr, csi, fold, scale,
            n_phase=n_phase, pad_start=p0, n_valid=t_main)
        got = dp.dedisperse_fold_split_packed(
            jnp.asarray(pack_time_planes(cr2, 2)),
            jnp.asarray(pack_time_planes(ci2, 2)),
            fr, fi, er, ei, csr, csi, fold, scale,
            n_phase=n_phase, pad_start=p0, n_valid=t_main, bits=2)
        np.testing.assert_array_equal(np.asarray(ref[1]),
                                      np.asarray(got[1]))
        np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(got[0]),
                                   rtol=1e-5, atol=1e-3)

    def test_plane_edges_multi_plane_pads(self):
        rng = np.random.default_rng(3)
        for bits, hi in ((2, 4), (4, 16), (8, 256), (1, 2)):
            c = rng.integers(0, hi, (512, 16), dtype=np.uint8)
            if bits == 2:
                dec = VDIF_2BIT_LEVELS[c]
            elif bits == 1:
                dec = np.where(c == 0, -1.0, 1.0).astype(np.float32)
            else:
                dec = c.astype(np.float32) - (127.5 if bits == 8 else 7.5)
            xp = jnp.asarray(pack_time_planes(c, bits))
            for ps, pe in ((16, 48), (200, 300), (512, 512)):
                f, e = plane_edges_device(xp, ps, pe, bits)
                np.testing.assert_array_equal(np.asarray(f), dec[:ps])
                np.testing.assert_array_equal(np.asarray(e), dec[-pe:])

    def test_run_fn_2bit_smoke(self):
        from jax.sharding import Mesh
        from baseband_tasks_tpu.models import WidebandPulsarPipeline
        from baseband_tasks_tpu.utils import units as u

        mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                    ("time", "chan"))
        pipe = WidebandPulsarPipeline(
            n_chan=8, n_pol=2, dm=0.1, freq_center=600 * u.MHz,
            chan_rate=250 * u.kHz, period_samples=(512, 1), n_phase=8,
            block_samples=3584, mesh=mesh, use_pallas=True,
            ingest_bits=2)
        run = pipe.run_fn(2, ingest_bits=2)
        prof, cnt = run(3)
        assert float(np.asarray(cnt).sum()) == 2 * pipe.global_block
        assert np.isfinite(np.asarray(prof)).all()

    def test_run_fn_bits_bound_at_creation(self):
        """A later run_fn with a different bit depth must not change the
        decode of a run closure created earlier (bits is bound into the
        step, not read off self at trace time)."""
        from jax.sharding import Mesh
        from baseband_tasks_tpu.models import WidebandPulsarPipeline
        from baseband_tasks_tpu.utils import units as u

        mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                    ("time", "chan"))

        def make():
            return WidebandPulsarPipeline(
                n_chan=8, n_pol=2, dm=0.1, freq_center=600 * u.MHz,
                chan_rate=250 * u.kHz, period_samples=(512, 1), n_phase=8,
                block_samples=3584, mesh=mesh, use_pallas=True,
                ingest_bits=2)

        pipe = make()
        run2 = pipe.run_fn(1, ingest_bits=2)   # not yet traced
        pipe.run_fn(1, ingest_bits=8)          # must not poison run2
        prof, cnt = run2(5)
        ref_prof, ref_cnt = make().run_fn(1, ingest_bits=2)(5)
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(ref_cnt))
        np.testing.assert_allclose(np.asarray(prof), np.asarray(ref_prof),
                                   rtol=1e-6, atol=1e-6)
