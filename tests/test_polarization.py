"""Polarization basis conversion and Jones calibration (beyond the
reference, which carries polarization labels but never acts on the
state).  Conventions pinned: unitary IAU/IEEE circular pair, label
order honored, power conserved, round trips exact."""

import numpy as np
import pytest

from baseband_tasks_tpu import (ApplyJones, Channelize,
                                ConvertPolarization, NoiseGenerator,
                                SetAttribute, Square)
from baseband_tasks_tpu.utils import Time, units as u

T0 = Time("2020-01-01")


def noise(seed=1, shape=(4096, 2), pol=("X", "Y")):
    sh = NoiseGenerator(shape=shape, start_time=T0,
                        sample_rate=1 * u.MHz, samples_per_frame=1024,
                        seed=seed, dtype=np.complex64)
    return SetAttribute(sh, polarization=np.array(pol))


class TestConvert:
    def test_linear_to_circular_values(self):
        sh = noise()
        conv = ConvertPolarization(sh, "circular")
        x = sh.read(256)
        sh.seek(0)
        got = np.asarray(conv.read(256))
        expect_l = (x[:, 0] - 1j * x[:, 1]) / np.sqrt(2)
        expect_r = (x[:, 0] + 1j * x[:, 1]) / np.sqrt(2)
        np.testing.assert_allclose(got[:, 0], expect_l, rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(got[:, 1], expect_r, rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_array_equal(conv.polarization, ["L", "R"])

    def test_power_conserved(self):
        conv = ConvertPolarization(noise(3), "circular")
        x = np.asarray(conv.ih.read(1024))
        conv.ih.seek(0)
        y = np.asarray(conv.read(1024))
        np.testing.assert_allclose(np.abs(y) ** 2 @ np.ones(2),
                                   np.abs(x) ** 2 @ np.ones(2),
                                   rtol=1e-5)

    def test_round_trip(self):
        sh = noise(5)
        back = ConvertPolarization(ConvertPolarization(sh, "circular"),
                                   "linear")
        x = sh.read(512)
        sh.seek(0)
        np.testing.assert_allclose(np.asarray(back.read(512)), x,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(back.polarization, ["X", "Y"])

    def test_pure_x_gives_equal_circular_power(self):
        sh = noise(7)
        x = np.zeros((1024, 2), np.complex64)
        x[:, 0] = 1.0 + 0.5j
        from baseband_tasks_tpu import StreamGenerator
        gen = SetAttribute(
            StreamGenerator(lambda s: x[:1024], shape=(4096, 2),
                            start_time=T0, sample_rate=1 * u.MHz,
                            samples_per_frame=1024,
                            dtype=np.complex64),
            polarization=np.array(["X", "Y"]))
        y = np.asarray(ConvertPolarization(gen, "circular").read(100))
        np.testing.assert_allclose(np.abs(y[:, 0]), np.abs(y[:, 1]),
                                   rtol=1e-5)

    def test_label_order_honored(self):
        a = noise(9, pol=("X", "Y"))
        b = noise(9, pol=("Y", "X"))
        cb = ConvertPolarization(b, "circular")
        yb = np.asarray(cb.read(256))
        # stream b holds (Y, X): its samples are the same numbers but
        # the component MEANING is swapped, so converting must give the
        # swapped circular pair of the swapped linear pair
        np.testing.assert_array_equal(cb.polarization, ["R", "L"])
        a.seek(0)
        xa = a.read(256)
        # interpret stream b's data as X=comp1, Y=comp0
        expect_l = (xa[:, 1] - 1j * xa[:, 0]) / np.sqrt(2)
        np.testing.assert_allclose(yb[:, 1], expect_l, rtol=1e-5,
                                   atol=1e-6)

    def test_already_in_basis_rejected(self):
        with pytest.raises(ValueError, match="already"):
            ConvertPolarization(noise(1, pol=("L", "R")), "circular")

    def test_needs_complex(self):
        sh = NoiseGenerator(shape=(1024, 2), start_time=T0,
                            sample_rate=1 * u.MHz,
                            samples_per_frame=256, seed=1,
                            dtype=np.float32)
        with pytest.raises(ValueError, match="complex"):
            ConvertPolarization(SetAttribute(
                sh, polarization=np.array(["X", "Y"])), "circular")


class TestJones:
    def test_diagonal_gains(self):
        sh = noise(11)
        J = np.array([[2.0, 0], [0, 0.5j]], np.complex64)
        out = ApplyJones(sh, J)
        x = sh.read(256)
        sh.seek(0)
        y = np.asarray(out.read(256))
        np.testing.assert_allclose(y[:, 0], 2.0 * x[:, 0], rtol=1e-5)
        np.testing.assert_allclose(y[:, 1], 0.5j * x[:, 1], rtol=1e-5)

    def test_inverse_round_trip(self):
        sh = noise(13)
        J = np.array([[1.2, 0.1 + 0.05j], [-0.08j, 0.9]], np.complex64)
        corrupted = ApplyJones(sh, J)
        calibrated = corrupted.inverse()
        x = sh.read(512)
        sh.seek(0)
        np.testing.assert_allclose(np.asarray(calibrated.read(512)), x,
                                   rtol=1e-4, atol=1e-5)

    def test_per_channel_jones(self):
        # channelized stream: sample shape (n_chan, 2)... Channelize of
        # (4096, 2) gives (time, chan, pol)?  sample shape (chan, pol)
        sh = Channelize(noise(15, shape=(1 << 14, 2)), 16)
        n_chan = 16
        rng = np.random.default_rng(0)
        J = np.zeros((n_chan, 2, 2), np.complex64)
        J[:, 0, 0] = 1 + 0.1 * rng.standard_normal(n_chan)
        J[:, 1, 1] = 1 + 0.1 * rng.standard_normal(n_chan)
        out = ApplyJones(sh, J)
        x = sh.read(64)
        sh.seek(0)
        y = np.asarray(out.read(64))
        np.testing.assert_allclose(y[..., 0], x[..., 0] * J[:, 0, 0],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(y[..., 1], x[..., 1] * J[:, 1, 1],
                                   rtol=1e-4, atol=1e-4)

    def test_rotation_matrix(self):
        """A rotation Jones matrix turns pure X into (cos, sin)."""
        theta = 0.7
        c, s = np.cos(theta), np.sin(theta)
        Jrot = np.array([[c, -s], [s, c]], np.complex64)
        e0 = np.zeros((4, 2), np.complex64)
        e0[:, 0] = 1.0
        from baseband_tasks_tpu import StreamGenerator
        gen = SetAttribute(
            StreamGenerator(lambda st: e0, shape=(16, 2), start_time=T0,
                            sample_rate=1 * u.MHz, samples_per_frame=4,
                            dtype=np.complex64),
            polarization=np.array(["X", "Y"]))
        got = np.asarray(ApplyJones(gen, Jrot).read(1))[0]
        np.testing.assert_allclose(got, [c, s], rtol=1e-6, atol=1e-7)
        # unitary: total power preserved
        np.testing.assert_allclose(np.sum(np.abs(got) ** 2), 1.0,
                                   rtol=1e-6)

    def test_compiled_chain(self):
        from baseband_tasks_tpu.models.compiled import CompiledPipeline
        def make():
            sh = ConvertPolarization(noise(19, shape=(1 << 14, 2)),
                                     "circular")
            return Square(Channelize(sh, 16))
        tail = make()
        ref = np.asarray(tail.read())
        cp = CompiledPipeline(make())
        blocks = np.asarray(cp.read_source_blocks(
            (1 << 14) // cp.block_samples))
        got = np.asarray(cp.run_fn(blocks.shape[0])(blocks))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_validation(self):
        with pytest.raises(ValueError, match=r"\(2, 2\)"):
            ApplyJones(noise(1), np.eye(3, dtype=np.complex64))
        with pytest.raises(ValueError, match="broadcast"):
            ApplyJones(noise(1), np.zeros((7, 2, 2), np.complex64))
