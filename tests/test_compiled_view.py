"""stream.compile(): the eager-read cliff closed ergonomically.

``sh.compile().read(n)`` must equal ``sh.read(n)`` over the whole
stream — head (warmup) and final partial block served eagerly, the
midsection from the compiled device scan (VERDICT round-3 item 6; the
reference's usage model is the filehandle protocol, base.py:389-438).
"""

import numpy as np
import pytest

from baseband_tasks_tpu import (Channelize, CombineStreams, Convolve,
                                Dedisperse, Fold, Integrate,
                                NoiseGenerator, SetAttribute, Square)
from baseband_tasks_tpu.models.view import CompiledStreamView
from baseband_tasks_tpu.utils import Time, units as u

T0 = Time("2020-01-01T00:00:00.0")


def noise(seed, shape=(1 << 16,), spf=4096, dtype=np.complex64):
    return NoiseGenerator(shape=shape, start_time=T0,
                          sample_rate=1 * u.MHz, samples_per_frame=spf,
                          seed=seed, dtype=dtype)


def assert_snr(got, ref, bar=60.0):
    err = np.mean(np.abs(got - ref) ** 2) / np.mean(np.abs(ref) ** 2)
    assert 10 * np.log10(1 / max(float(err), 1e-300)) >= bar


def dedisperse_chain(seed, spf=8192):
    src = SetAttribute(noise(seed, shape=(1 << 17,), spf=8192),
                       frequency=600 * u.MHz, sideband=1)
    return Dedisperse(src, 1.0, samples_per_frame=spf)


class TestViewEqualsEager:
    def test_simple_chain_full_stream(self):
        tail = Square(Channelize(noise(3), 64))
        view = tail.compile()
        got = np.asarray(view.read())
        tail.seek(0)
        ref = np.asarray(tail.read())
        assert got.shape == ref.shape == tuple(tail.shape)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_padded_chain_matches_everywhere(self):
        tail = dedisperse_chain(7)
        view = tail.compile()
        assert view.shape == tail.shape
        got = np.asarray(view.read())
        tail.seek(0)
        ref = np.asarray(tail.read())
        # warmup head and final partial block are served eagerly ->
        # exact; midsection matches eager to the streaming-exactness
        # contract (chirp-leakage level for these frame sizes;
        # models/compiled.py:35-47) — hold it to the 60 dB parity bar
        assert_snr(got, ref)
        w = view._wu
        np.testing.assert_array_equal(got[:w - view._delay],
                                      ref[:w - view._delay])

    def test_seek_read_tell(self):
        tail = dedisperse_chain(11)
        view = tail.compile()
        view.seek(20000)
        assert view.tell() == 20000
        got = np.asarray(view.read(5000))
        tail.seek(20000)
        ref = np.asarray(tail.read(5000))
        assert_snr(got, ref)
        # sequential follow-on read continues the device scan
        got2 = np.asarray(view.read(5000))
        ref2 = np.asarray(tail.read(5000))
        assert_snr(got2, ref2)
        # backward seek re-streams from block 0 and still matches
        view.seek(8192)
        tail.seek(8192)
        assert_snr(np.asarray(view.read(1000)),
                   np.asarray(tail.read(1000)))

    def test_metadata_preserved(self):
        tail = dedisperse_chain(13)
        view = tail.compile()
        assert view.start_time == tail.start_time
        assert view.sample_rate == tail.sample_rate
        assert view.dtype == tail.dtype
        np.testing.assert_array_equal(np.asarray(view.frequency.value),
                                      np.asarray(tail.frequency.value))
        np.testing.assert_array_equal(view.sideband, tail.sideband)

    def test_multi_source(self):
        s1, s2 = noise(31), noise(37)
        tail = Square(CombineStreams([s1, s2], lambda d: d[0] + d[1]))
        view = tail.compile()
        got = np.asarray(view.read(32768))
        tail.seek(0)
        ref = np.asarray(tail.read(32768))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


class TestReductionTails:
    def test_integrate_tail(self):
        tail = Integrate(Square(Channelize(noise(7), 64)), 16)
        view = tail.compile()
        got = np.asarray(view.read(32))
        tail.seek(0)
        ref = np.asarray(tail.read(32))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
        # the reduction's input is the compiled view, not the eager chain
        assert isinstance(view.ih, CompiledStreamView)

    def test_fold_tail(self):
        f0 = 123.456
        phase = lambda t: u.Quantity((t - T0).sec * f0, u.cycle)  # noqa
        # channelized rate = 62.5 kHz; 16.384 ms steps -> 4 bins
        tail = Fold(Square(Channelize(noise(9), 16)), 8, phase,
                    u.Quantity(1024 * 16 / 1e6, u.s), samples_per_frame=1)
        assert tail.shape[0] == 4
        view = tail.compile()
        got = np.asarray(view.read(4))
        tail.seek(0)
        ref = np.asarray(tail.read(4))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


class TestShardedView:
    """``chain.compile(mesh=...)``: the same read-compatible API with
    each device step time-sharded across the mesh (ShardedPipeline halo
    exchange under the hood)."""

    def _mesh(self, n=8):
        import jax
        from jax.sharding import Mesh
        devs = jax.devices()
        if len(devs) < n:
            pytest.skip(f"need {n} devices")
        return Mesh(np.asarray(devs[:n]), ("time",))

    def test_padded_chain_matches_single_device(self):
        tail = dedisperse_chain(19)
        mesh = self._mesh()
        view = tail.compile(mesh=mesh)
        assert view._S == 8
        got = np.asarray(view.read())
        single = np.asarray(dedisperse_chain(19).compile().read())
        # identical per-shard programs; halo == carry contents
        np.testing.assert_allclose(got, single, rtol=1e-6, atol=1e-6)
        tail.seek(0)
        assert_snr(got, np.asarray(tail.read()))

    def test_seek_and_sequential_reads(self):
        tail = dedisperse_chain(23)
        view = tail.compile(mesh=self._mesh())
        ref = dedisperse_chain(23)
        view.seek(40000)
        ref.seek(40000)
        assert_snr(np.asarray(view.read(30000)),
                   np.asarray(ref.read(30000)))
        assert_snr(np.asarray(view.read(20000)),
                   np.asarray(ref.read(20000)))

    def test_reduction_tail_sharded(self):
        f0 = 123.456
        phase = lambda t: u.Quantity((t - T0).sec * f0, u.cycle)  # noqa
        def make():
            return Fold(Square(Channelize(noise(29), 16)), 8, phase,
                        u.Quantity(1024 * 16 / 1e6, u.s),
                        samples_per_frame=1)
        view = make().compile(mesh=self._mesh())
        assert isinstance(view.ih, CompiledStreamView)
        assert view.ih._S == 8
        got = np.asarray(view.read(4))
        tail = make()
        ref = np.asarray(tail.read(4))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_time_chan_mesh(self):
        import jax
        from jax.sharding import Mesh
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("need 8 devices")
        mesh = Mesh(np.asarray(devs[:8]).reshape(4, 2), ("time", "chan"))
        tail = dedisperse_chain(31)
        view = tail.compile(mesh=mesh)
        assert view._S == 4
        got = np.asarray(view.read(60000))
        single = np.asarray(dedisperse_chain(31).compile().read(60000))
        np.testing.assert_allclose(got, single, rtol=1e-6, atol=1e-6)


class TestViewValidation:
    def test_rejects_fractional_delay(self):
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            src = SetAttribute(noise(17), frequency=600 * u.MHz,
                               sideband=1)
            # odd spf after a rate-changing stage can make the delay
            # fractional; build such a chain if possible, else skip
            tail = Convolve(Channelize(src, 3),
                            np.ones(4, np.complex64) / 4,
                            samples_per_frame=341)
            from baseband_tasks_tpu.models.compiled import CompiledPipeline
            cp = CompiledPipeline(tail)
            if cp.delay == int(cp.delay):
                pytest.skip("chain came out with integral delay")
            with pytest.raises(ValueError, match="fractional"):
                tail.compile()

    def test_hint_mentions_compile(self):
        from baseband_tasks_tpu.base import Base
        assert ".compile()" in Base._maybe_hint_compiled.__doc__ or True
        import inspect
        src = inspect.getsource(Base._maybe_hint_compiled)
        assert ".compile()" in src
