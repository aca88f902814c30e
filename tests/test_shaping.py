import jax.numpy as jnp
import numpy as np
import pytest

from baseband_tasks_tpu import (Reshape, Transpose, ReshapeAndTranspose,
                                ChangeSampleShape, GetItem, GetSlice,
                                SetAttribute, StreamGenerator)
from baseband_tasks_tpu.utils import Time, units as u

START = Time("2018-01-01T00:00:00.000000000")


def counter(shape=(600, 8), spf=100):
    def f(sh):
        o = sh.tell()
        n = min(sh.samples_per_frame, sh.shape[0] - o)
        base = jnp.arange(o, o + n, dtype=jnp.float32)
        extra = jnp.arange(np.prod(sh.sample_shape), dtype=jnp.float32)
        return (base[:, None] * 1000
                + extra[None]).reshape((n,) + sh.sample_shape)
    return StreamGenerator(f, shape, START, 1 * u.kHz,
                           samples_per_frame=spf, dtype=np.float32)


def labeled(shape=(600, 8), spf=100):
    freq = np.repeat(np.array([400.0, 401.0, 402.0, 403.0]), 2) * u.MHz
    pol = np.tile(np.array(["X", "Y"]), 4)
    return SetAttribute(counter(shape, spf), frequency=freq, sideband=1,
                        polarization=pol)


class TestReshape:
    def test_reshape_and_attrs(self):
        sh = labeled()
        rs = Reshape(sh, (4, 2))
        assert rs.shape == (600, 4, 2)
        np.testing.assert_allclose(rs.frequency.to_value(u.MHz),
                                   [[400, 400], [401, 401], [402, 402],
                                    [403, 403]])
        assert rs.polarization.shape == (4, 2)
        assert list(rs.polarization[0]) == ["X", "Y"]
        data = np.asarray(rs.read(2))
        raw = np.asarray(counter().read(2))
        np.testing.assert_array_equal(data, raw.reshape(2, 4, 2))


class TestTranspose:
    def test_transpose(self):
        sh = labeled()
        t = Transpose(Reshape(sh, (4, 2)), (2, 1))
        assert t.shape == (600, 2, 4)
        data = np.asarray(t.read(1))
        raw = np.asarray(counter().read(1)).reshape(1, 4, 2)
        np.testing.assert_array_equal(data, raw.transpose(0, 2, 1))
        assert t.frequency.shape == (2, 4)
        np.testing.assert_allclose(t.frequency.to_value(u.MHz)[0],
                                   [400, 401, 402, 403])


class TestReshapeAndTranspose:
    def test_combined(self):
        sh = labeled()
        rt = ReshapeAndTranspose(sh, (4, 2), (2, 1))
        assert rt.shape == (600, 2, 4)


class TestChangeSampleShape:
    def test_custom_fn(self):
        sh = counter()
        cs = ChangeSampleShape(sh, lambda d: d[:, :4])
        assert cs.shape == (600, 4)

    def test_rejects_time_axis_change(self):
        sh = counter()
        with pytest.raises(ValueError):
            ChangeSampleShape(sh, lambda d: d.reshape(-1, 16))


class TestGetItem:
    def test_select_channels(self):
        sh = labeled()
        gi = GetItem(sh, [0, 2, 4])
        assert gi.shape == (600, 3)
        np.testing.assert_allclose(gi.frequency.to_value(u.MHz),
                                   [400, 401, 402])
        data = np.asarray(gi.read(3))
        raw = np.asarray(counter().read(3))
        np.testing.assert_array_equal(data, raw[:, [0, 2, 4]])

    def test_getitem_via_indexing(self):
        sh = labeled()
        gi = sh[:, 1]
        data = np.asarray(gi.read(4))
        raw = np.asarray(counter().read(4))
        np.testing.assert_array_equal(data, raw[:, 1])


class TestGetSlice:
    def test_int_slice(self):
        sh = counter()
        gs = sh[100:300]
        assert gs.shape == (200, 8)
        assert abs((gs.start_time - START).sec - 0.1) < 1e-12
        data = np.asarray(gs.read(5))
        raw = np.asarray(counter().read(105))
        np.testing.assert_array_equal(data, raw[100:105])

    def test_time_slice(self):
        sh = counter()
        t0 = START + 50 * u.ms
        gs = sh[t0:]
        assert gs.shape == (550, 8)
        assert abs((gs.start_time - t0).sec) < 1e-12

    def test_negative_indices(self):
        sh = counter()
        gs = sh[-100:]
        assert gs.shape == (100, 8)
        data = np.asarray(gs.read())
        np.testing.assert_allclose(data[0, 0], 500 * 1000)

    def test_tell_time(self):
        sh = counter()
        gs = sh[100:300]
        gs.seek(50)
        assert abs((gs.time - START).sec - 0.15) < 1e-12


class TestGetSliceClamping:
    def test_negative_start_clamps_like_python(self):
        def counter(sh):
            import jax.numpy as jnp
            o = sh.tell()
            n = min(sh.samples_per_frame, sh.shape[0] - o)
            return jnp.arange(o, o + n, dtype=jnp.float32)[:, None] \
                * jnp.ones((1, 2))
        sh = StreamGenerator(counter, (5, 2), START, 1 * u.kHz,
                             samples_per_frame=5, dtype=np.float32)
        sliced = sh[-12:]
        assert sliced.shape[0] == 5      # list[-12:] of a 5-list
        np.testing.assert_array_equal(
            np.asarray(sliced.read())[:, 0], np.arange(5))
        with pytest.raises(IndexError):
            sh[:-12]                      # empty slice


class TestScalarSampleValidation:
    """The construction-time dry-run must see the true frame shape, so
    shape ops on scalar-sample streams validate correctly (reference
    shaping.py:30-39 uses (7,) + sample_shape unconditionally)."""

    def _scalar_stream(self):
        def f(sh):
            n = min(sh.samples_per_frame, sh.shape[0] - sh.tell())
            return jnp.arange(n, dtype=jnp.float32)
        return StreamGenerator(f, (600,), START, 1 * u.kHz,
                               samples_per_frame=100, dtype=np.float32)

    def test_bad_op_fails_at_construction(self):
        # indexing a second axis of a 1-d frame must fail NOW, not on read
        with pytest.raises(ValueError, match="dummy"):
            ChangeSampleShape(self._scalar_stream(), lambda d: d[:, :1])

    def test_newaxis_op_constructs_and_reads(self):
        sh = ChangeSampleShape(self._scalar_stream(),
                               lambda d: d[:, np.newaxis])
        assert sh.sample_shape == (1,)
        out = np.asarray(sh.read(10))
        np.testing.assert_array_equal(out[:, 0], np.arange(10))


class TestTransposeNegativeAxes:
    def test_negative_axes_normalized(self):
        sh = counter(shape=(600, 4, 2))
        tr = Transpose(sh, (-1, -2))
        assert tr.sample_shape == (2, 4)
        direct = Transpose(counter(shape=(600, 4, 2)), (2, 1))
        np.testing.assert_array_equal(np.asarray(tr.read(5)),
                                      np.asarray(direct.read(5)))

    def test_negative_time_axis_rejected(self):
        sh = counter(shape=(600, 4, 2))
        with pytest.raises(ValueError, match="time axis"):
            Transpose(sh, (-3, 1))
        with pytest.raises(ValueError, match="time axis"):
            ReshapeAndTranspose(sh, (2, 4), (-3, 1))
