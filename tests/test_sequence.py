"""Multi-file sequences: splice reading, splitting writes, name templates.

Reference analogue: ``baseband.helpers.sequentialfile`` and
``baseband.open(list_of_files)`` (the reference consumes multi-file
observations through its baseband dependency)."""

import numpy as np
import pytest

from baseband_tasks_tpu import NoiseGenerator, registry
from baseband_tasks_tpu.io import dada, sequence
from baseband_tasks_tpu.utils import Time, units as u

T0 = Time("2020-01-01T00:00:00.0")
RATE = u.Quantity(100, u.kHz)


def noise(n=10000, seed=7):
    return NoiseGenerator(shape=(n, 2), start_time=T0, sample_rate=RATE,
                          samples_per_frame=1000, seed=seed,
                          dtype=np.complex64)


@pytest.fixture
def dada_set(tmp_path):
    """Three contiguous DADA files written through the sequence writer."""
    src = noise()
    src.seek(0)
    data = np.asarray(src.read(10000))
    names = [str(tmp_path / f"scan_{i:04d}.dada") for i in range(3)]
    with sequence.open(names, "w", template=src, samples_per_file=4096,
                       format="dada") as wh:
        wh.write(data[:3000])      # split across calls on purpose
        wh.write(data[3000:])
    return names, data


class TestFileNameSequencer:
    def test_template(self):
        fns = sequence.FileNameSequencer("x_{file_nr:03d}.raw")
        assert fns[0] == "x_000.raw"
        assert fns[12] == "x_012.raw"

    def test_values(self):
        fns = sequence.FileNameSequencer(
            "{obs}_{file_nr}.dada", {"obs": "B1937"})
        assert fns[2] == "B1937_2.dada"

    def test_len_and_negative(self, tmp_path):
        for i in range(3):
            (tmp_path / f"f{i}.dat").write_bytes(b"x")
        fns = sequence.FileNameSequencer(str(tmp_path / "f{file_nr}.dat"))
        assert len(fns) == 3
        assert fns[-1] == str(tmp_path / "f2.dat")

    def test_requires_field(self):
        with pytest.raises(ValueError, match="file_nr"):
            sequence.FileNameSequencer("fixed_name.raw")


class TestSequenceRoundTrip:
    def test_file_layout(self, dada_set):
        names, data = dada_set
        sizes = [dada.open(n) for n in names]
        assert [s.shape[0] for s in sizes] == [4096, 4096, 1808]
        # each file is internally consistent: its header start time
        # matches its position in the stream
        for i, s in enumerate(sizes):
            expected = T0 + u.Quantity(4096 * i / RATE.to_value(u.Hz), u.s)
            assert abs((s.start_time - expected).sec) < 1e-9
            s.close()

    def test_read_as_one_stream(self, dada_set):
        names, data = dada_set
        with registry.open(names) as rh:
            assert isinstance(rh, sequence.SequentialStreamReader)
            assert rh.shape == (10000, 2)
            assert abs((rh.start_time - T0).sec) < 1e-9
            out = np.asarray(rh.read(10000))
        np.testing.assert_allclose(out, data, rtol=1e-6, atol=1e-6)

    def test_glob_and_template(self, dada_set, tmp_path):
        names, data = dada_set
        with registry.open(str(tmp_path / "scan_*.dada")) as rh:
            assert rh.files == names
        with registry.open(str(tmp_path / "scan_{file_nr:04d}.dada")) as rh:
            assert rh.shape[0] == 10000

    def test_seek_across_boundary(self, dada_set):
        names, data = dada_set
        rh = registry.open(names, samples_per_frame=1700)
        rh.seek(4000)  # frame [3400, 5100) spans files 0/1
        np.testing.assert_allclose(np.asarray(rh.read(500)),
                                   data[4000:4500], rtol=1e-6, atol=1e-6)
        # time-based seek works through the splice
        rh.seek(T0 + u.Quantity(0.09, u.s))
        assert rh.tell() == 9000
        np.testing.assert_allclose(np.asarray(rh.read(1000)),
                                   data[9000:], rtol=1e-6, atol=1e-6)
        rh.close()

    def test_task_on_sequence(self, dada_set):
        from baseband_tasks_tpu import Square
        names, data = dada_set
        rh = registry.open(names)
        sq = Square(rh)
        out = np.asarray(sq.read(100))
        np.testing.assert_allclose(out, np.abs(data[:100]) ** 2,
                                   rtol=1e-5, atol=1e-5)
        rh.close()

    def test_explicit_format_kwarg(self, dada_set):
        names, _ = dada_set
        rh = registry.open(names, format="dada")
        assert rh.shape == (10000, 2)
        rh.close()


class TestSequenceValidation:
    def test_gap_rejected(self, tmp_path):
        src = noise(4000)
        src.seek(0)
        a = str(tmp_path / "a.dada")
        with dada.open(a, "w", template=src) as wh:
            wh.write(np.asarray(src.read(2000)))
        # second file starts 1 s late
        late = NoiseGenerator(shape=(2000, 2),
                              start_time=T0 + u.Quantity(1.0, u.s),
                              sample_rate=RATE, samples_per_frame=1000,
                              seed=1, dtype=np.complex64)
        b = str(tmp_path / "b.dada")
        with dada.open(b, "w", template=late) as wh:
            wh.write(np.asarray(late.read(2000)))
        with pytest.raises(ValueError, match="contiguous"):
            sequence.open([a, b])

    def test_shape_mismatch_rejected(self, tmp_path):
        src = noise(2000)
        src.seek(0)
        a = str(tmp_path / "a.dada")
        with dada.open(a, "w", template=src) as wh:
            wh.write(np.asarray(src.read(2000)))
        other = NoiseGenerator(shape=(2000, 4),
                               start_time=src.stop_time, sample_rate=RATE,
                               samples_per_frame=1000, seed=1,
                               dtype=np.complex64)
        b = str(tmp_path / "b.dada")
        with dada.open(b, "w", template=other) as wh:
            wh.write(np.asarray(other.read(2000)))
        with pytest.raises(ValueError, match="sample shape"):
            sequence.open([a, b])

    def test_out_of_names(self, tmp_path):
        src = noise(4000)
        names = [str(tmp_path / "only.dada")]
        wh = sequence.open(names, "w", template=src,
                           samples_per_file=1000, format="dada")
        src.seek(0)
        with pytest.raises(EOFError, match="out of file names"):
            wh.write(np.asarray(src.read(2500)))
        wh.close()

    def test_writer_needs_format(self, tmp_path):
        src = noise(100)
        with pytest.raises(ValueError, match="format"):
            sequence.open([str(tmp_path / "x.dada")], "w", template=src,
                          samples_per_file=100)


class TestVDIFSequence:
    def test_vdif_list(self, tmp_path):
        src = noise(8000, seed=5)
        src.seek(0)
        # scale to digitizer counts: VDIF 8-bit stores a half-integer
        # grid, so unit-variance data must be amplified before encoding
        # (x16: +-8 sigma headroom against the int8 clip)
        data = np.asarray(src.read(8000)) * 16.0
        names = [str(tmp_path / f"v{i}.vdif") for i in range(2)]
        # frame size divides the per-file length so no padding happens
        with sequence.open(names, "w", template=src,
                           samples_per_file=4000, format="vdif",
                           samples_per_frame=500) as wh:
            wh.write(data)
        # files are shorter than 1 s, so the VDIF readers need the rate;
        # per-file opener kwargs pass through the sequence layer
        with registry.open(names, sample_rate=RATE) as rh:
            assert isinstance(rh, sequence.SequentialStreamReader)
            assert rh.shape[0] == 8000
            out = np.asarray(rh.read(8000))
        # 8-bit VDIF quantization: ≤0.5 per component
        assert np.abs(out - data).max() <= 0.5 * np.sqrt(2) + 1e-6
