"""Generate the frozen reference-layout HDF5 fixtures (run ONCE).

Round-4 verdict item 7: the reference package validates its HDF5
container against files astropy writes at test time; astropy is absent
here, so interop.py was validated only against files it wrote itself
*in the same process* — a bug present in both writer and reader would
round-trip invisibly.  This script freezes the on-disk contract: it
writes three small reference-layout files (astropy-yaml header tags;
raw complex64, structured-c4, and VDIF-bps-coded payloads) plus an
``.npz`` of the exact decoded expectation, to be checked into
``tests/data/``.  ``tests/test_hdf5_interop.py::TestGoldenFixtures``
then pins the reader against the frozen bytes and the writer's header
text and payload bytes against the same files — any future layout
drift breaks against bytes that do NOT regenerate.

    python tools/make_hdf5_golden.py
"""

import os

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data")


def template_and_data():
    from baseband_tasks_tpu import NoiseGenerator, SetAttribute
    from baseband_tasks_tpu.utils import Time, units as u

    sh = SetAttribute(
        NoiseGenerator(shape=(64, 4, 2),
                       start_time=Time("2018-05-06T12:13:14.5"),
                       sample_rate=u.Quantity(250, u.kHz),
                       samples_per_frame=64, seed=20260820,
                       dtype=np.complex64),
        frequency=u.Quantity([[311.25], [311.5], [311.75], [312.0]],
                             u.MHz),
        sideband=np.int8(1),
        polarization=np.array(["L", "R"]))
    data = (np.asarray(sh.read()) * 4).astype(np.complex64)
    sh.seek(0)
    return sh, data


def main():
    from baseband_tasks_tpu.io.hdf5.interop import ReferenceHDF5Writer

    os.makedirs(OUT, exist_ok=True)
    sh, data = template_and_data()
    variants = {
        "golden_ref_raw.h5": dict(),
        "golden_ref_c4.h5": dict(encoded_dtype="c4"),
        "golden_ref_bps4.h5": dict(bps=4),
    }
    expected = {}
    for name, kw in variants.items():
        path = os.path.join(OUT, name)
        with ReferenceHDF5Writer(path, sh, **kw) as fw:
            fw.write(data)
        # expectation = what the *writer's own encoding* loses (c4 ->
        # half precision, bps4 -> 16-level quantization), computed
        # independently of the reader under test
        if "encoded_dtype" in kw:
            exp = (data.real.astype(np.float16).astype(np.float32)
                   + 1j * data.imag.astype(np.float16).astype(np.float32))
        elif "bps" in kw:
            from baseband_tasks_tpu.io.vdif import (_decode_payload,
                                                    _encode_payload)
            comp = np.stack([data.real, data.imag], axis=-1).ravel()
            dec = _decode_payload(
                _encode_payload(comp.astype(np.float32), 4), 4,
                comp.size)
            exp = (dec[0::2] + 1j * dec[1::2]).reshape(data.shape)
        else:
            exp = data
        expected[name.split(".")[0]] = exp.astype(np.complex64)
        print(f"wrote {path} ({os.path.getsize(path)} bytes)")
    np.savez(os.path.join(OUT, "golden_ref_hdf5_expected.npz"),
             **expected)
    print("wrote expectations npz")


if __name__ == "__main__":
    main()
