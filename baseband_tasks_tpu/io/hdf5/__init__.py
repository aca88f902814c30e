"""HDF5 stream container: write any stream with full metadata, reopen it
as an identical stream head.

Counterpart of `/root/reference/baseband_tasks/io/hdf5/` (stream
reader/writer base.py:10-222, yaml header header.py:67-129, payload
encodings payload.py:19-178): one HDF5 file holds a yaml-encoded
``header`` dataset plus a ``payload`` dataset.  Payloads are stored raw
(any numpy dtype), as half-precision complex ('c4': float16 pairs), or
bit-encoded at 2/4/8 bits per (real) component with VDIF-style level
conventions.

This doubles as the framework's checkpoint/resume format (SURVEY.md §5):
streams are seekable by absolute time, so processing can resume at any
timestamp from an intermediate product.

Two on-disk flavours are supported:

- the **native** flavour (default for writing): plain-scalar header keys
  (``shape``/``sample_rate_hz``/``start_time_jd1,jd2``), trailing
  float16-pair 'c4' samples, byte-packed bps payloads, per-range
  ``invalid`` markers;
- the **reference** flavour (``/root/reference/baseband_tasks/io/hdf5/``):
  astropy-yaml header tags, structured-c4 payloads and VDIF-word-coded
  bps payloads, implemented without astropy in
  :mod:`~baseband_tasks_tpu.io.hdf5.interop`.

``open(name, 'r')`` auto-detects the flavour, so files written by the
reference package read here unchanged; ``open(name, 'w',
style='reference', template=...)`` writes files the reference package can
read back.
"""

from __future__ import annotations

import numpy as np
import yaml

from ...base import Base
from ...utils import Time, units as u

__all__ = ["open", "HDF5StreamReader", "HDF5StreamWriter", "DTYPE_C4"]

# Public name for the half-precision complex storage dtype (two float16
# planes per sample; reference io/hdf5/payload.py:19 'c4').  Our payload
# stores the trailing-pair layout; this dtype describes one stored sample.
import numpy as _np
DTYPE_C4 = _np.dtype([("r", "<f2"), ("i", "<f2")])

#: VDIF 2-bit decoding levels (offset-binary 0..3).
_TWO_BIT_LEVELS = np.array([-3.3359, -1.0, 1.0, 3.3359], dtype=np.float32)


def _require_h5py():
    try:
        import h5py
        return h5py
    except ImportError as exc:  # pragma: no cover
        raise ImportError("HDF5 I/O requires the h5py package") from exc


# -- header ---------------------------------------------------------------

def _header_from_stream(template, **overrides):
    attrs = getattr(template, "meta", {}).get("__attributes__", {})
    hdr = {
        "shape": list(template.shape),
        "sample_rate_hz": float(template.sample_rate.to_value(u.Hz)),
        "start_time_jd1": float(template.start_time.jd1),
        "start_time_jd2": float(template.start_time.jd2),
        "dtype": np.dtype(template.dtype).str,
        "samples_per_frame": int(getattr(template, "samples_per_frame",
                                         1024)),
    }
    for name in ("frequency", "sideband", "polarization"):
        value = overrides.get(name, attrs.get(name))
        if value is None:
            continue
        if isinstance(value, u.Quantity):
            hdr[name] = {"value": np.asarray(value.to_value(u.Hz)).tolist(),
                         "unit": "Hz"}
        else:
            hdr[name] = np.asarray(value).tolist()
    return hdr


def _attrs_from_header(hdr):
    out = {}
    freq = hdr.get("frequency")
    if freq is not None:
        out["frequency"] = u.Quantity(np.asarray(freq["value"]), u.Hz)
    if hdr.get("sideband") is not None:
        out["sideband"] = np.asarray(hdr["sideband"])
    if hdr.get("polarization") is not None:
        out["polarization"] = np.asarray(hdr["polarization"])
    # streams require frequency and sideband as a pair; files written
    # before that invariant (or by other tools) may carry only one —
    # default the sideband to upper, and drop an unpaired sideband
    if "frequency" in out and "sideband" not in out:
        out["sideband"] = np.int8(1)
    elif "sideband" in out and "frequency" not in out:
        del out["sideband"]
    return out


# -- payload coding -------------------------------------------------------

def _encode(data, encoding, bps):
    """Encode a float/complex array for storage."""
    if encoding == "raw":
        return data
    if encoding == "c4":
        pair = np.stack([data.real, data.imag], axis=-1)
        return pair.astype(np.float16)
    if encoding == "bps":
        if data.dtype.kind == "c":
            comp = np.stack([data.real, data.imag], axis=-1)
        else:
            comp = data
        if bps == 8:
            # offset binary in [-127.5, 127.5]
            return np.clip(np.round(comp + 0.5) + 127, 0, 255
                           ).astype(np.uint8).reshape(-1)
        if bps == 4:
            vals = np.clip(np.round(comp + 0.5) + 7, 0, 15).astype(np.uint8)
            flat = vals.reshape(-1)
            if flat.size % 2:
                flat = np.concatenate([flat, np.zeros(1, np.uint8)])
            return (flat[0::2] | (flat[1::2] << 4))
        if bps == 2:
            # thresholds for unit-variance data (optimal 2-bit Gaussian)
            idx = np.digitize(comp, [-0.9816, 0.0, 0.9816]).astype(np.uint8)
            flat = idx.reshape(-1)
            pad = (-flat.size) % 4
            if pad:
                flat = np.concatenate([flat, np.zeros(pad, np.uint8)])
            return (flat[0::4] | (flat[1::4] << 2) | (flat[2::4] << 4)
                    | (flat[3::4] << 6))
        raise ValueError(f"unsupported bps {bps}")
    raise ValueError(f"unknown encoding {encoding!r}")


def _decode(raw, encoding, bps, dtype, comp_shape):
    """Decode stored payload back to ``dtype`` with shape comp_shape."""
    if encoding == "raw":
        return np.asarray(raw)
    if encoding == "c4":
        pair = np.asarray(raw, dtype=np.float32)
        return (pair[..., 0] + 1j * pair[..., 1]).astype(dtype)
    complex_data = np.dtype(dtype).kind == "c"
    n_comp = int(np.prod(comp_shape)) * (2 if complex_data else 1)
    # native LUT decoder (C) with numpy fallback inside
    from ... import native
    if bps == 8:
        comp = native.unpack_8bit(raw)[:n_comp]
    elif bps == 4:
        comp = native.unpack_4bit(raw)[:n_comp]
    elif bps == 2:
        # reconstruction levels: conditional means for unit-variance data
        comp = native.unpack_2bit(raw, _TWO_BIT_LEVELS * 0.4528)[:n_comp]
    else:
        raise ValueError(f"unsupported bps {bps}")
    if complex_data:
        comp = comp.reshape(comp_shape + (2,))
        return (comp[..., 0] + 1j * comp[..., 1]).astype(dtype)
    return comp.reshape(comp_shape).astype(dtype)


# -- reader ---------------------------------------------------------------

class HDF5StreamReader(Base):
    """Stream head reading frames from an HDF5 container file."""

    def __init__(self, name, samples_per_frame=None):
        h5py = _require_h5py()
        self._h5 = h5py.File(name, "r")
        raw_header = self._h5["header"][()]
        if isinstance(raw_header, bytes):
            raw_header = raw_header.decode()
        from . import interop
        if interop.is_reference_header(raw_header):
            self._init_reference(interop, samples_per_frame)
            return
        self._reference = None
        hdr = yaml.safe_load(raw_header)
        self._hdr = hdr
        self._encoding = hdr.get("encoding", "raw")
        self._bps = hdr.get("bps")
        self._invalid = [tuple(r) for r in hdr.get("invalid", [])]
        dtype = np.dtype(hdr["dtype"])
        shape = tuple(hdr["shape"])
        spf = samples_per_frame or hdr.get("samples_per_frame", 1024)
        if self._encoding == "bps":
            # frames must start on byte boundaries of the packed payload
            import math
            cps = int(np.prod(shape[1:])) * (2 if dtype.kind == "c" else 1)
            group = (8 // hdr["bps"]) // math.gcd(cps, 8 // hdr["bps"])
            spf = -(-spf // group) * group
        super().__init__(
            shape=shape,
            start_time=Time(hdr["start_time_jd1"], hdr["start_time_jd2"]),
            sample_rate=u.Quantity(hdr["sample_rate_hz"], u.Hz),
            samples_per_frame=min(spf, shape[0]), dtype=dtype,
            **_attrs_from_header(hdr))

    def _init_reference(self, interop, samples_per_frame):
        """Initialize from a reference-package file (astropy-yaml header;
        see :mod:`~baseband_tasks_tpu.io.hdf5.interop`)."""
        ref = interop.ReferenceHDF5Reader(self._h5)
        self._reference = ref
        self._hdr = ref.header
        self._encoding = "bps" if ref.bps is not None else (
            "c4" if ref.encoded_dtype.names else "raw")
        self._bps = ref.bps
        self._invalid = []
        spf = samples_per_frame or min(ref.shape[0], 1 << 20)
        if ref.bps is not None:
            # keep frame boundaries word-aligned in the coded payload
            import math
            cps = int(np.prod(ref.sample_shape)) \
                * (2 if ref.complex_data else 1)
            group = (32 // ref.bps) // math.gcd(cps, 32 // ref.bps)
            spf = max(-(-spf // group) * group, group)
        super().__init__(
            shape=ref.shape, start_time=ref.start_time,
            sample_rate=ref.sample_rate,
            samples_per_frame=min(spf, ref.shape[0]), dtype=ref.dtype,
            **ref.attributes)

    @property
    def bps(self):
        return self._bps

    @property
    def encoding(self):
        return self._encoding

    @property
    def valid(self):
        """False if any sample range was marked invalid on write (the
        reference's frame ``valid`` flag, io/hdf5/frame.py:51-59,
        generalized to per-range validity)."""
        return not self._invalid

    @property
    def invalid_ranges(self):
        """List of [start, stop) sample ranges read back as zeros."""
        return [tuple(r) for r in self._invalid]

    def _zero_invalid(self, out, start, stop):
        if not self._invalid:
            return out
        out = np.array(out)  # writable host copy
        for a, b in self._invalid:
            lo, hi = max(a, start), min(b, stop)
            if lo < hi:
                out[lo - start:hi - start] = 0
        return out

    # -- packed ingest ----------------------------------------------------
    # The reference's whole reason for bps-encoded HDF5 payloads is that
    # decode belongs inside the pipeline (reference io/hdf5/payload.py:
    # 164-178); here the raw packed bytes cross the host->device boundary
    # as float32 carriers and decode inside the compiled step
    # (ops/unpack_device.py), like the VDIF/DADA/GUPPI/Mark5B readers.

    def _packed_coding(self):
        if self._reference is not None:
            raise ValueError(
                "packed reads of reference-layout HDF5 files are not "
                "supported (their payloads use VDIF word coding); "
                "re-write with the native writer for packed ingest")
        if self._encoding != "bps":
            raise ValueError(
                f"packed reads need a bit-packed payload; this file is "
                f"{self._encoding!r}")
        cps = int(np.prod(self.sample_shape)) \
            * (2 if self.complex_data else 1)
        return cps, self._bps

    @property
    def packed_alignment(self):
        """Samples per packed unit: packed reads must start and end on
        32-bit carrier-word boundaries of the coded payload."""
        import math
        cps, bps = self._packed_coding()
        return 32 // math.gcd(cps * bps, 32)

    def read_packed(self, offset, count):
        """Raw coded payload for samples [offset, offset+count) as a
        float32 bit-carrier pytree.

        Returns ``(carrier,)`` — or ``(carrier, mask)`` with a per-sample
        (count,) float32 validity plane when the file has invalid ranges
        (decoded samples are zero there, exactly like the host path)."""
        align = self.packed_alignment
        if offset % align or count % align:
            raise ValueError(
                f"packed reads must be carrier-word aligned: offset "
                f"{offset} and count {count} must be multiples of "
                f"{align}")
        cps, bps = self._packed_coding()
        from ...ops.unpack_device import pack_bytes_to_f32
        b0 = offset * cps * bps // 8
        b1 = (offset + count) * cps * bps // 8
        carrier = pack_bytes_to_f32(self._h5["payload"][b0:b1])
        if not self._invalid:
            return (carrier,)
        mask = np.ones(count, np.float32)
        for a, b in self._invalid:
            lo, hi = max(a, offset), min(b, offset + count)
            if lo < hi:
                mask[lo - offset:hi - offset] = 0.0
        return carrier, mask

    def packed_decode_fn(self):
        """Jittable ``decode(packed) -> samples``, the device counterpart
        of :meth:`_read_frame`'s host LUT decode, bit-exact against it
        (tests/test_packed_ingest.py::TestHDF5Packed)."""
        from ...ops import unpack_device as ud

        cps, bps = self._packed_coding()
        if bps == 8:
            unpack = ud.unpack_8bit_device
        elif bps == 4:
            unpack = ud.unpack_4bit_device
        elif bps == 2:
            levels = _TWO_BIT_LEVELS * np.float32(0.4528)

            def unpack(x):
                return ud.unpack_2bit_device(x, levels)
        else:
            raise ValueError(f"unsupported bits-per-sample {bps}")
        cplx = self.complex_data
        sshape = self.sample_shape
        scale = self._hdr.get("scale")
        has_mask = bool(self._invalid)

        def decode(packed):
            import jax
            import jax.numpy as jnp

            comp = unpack(packed[0])
            n = comp.shape[0] // cps
            if cplx:
                pair = comp.reshape((n,) + sshape + (2,))
                x = jax.lax.complex(pair[..., 0], pair[..., 1])
            else:
                x = comp.reshape((n,) + sshape)
            if scale:
                x = x / jnp.float32(scale)
            if has_mask:
                mask = packed[1].reshape((n,) + (1,) * len(sshape))
                x = x * mask
            return x

        return decode

    def _read_frame(self, frame_index):
        spf = self._samples_per_frame
        start = frame_index * spf
        stop = min(start + spf, self._shape[0])
        if self._reference is not None:
            return self._reference.read_range(start, stop)
        if self._encoding in ("raw", "c4"):
            raw = self._h5["payload"][start:stop]
            out = _decode(raw, self._encoding, self._bps, self._dtype,
                          (stop - start,) + self.sample_shape)
            return self._zero_invalid(out, start, stop)
        # bit-packed: payload is a flat byte array over components
        comp_per_sample = int(np.prod(self.sample_shape)) \
            * (2 if self.complex_data else 1)
        comp_per_byte = 8 // self._bps
        b0 = start * comp_per_sample // comp_per_byte
        b1 = -(-(stop * comp_per_sample) // comp_per_byte)
        raw = self._h5["payload"][b0:b1]
        out = _decode(raw, "bps", self._bps, self._dtype,
                      (stop - start,) + self.sample_shape)
        scale = self._hdr.get("scale")
        if scale:
            out = (out / scale).astype(self._dtype)
        return self._zero_invalid(out, start, stop)

    def close(self):
        super().close()
        if getattr(self, "_h5", None) is not None:
            self._h5.close()
            self._h5 = None


# -- writer ---------------------------------------------------------------

class HDF5StreamWriter:
    """Stream writer: sequential ``write(data)`` into an HDF5 container."""

    def __init__(self, name, template=None, encoding="raw", bps=None,
                 **overrides):
        h5py = _require_h5py()
        if template is None:
            raise ValueError("writing requires a template stream (for "
                            "shape/rate/time metadata)")
        hdr = _header_from_stream(template, **overrides)
        if bps is not None and encoding == "raw":
            encoding = "bps"
        hdr["encoding"] = encoding
        if bps is not None:
            hdr["bps"] = int(bps)
        self._hdr = hdr
        self._encoding = encoding
        self._bps = bps
        self._scale = None
        self._dtype = np.dtype(hdr["dtype"])
        self._shape = tuple(hdr["shape"])
        self._h5 = h5py.File(name, "w")
        n = self._shape[0]
        sample_shape = self._shape[1:]
        if encoding == "raw":
            self._h5.create_dataset("payload", shape=self._shape,
                                    dtype=self._dtype)
        elif encoding == "c4":
            self._h5.create_dataset("payload",
                                    shape=self._shape + (2,),
                                    dtype=np.float16)
        else:
            complex_data = self._dtype.kind == "c"
            n_comp = n * int(np.prod(sample_shape)) \
                * (2 if complex_data else 1)
            n_bytes = -(-n_comp * bps // 8)
            self._h5.create_dataset("payload", shape=(n_bytes,),
                                    dtype=np.uint8)
        self._offset = 0
        self._closed = False

    @property
    def shape(self):
        return self._shape

    def write(self, data, valid=True):
        """Append samples; ``valid=False`` stores the data but marks the
        range invalid, so readers get zeros there (reference frame
        ``valid`` flag, per-range)."""
        data = np.asarray(data)
        n = len(data)
        if self._offset + n > self._shape[0]:
            raise EOFError("writing beyond end of declared stream shape")
        start, stop = self._offset, self._offset + n
        if not valid:
            self._hdr.setdefault("invalid", []).append([int(start),
                                                        int(stop)])
        if self._encoding in ("raw", "c4"):
            self._h5["payload"][start:stop] = _encode(
                data.astype(self._dtype), self._encoding, self._bps)
        else:
            if self._scale is None:
                # choose a quantization scale from the first block so the
                # data RMS sits at the optimal level for this bit depth
                # (VDIF-style; 2-bit levels are fixed at ~1 sigma)
                comp = np.concatenate([data.real.ravel(), data.imag.ravel()]
                                      ) if self._dtype.kind == "c" \
                    else data.ravel()
                sigma = float(np.std(comp)) or 1.0
                target = {8: 32.0, 4: 2.5, 2: 1.0}[self._bps]
                self._scale = target / sigma
                self._hdr["scale"] = self._scale
            comp_per_sample = int(np.prod(self._shape[1:])) \
                * (2 if self._dtype.kind == "c" else 1)
            if (start * comp_per_sample) % (8 // self._bps):
                raise ValueError("bit-packed writes must stay byte-aligned; "
                                 "use write sizes that keep alignment")
            raw = _encode(data.astype(self._dtype) * self._scale, "bps",
                          self._bps)
            b0 = start * comp_per_sample * self._bps // 8
            self._h5["payload"][b0:b0 + len(raw)] = raw
        self._offset = stop

    def tell(self):
        return self._offset

    def close(self):
        if not self._closed:
            self._h5["header"] = yaml.safe_dump(self._hdr).encode()
            self._h5.close()
            self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()


def open(name, mode="r", style="native", **kwargs):
    """Open an HDF5 stream file for reading ('r') or writing ('w').

    Reading auto-detects the on-disk flavour (native vs the reference
    package's astropy-yaml layout).  Writing requires ``template=stream``
    plus optional ``encoding`` ('raw'/'c4') or ``bps`` (2/4/8) and
    attribute overrides (reference io/hdf5/base.py:129-222);
    ``style='reference'`` writes the reference package's exact layout
    (accepting ``encoded_dtype='c4'`` in place of ``encoding='c4'``).
    """
    if mode == "r":
        return HDF5StreamReader(name, **kwargs)
    if mode == "w":
        if style == "reference":
            from .interop import ReferenceHDF5Writer
            if kwargs.get("encoding") == "c4":
                kwargs.pop("encoding")
                kwargs["encoded_dtype"] = "c4"
            kwargs.pop("encoding", None)
            template = kwargs.pop("template")
            return ReferenceHDF5Writer(name, template, **kwargs)
        return HDF5StreamWriter(name, **kwargs)
    raise ValueError(f"unknown mode {mode!r}")
