"""Native (C) runtime helpers: fast payload bit-unpacking.

The shared library is compiled on first use with the system compiler
(``cc -O3``); numpy fallbacks keep everything working when no compiler is
available.  Use :func:`unpack` / :func:`available`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "unpack_2bit", "unpack_4bit", "unpack_8bit",
           "pack_2bit"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "unpack.c")
_LIB_PATH = os.path.join(_HERE, "_unpack.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH) or \
                    os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            fp = ctypes.POINTER(ctypes.c_float)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.unpack_2bit.argtypes = [u8p, ctypes.c_size_t, fp, fp]
            lib.unpack_4bit.argtypes = [u8p, ctypes.c_size_t,
                                        ctypes.c_float, fp]
            lib.unpack_8bit.argtypes = [u8p, ctypes.c_size_t,
                                        ctypes.c_float, fp]
            lib.pack_2bit.argtypes = [fp, ctypes.c_size_t, fp, u8p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available():
    """True when the native library is (or can be) loaded."""
    return _load() is not None


def _as_u8(raw):
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    return raw, raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def unpack_2bit(raw, levels):
    """Expand bytes to 4 floats each via a 4-level table."""
    lib = _load()
    levels = np.ascontiguousarray(levels, dtype=np.float32)
    if lib is None:
        vals = np.empty(np.size(raw) * 4, np.uint8)
        raw = np.asarray(raw, dtype=np.uint8)
        vals[0::4] = raw & 0x3
        vals[1::4] = (raw >> 2) & 0x3
        vals[2::4] = (raw >> 4) & 0x3
        vals[3::4] = raw >> 6
        return levels[vals]
    raw, rp = _as_u8(raw)
    out = np.empty(raw.size * 4, np.float32)
    lib.unpack_2bit(rp, raw.size,
                    levels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def unpack_4bit(raw, offset=7.5):
    lib = _load()
    if lib is None:
        raw = np.asarray(raw, dtype=np.uint8)
        vals = np.empty(raw.size * 2, np.uint8)
        vals[0::2] = raw & 0xF
        vals[1::2] = raw >> 4
        return vals.astype(np.float32) - np.float32(offset)
    raw, rp = _as_u8(raw)
    out = np.empty(raw.size * 2, np.float32)
    lib.unpack_4bit(rp, raw.size, ctypes.c_float(offset),
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def unpack_8bit(raw, offset=127.5):
    lib = _load()
    if lib is None:
        return np.asarray(raw, dtype=np.float32) - np.float32(offset)
    raw, rp = _as_u8(raw)
    out = np.empty(raw.size, np.float32)
    lib.unpack_8bit(rp, raw.size, ctypes.c_float(offset),
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def pack_2bit(values, thresholds):
    """Quantize floats to packed 2-bit codes with 3 thresholds."""
    values = np.ascontiguousarray(values, dtype=np.float32).ravel()
    thresholds = np.ascontiguousarray(thresholds, dtype=np.float32)
    lib = _load()
    if lib is None:
        idx = np.digitize(values, thresholds).astype(np.uint8)
        pad = (-idx.size) % 4
        if pad:
            idx = np.concatenate([idx, np.zeros(pad, np.uint8)])
        return (idx[0::4] | (idx[1::4] << 2) | (idx[2::4] << 4)
                | (idx[3::4] << 6))
    n = values.size
    out = np.empty((n + 3) // 4, np.uint8)
    lib.pack_2bit(
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        thresholds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out
