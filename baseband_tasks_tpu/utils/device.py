"""Device-placement helpers for backends with restricted host<->device
transfer dtypes.

The axon TPU tunnel backend transfers float32 ONLY: complex (and int)
``device_put``/fetch raises UNIMPLEMENTED and poisons the process.  Any
complex constant that must live on device (chirp caches, response FTs,
Wiener gains, LO phase factors) therefore travels as two float32 planes
and is assembled into a complex array *on device* inside a jit.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["device_complex"]


@jax.jit
def _assemble(re, im):
    return jax.lax.complex(re, im)


def device_complex(arr):
    """Place a numpy array on device through the float32-safe boundary.

    Real arrays pass straight through ``jnp.asarray``; complex arrays are
    shipped as separate float32 real/imaginary planes and combined on
    device (single precision: device compute is complex64 throughout).
    """
    arr = np.asarray(arr)
    if arr.dtype.kind != "c":
        # the axon boundary transfers float32 only: int/f64 inputs must
        # be cast before crossing it
        return jnp.asarray(arr.astype(np.float32, copy=False))
    re = jnp.asarray(np.ascontiguousarray(arr.real).astype(np.float32))
    im = jnp.asarray(np.ascontiguousarray(arr.imag).astype(np.float32))
    return _assemble(re, im)
