"""Device-placement helpers for backends with restricted host<->device
transfer dtypes.

The axon TPU tunnel backend transfers float32 ONLY: complex (and int)
``device_put``/fetch raises UNIMPLEMENTED and poisons the process.  Any
complex constant that must live on device (chirp caches, response FTs,
Wiener gains, LO phase factors) therefore travels as two float32 planes
and is assembled into a complex array *on device* inside a jit.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["device_complex", "device_int", "device_zeros"]


@jax.jit
def _assemble(re, im):
    return jax.lax.complex(re, im)


@jax.jit
def _to_i32(f):
    return f.astype(jnp.int32)


def device_zeros(shape, dtype):
    """Zeros of any dtype on device through the float32-safe boundary.

    An EAGER ``jnp.zeros(shape, complex64)`` (or int) device_puts the
    scalar fill constant — a complex/int transfer the axon tunnel
    rejects (whether it survives in practice depends on JAX's constant
    cache history, which made the failure look nondeterministic).
    Build f32 zeros and cast/assemble inside a jit instead."""
    dtype = jnp.dtype(dtype)
    z = jnp.zeros(shape, jnp.float32)
    if dtype.kind == "c":
        return _assemble(z, z)
    if dtype == jnp.float32:
        return z
    return _cast(z, dtype)


@functools.partial(jax.jit, static_argnames="dtype")
def _cast(z, dtype):
    return z.astype(dtype)


def device_int(arr):
    """Place an integer numpy array on device through the float32-safe
    boundary: ship as f32, cast to int32 inside a jit.  Exact for
    values with |v| < 2**24 (f32 integer range) — asserted."""
    arr = np.asarray(arr)
    if not (np.abs(arr) < (1 << 24)).all():
        raise ValueError("device_int is exact only for |v| < 2**24; "
                         f"got max |v| = {np.abs(arr).max()}")
    return _to_i32(jnp.asarray(arr.astype(np.float32)))


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
