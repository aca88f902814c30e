"""Small shared helpers for the trial-bank ``*_sharded`` methods.

The search models (DMTrialSearch, FourierDomainAccelSearch,
RMSynthesis, FastFoldingSearch) all shard the same way: the trial bank
(or batch) axis spreads over one mesh axis with ZERO communication —
each device holds its slice of the bank tables and computes its slice
of the output — and the jitted function plus device-placed tables are
cached per (mesh, axis) so a survey loop pays placement and tracing
once.  This module holds the two bits they share.
"""

from __future__ import annotations

__all__ = ["require_mesh_axis", "mesh_cache_key", "pad_to_multiple"]


def require_mesh_axis(mesh, axis_name):
    """Validate ``axis_name`` is a mesh axis; return its size."""
    if axis_name not in mesh.shape:
        raise ValueError(f"mesh has no axis {axis_name!r}; "
                         f"axes are {tuple(mesh.shape)}")
    return int(mesh.shape[axis_name])


def mesh_cache_key(mesh, axis_name):
    """Hashable identity of (mesh, axis) for the per-model jit cache."""
    return (tuple(mesh.shape.items()), tuple(mesh.devices.flat),
            axis_name)


def pad_to_multiple(n, k):
    """Samples of padding that lift ``n`` to a multiple of ``k``."""
    return (-n) % k
