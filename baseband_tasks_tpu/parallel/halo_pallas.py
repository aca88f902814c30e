"""In-kernel halo exchange: overlap-save edges via inter-chip DMA.

`halo.halo_edges` moves the overlap-save halo with ``jax.lax.ppermute``
— an XLA collective that runs as its own fusion, serialized against the
compute that follows.  On real multi-chip hardware the same bytes can
ride ICI from *inside* a Pallas kernel with
``pltpu.make_async_remote_copy`` (async remote DMA), which lets a fused
pipeline start its FFT stage while the (much smaller) edge transfer is
still in flight, and removes the collective's launch overhead — the
"Pallas remote-DMA kernels where needed" slot of SURVEY.md §2's
parallelism mapping.

Contract matches :func:`..parallel.halo.halo_edges`: inside ``shard_map``
over a mesh axis ``axis_name`` that shards time (axis 0), return
``(front, end)`` edge buffers — my left neighbor's trailing
``pad_start`` samples and my right neighbor's leading ``pad_end``
samples, zeros at non-periodic boundaries.

On hardware, device addressing uses mesh-coordinate dicts
(``device_id={axis_name: neighbor}``, ``DeviceIdType.MESH``) so the
kernel works on multi-axis meshes (e.g. ``('time', 'chan')``: the halo
moves along 'time' within each 'chan' ring).  The CPU interpreter's
remote-DMA discharge supports only a single manual mesh axis (for both
LOGICAL and MESH ids), so in interpret mode a multi-axis call falls
back to the ppermute implementation — semantically identical, keeping
multi-axis pipelines wired to the remote halo CPU-testable, while the
DMA kernel itself is pinned equal to ppermute on 1-D meshes.  The id
arithmetic MESH addressing performs on hardware (row-major coordinate
flattening) is factored out as :func:`mesh_logical_id` and unit-tested
on 2-D meshes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["halo_edges_remote", "halo_exchange_remote",
           "mesh_logical_id"]


def _neighbor(axis_name, step, n_shards):
    my = jax.lax.axis_index(axis_name)
    return jax.lax.rem(my + step + n_shards, n_shards)


def mesh_logical_id(axis_order, axis_name, idx):
    """Logical device id of the device at my mesh coordinates with the
    ``axis_name`` coordinate replaced by ``idx``.

    ``axis_order`` is the static ((name, size), ...) of the mesh axes in
    mesh order; logical ids are the row-major flattening of mesh
    coordinates (what ``Mesh(devices.reshape(...))`` produces), so this
    computes exactly the device that ``device_id={axis_name: idx}``
    MESH addressing targets on hardware.  In interpret mode it is only
    ever reached with a single-axis ``axis_order`` (where it reduces to
    ``idx``) — jax's emulator cannot discharge multi-axis DMAs, and
    :func:`halo_edges_remote` falls back to ppermute there — but the
    2-D arithmetic is unit-tested (tests/test_halo_pallas.py) so the
    hardware addressing contract stays pinned.
    """
    lid = jnp.int32(0)
    for name, size in axis_order:
        comp = idx if name == axis_name else jax.lax.axis_index(name)
        lid = lid * size + comp
    return lid


def _halo_kernel(axis_name, axis_order, n_shards, pad_start, pad_end,
                 barrier, interpret, x_ref, *out_and_sems):
    """Send my trailing ``pad_start`` rows right and my leading
    ``pad_end`` rows left, both as async remote DMAs."""
    # signature order: inputs, outputs, scratch (semaphores)
    n_out = (1 if pad_start else 0) + (1 if pad_end else 0)
    outs = list(out_and_sems[:n_out])
    sems = list(out_and_sems[n_out:])

    if interpret:
        # the interpreter's DMA discharge handles scalar LOGICAL ids
        # only; compute the neighbor's logical id from the full mesh
        # coordinates (mesh_logical_id), so multi-axis meshes work
        def dest(idx):
            return dict(device_id=mesh_logical_id(axis_order, axis_name,
                                                  idx),
                        device_id_type=pltpu.DeviceIdType.LOGICAL)
    else:
        # mesh coordinates: move along axis_name, other axes unchanged —
        # works on any multi-axis mesh (e.g. ('time', 'chan'))
        def dest(idx):
            return dict(device_id={axis_name: idx},
                        device_id_type=pltpu.DeviceIdType.MESH)

    right = _neighbor(axis_name, +1, n_shards)
    left = _neighbor(axis_name, -1, n_shards)
    if barrier:
        # Neighbors may still be in a previous step whose buffers alias
        # ours; handshake before writing into their output refs.
        bsem = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(bsem, inc=1, **dest(left))
        pltpu.semaphore_signal(bsem, inc=1, **dest(right))
        pltpu.semaphore_wait(bsem, 2)
    local_n = x_ref.shape[0]
    copies = []
    oi = 0
    if pad_start:
        # my trailing rows become my RIGHT neighbor's `front`
        copies.append(pltpu.make_async_remote_copy(
            src_ref=x_ref.at[pl.ds(local_n - pad_start, pad_start)],
            dst_ref=outs[oi], send_sem=sems[0], recv_sem=sems[1],
            **dest(right)))
        oi += 1
    if pad_end:
        # my leading rows become my LEFT neighbor's `end`
        copies.append(pltpu.make_async_remote_copy(
            src_ref=x_ref.at[pl.ds(0, pad_end)],
            dst_ref=outs[oi], send_sem=sems[-2], recv_sem=sems[-1],
            **dest(left)))
    for c in copies:
        c.start()
    for c in copies:
        c.wait()


def halo_edges_remote(x, pad_start, pad_end, axis_name="time",
                      periodic=False, *, interpret=None, collective_id=7):
    """(front, end) edge buffers via in-kernel remote DMA.

    Must be called inside ``shard_map``; semantics identical to
    :func:`..parallel.halo.halo_edges`.  ``collective_id`` tags the
    barrier semaphore; concurrent distinct collectives need distinct ids.
    """
    n_shards = jax.lax.axis_size(axis_name)

    def zeros(m):
        return jnp.zeros((m,) + x.shape[1:], x.dtype)

    if n_shards == 1:
        local_n = x.shape[0]
        if periodic:
            return (x[local_n - pad_start:] if pad_start else zeros(0),
                    x[:pad_end] if pad_end else zeros(0))
        return zeros(pad_start), zeros(pad_end)
    if pad_start > x.shape[0] or pad_end > x.shape[0]:
        raise ValueError(
            f"halo ({pad_start},{pad_end}) exceeds local block "
            f"{x.shape[0]}; use fewer shards or larger blocks")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    axis_order = ((axis_name, n_shards),)
    if interpret:
        # The interpreter addresses devices by scalar LOGICAL id and its
        # remote-DMA discharge rule supports only ONE manual mesh axis
        # (jax dma_start_partial_discharge_rule).  With several manual
        # axes, fall back to the ppermute implementation — semantically
        # identical (the 1-D tests pin DMA == ppermute equality), so
        # multi-axis pipelines wired to halo='remote' stay CPU-testable;
        # hardware always takes the real mesh-coordinate DMA path.  To
        # exercise the DMA interpret path on a multi-axis mesh, restrict
        # the manual axes: shard_map(..., axis_names={'time'}).
        try:
            from jax._src.core import get_axis_env
            env = get_axis_env()
            axis_order = tuple((name, int(env.axis_size(name)))
                               for name in env.axis_sizes
                               if name is not None)
        except Exception:
            # private API moved — a 1-D mesh still addresses correctly
            axis_order = ((axis_name, n_shards),)
        if len(axis_order) > 1:
            from .halo import halo_edges
            return halo_edges(x, pad_start, pad_end, axis_name=axis_name,
                              periodic=periodic)

    # outputs vary over every manual mesh axis (vma lets callers keep
    # shard_map's check_vma=True, e.g. with partial manual axes)
    try:
        from jax._src.core import get_axis_env
        vma = frozenset(name for name in get_axis_env().axis_sizes
                        if name is not None)
    except Exception:
        vma = frozenset((axis_name,))

    def out_struct(m):
        try:
            return jax.ShapeDtypeStruct((m,) + x.shape[1:], x.dtype,
                                        vma=vma)
        except TypeError:  # older jax without vma
            return jax.ShapeDtypeStruct((m,) + x.shape[1:], x.dtype)

    out_shapes = []
    sem_shapes = []
    if pad_start:
        out_shapes.append(out_struct(pad_start))
        sem_shapes += [pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
    if pad_end:
        out_shapes.append(out_struct(pad_end))
        sem_shapes += [pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
    if not out_shapes:
        return zeros(0), zeros(0)

    # The interpreter has no discharge rule for barrier semaphores; the
    # handshake only matters on real hardware anyway (the interpreter's
    # DMA emulation is itself a synchronous collective).
    barrier = not interpret
    kern = functools.partial(_halo_kernel, axis_name, axis_order,
                             n_shards, pad_start, pad_end, barrier,
                             interpret)
    outs = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                        for _ in out_shapes),
        out_shape=tuple(out_shapes),
        scratch_shapes=sem_shapes,
        compiler_params=pltpu.CompilerParams(collective_id=collective_id),
        interpret=interpret,
    )(x)
    outs = list(outs) if isinstance(outs, (tuple, list)) else [outs]
    front = outs.pop(0) if pad_start else zeros(0)
    end = outs.pop(0) if pad_end else zeros(0)
    if not periodic:
        idx = jax.lax.axis_index(axis_name)
        front = jnp.where(idx == 0, jnp.zeros_like(front), front)
        end = jnp.where(idx == n_shards - 1, jnp.zeros_like(end), end)
    return front, end


def halo_exchange_remote(x, pad_start, pad_end, axis_name="time",
                         periodic=False, **kwargs):
    """Padded window ``concat([front, x, end])`` via in-kernel remote DMA
    (drop-in for :func:`..parallel.halo.halo_exchange`, axis 0 only)."""
    front, end = halo_edges_remote(x, pad_start, pad_end,
                                   axis_name=axis_name, periodic=periodic,
                                   **kwargs)
    return jnp.concatenate([front, x, end], axis=0)
