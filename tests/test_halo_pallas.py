"""In-kernel (remote-DMA) halo exchange must reproduce the ppermute
version exactly.  Runs in pallas interpret mode on the virtual CPU mesh;
the interpreter's remote-DMA discharge rule only supports one named mesh
axis, so these tests use a 1-D time mesh (real-TPU compiles take any
mesh via mesh-coordinate device ids)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from baseband_tasks_tpu.parallel import halo_edges, halo_exchange
from baseband_tasks_tpu.parallel.halo_pallas import (halo_edges_remote,
                                                     halo_exchange_remote)


def time_mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]), ("time",))


def sharded(fn, mesh):
    return jax.shard_map(fn, mesh=mesh, in_specs=P("time"),
                         out_specs=P("time"), check_vma=False)


@pytest.mark.parametrize("periodic", [False, True])
@pytest.mark.parametrize("pads", [(6, 4), (5, 0), (0, 3)])
def test_edges_match_ppermute(periodic, pads):
    pad_start, pad_end = pads
    mesh = time_mesh()
    x = jnp.arange(8 * 16 * 8, dtype=jnp.float32).reshape(8 * 16, 8)

    def via_ppermute(xl):
        f, e = halo_edges(xl, pad_start, pad_end, periodic=periodic)
        return jnp.concatenate([f, e], axis=0)

    def via_dma(xl):
        f, e = halo_edges_remote(xl, pad_start, pad_end,
                                 periodic=periodic, interpret=True)
        return jnp.concatenate([f, e], axis=0)

    ref = np.asarray(sharded(via_ppermute, mesh)(x))
    got = np.asarray(sharded(via_dma, mesh)(x))
    np.testing.assert_array_equal(got, ref)


def test_window_matches_halo_exchange():
    mesh = time_mesh()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8 * 32, 8)).astype(np.float32))

    ref = np.asarray(sharded(
        lambda xl: halo_exchange(xl, 7, 5), mesh)(x))
    got = np.asarray(sharded(
        lambda xl: halo_exchange_remote(xl, 7, 5, interpret=True),
        mesh)(x))
    np.testing.assert_array_equal(got, ref)


def test_single_shard_and_validation():
    mesh = time_mesh(1)
    x = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)

    f, e = jax.shard_map(
        lambda xl: halo_edges_remote(xl, 3, 2, interpret=True),
        mesh=mesh, in_specs=P("time"),
        out_specs=(P("time"), P("time")), check_vma=False)(x)
    assert np.all(np.asarray(f) == 0) and np.all(np.asarray(e) == 0)

    with pytest.raises(ValueError, match="exceeds local block"):
        jax.shard_map(
            lambda xl: halo_edges_remote(xl, 3, 2, interpret=True),
            mesh=time_mesh(8), in_specs=P("time"),
            out_specs=(P("time"), P("time")),
            check_vma=False)(jnp.zeros((16, 8), jnp.float32))


def test_overlap_save_window_consistency():
    """Windows assembled from DMA'd edges give the same overlap-save
    result as gathering the global array (the halo.py invariant)."""
    mesh = time_mesh()
    pad_s, pad_e = 4, 4
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8 * 16, 8)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal(pad_s + 1 + pad_e)
                         .astype(np.float32))

    def smooth(window):
        # valid-mode correlation: local_n outputs from local_n+pads in
        segs = [window[i:i + 16] * kernel[i]
                for i in range(pad_s + 1 + pad_e)]
        return sum(segs)

    def local(xl):
        return smooth(halo_exchange_remote(xl, pad_s, pad_e,
                                           interpret=True))

    got = np.asarray(sharded(local, mesh)(x))
    padded = np.concatenate([np.zeros((pad_s, 8), np.float32),
                             np.asarray(x),
                             np.zeros((pad_e, 8), np.float32)])
    expect = sum(padded[i:i + 8 * 16] * float(kernel[i])
                 for i in range(pad_s + 1 + pad_e))
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("shape,order", [
    ((4, 2), ("time", "chan")),   # halo along the major axis
    ((2, 4), ("time", "chan")),
    ((8, 1), ("time", "chan")),   # degenerate second axis
    ((2, 4), ("chan", "time")),   # halo along the MINOR axis
])
def test_multi_axis_mesh_matches_ppermute(shape, order):
    """Multi-axis meshes: halo='remote' must give the ppermute result —
    in interpret mode via the documented fallback (the CPU emulator's
    DMA discharge supports one manual axis only), so multi-axis
    pipelines wired to the remote halo stay testable."""
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(shape), order)
    rng = np.random.default_rng(3)
    t_shards = dict(zip(order, shape))["time"]
    c_shards = dict(zip(order, shape))["chan"]
    x = jnp.asarray(rng.standard_normal(
        (t_shards * 16, c_shards * 8)).astype(np.float32))
    spec = P("time", "chan")

    def via_ppermute(xl):
        f, e = halo_edges(xl, 5, 3)
        return jnp.concatenate([f, e], axis=0)

    def via_dma(xl):
        f, e = halo_edges_remote(xl, 5, 3, interpret=True)
        return jnp.concatenate([f, e], axis=0)

    sh = lambda fn: jax.shard_map(fn, mesh=mesh, in_specs=spec,  # noqa
                                  out_specs=spec, check_vma=False)
    ref = np.asarray(sh(via_ppermute)(x))
    got = np.asarray(sh(via_dma)(x))
    np.testing.assert_array_equal(got, ref)


def test_mesh_logical_id_unit():
    """mesh_logical_id must match row-major coordinate flattening (what
    MESH-coordinate addressing targets) on a 2-D mesh."""
    from baseband_tasks_tpu.parallel.halo_pallas import mesh_logical_id
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                ("time", "chan"))

    def local(xl):
        axis_order = (("time", 2), ("chan", 4))
        t = jax.lax.axis_index("time")
        c = jax.lax.axis_index("chan")
        lid_self = mesh_logical_id(axis_order, "time", t)
        lid_next = mesh_logical_id(axis_order, "time", (t + 1) % 2)
        return xl * 0 + jnp.stack([lid_self, lid_next]
                                  ).astype(jnp.float32)[:, None]

    out = jax.shard_map(local, mesh=mesh, in_specs=P("time", "chan"),
                        out_specs=P("time", "chan"),
                        check_vma=False)(jnp.zeros((4, 8), jnp.float32))
    out = np.asarray(out)
    # device (t, c) occupies block rows [2t, 2t+2), cols [2c, 2c+2)
    for t in range(2):
        for c in range(4):
            blk = out[2 * t: 2 * t + 2, 2 * c: 2 * c + 2]
            assert blk[0, 0] == t * 4 + c              # self
            assert blk[1, 0] == ((t + 1) % 2) * 4 + c  # time-neighbor
