"""Worker process for the two-process multihost test (not a pytest file).

Launched by tests/test_multihost.py as:
    python multihost_worker.py <process_id> <num_processes> <port>

Each process owns 2 virtual CPU devices; the global (time=2, chan=2)
mesh spans both processes, so the time-axis halo exchange and the fold
psum cross the process boundary through the gloo collectives backend —
exercising the same code path a multi-host TPU pod uses over DCN
(parallel/multihost.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))          # repo root, for the package

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax                                                  # noqa: E402
jax.config.update("jax_platforms", "cpu")

import numpy as np                                          # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    from baseband_tasks_tpu.parallel import multihost
    try:
        multihost.initialize(coordinator_address=f"localhost:{port}",
                             num_processes=nproc, process_id=pid)
    except Exception as exc:          # pragma: no cover
        print(f"INIT_FAIL: {exc}")
        return 2
    if jax.process_count() != nproc or jax.device_count() != 2 * nproc:
        print(f"INIT_FAIL: processes={jax.process_count()} "
              f"devices={jax.device_count()}")
        return 2

    from baseband_tasks_tpu.models import WidebandPulsarPipeline
    from baseband_tasks_tpu.utils import units as u

    def make_pipe(mesh, block_samples=1024):
        return WidebandPulsarPipeline(
            n_chan=8, n_pol=2, dm=0.5, freq_center=600 * u.MHz,
            chan_rate=250 * u.kHz, period_samples=(512, 1), n_phase=8,
            block_samples=block_samples, mesh=mesh)

    mesh = multihost.pod_mesh(chan=2)        # (time=2, chan=2), 2 hosts
    assert mesh.shape == {"time": 2, "chan": 2}
    pipe = make_pipe(mesh)
    T = pipe.global_block
    rng = np.random.default_rng(0)           # same data in every process
    xf_global = rng.standard_normal((T, 8, 2, 2)).astype(np.float32)

    # every process hands over only ITS time shard of the global block
    sharding = NamedSharding(mesh, P("time", "chan"))
    local = xf_global[pid * (T // nproc):(pid + 1) * (T // nproc)]
    xf = multihost.host_local(local, sharding)
    prof, cnt = pipe.step_fn()(xf, np.float32(17))

    from jax.experimental import multihost_utils
    # reassemble the chan-sharded global profile on every process
    prof_full = np.asarray(multihost_utils.process_allgather(
        prof, tiled=True))
    assert prof_full.shape == (pipe.n_phase, pipe.n_chan, pipe.n_pol)
    cnt_full = np.asarray(multihost_utils.process_allgather(
        cnt, tiled=True))

    if cnt_full.sum() != T:
        print(f"FAIL counts: {cnt_full.sum()} != {T}")
        return 1
    # process 0 exports the result; the parent test re-runs the SAME
    # sharded config in a single process (same mesh shape over local
    # virtual devices) and checks the two agree — proving the
    # cross-process gloo collectives compute what single-process XLA
    # collectives do.
    if pid == 0 and len(sys.argv) > 4:
        np.savez(sys.argv[4], prof=prof_full, cnt=cnt_full)
    print(f"MULTIHOST_OK pid={pid}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
