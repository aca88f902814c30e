"""Two-process CPU dryrun of the multi-host path (VERDICT round-1
item 10): ``parallel.multihost.initialize`` + a (time, chan) mesh
spanning two OS processes, checking the sharded fold step against a
single-process run.  The DCN analogue on real pods is the same code with
auto-detected initialization.

Skips (rather than fails) when the distributed CPU runtime cannot come
up in this environment (no gloo backend, sandboxed sockets, ...).
"""

import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_fold_matches_single_process(tmp_path):
    import numpy as np

    port = _free_port()
    outfile = str(tmp_path / "mh_result.npz")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", str(port), outfile],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.dirname(HERE))
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed CPU runtime timed out in this sandbox")
    codes = [p.returncode for p in procs]
    if any(c == 2 for c in codes):
        pytest.skip("jax.distributed unavailable: "
                    + outs[codes.index(2)].strip().splitlines()[-1])
    for code, out in zip(codes, outs):
        assert code == 0, f"worker failed:\n{out}"
        assert "MULTIHOST_OK" in out

    # ground truth: identical sharded config on a single-process
    # (time=2, chan=2) mesh over this test session's virtual CPU devices
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from baseband_tasks_tpu.models import WidebandPulsarPipeline
    from baseband_tasks_tpu.utils import units as u

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ("time", "chan"))
    pipe = WidebandPulsarPipeline(
        n_chan=8, n_pol=2, dm=0.5, freq_center=600 * u.MHz,
        chan_rate=250 * u.kHz, period_samples=(512, 1), n_phase=8,
        block_samples=1024, mesh=mesh)
    T = pipe.global_block
    rng = np.random.default_rng(0)
    xf = jax.device_put(
        rng.standard_normal((T, 8, 2, 2)).astype(np.float32),
        NamedSharding(mesh, P("time", "chan")))
    prof_ref, cnt_ref = pipe.step_fn()(xf, np.float32(17))
    prof_ref, cnt_ref = np.asarray(prof_ref), np.asarray(cnt_ref)

    got = np.load(outfile)
    assert np.array_equal(got["cnt"], cnt_ref)
    np.testing.assert_allclose(got["prof"], prof_ref, rtol=1e-5,
                               atol=1e-5 * np.abs(prof_ref).max())
