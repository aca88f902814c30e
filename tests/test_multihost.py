"""Two-process CPU dryruns of the multi-host path:
``parallel.multihost.initialize`` + a (time, chan) mesh spanning two OS
processes, checking the sharded flagship step against a single-process
run — at toy shapes (fast gate) and at production shapes (VERDICT
round-3 item 3).  The DCN analogue on real pods is the same code with
auto-detected initialization.

Skips (rather than fails) when the distributed CPU runtime cannot come
up in this environment (no gloo backend, sandboxed sockets, ...).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(outfile, mode, timeout):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", str(port), outfile, mode],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.dirname(HERE))
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
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


def _single_process_reference(n_time, n_chan, n_pol, dm, period_samples,
                              n_phase, block_samples):
    """Ground truth: identical sharded config on a single-process mesh
    over this test session's virtual CPU devices."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from baseband_tasks_tpu.models import WidebandPulsarPipeline
    from baseband_tasks_tpu.utils import units as u

    mesh = Mesh(np.asarray(jax.devices()[:n_time * 2]).reshape(n_time, 2),
                ("time", "chan"))
    pipe = WidebandPulsarPipeline(
        n_chan=n_chan, n_pol=n_pol, dm=dm, freq_center=600 * u.MHz,
        chan_rate=250 * u.kHz, period_samples=period_samples,
        n_phase=n_phase, block_samples=block_samples, mesh=mesh)
    T = pipe.global_block
    rng = np.random.default_rng(0)
    xf = jax.device_put(
        rng.standard_normal((T, n_chan, n_pol, 2)).astype(np.float32),
        NamedSharding(mesh, P("time", "chan")))
    prof, cnt = pipe.step_fn()(xf, np.float32(17))
    return np.asarray(prof), np.asarray(cnt)


def test_two_process_fold_matches_single_process(tmp_path):
    outfile = str(tmp_path / "mh_small.npz")
    _run_workers(outfile, "small", timeout=240)
    prof_ref, cnt_ref = _single_process_reference(
        n_time=2, n_chan=8, n_pol=2, dm=0.5, period_samples=(512, 1),
        n_phase=8, block_samples=1024)
    got = np.load(outfile)
    assert np.array_equal(got["cnt"], cnt_ref)
    np.testing.assert_allclose(got["prof"], prof_ref, rtol=1e-5,
                               atol=1e-5 * np.abs(prof_ref).max())


def test_two_process_production_shapes(tmp_path):
    """The full sharded flagship step across 2 processes x 4 virtual
    devices at production shapes (n_chan=128, 2^16-sample shards,
    n_phase=64) equals the single-process 8-device result."""
    outfile = str(tmp_path / "mh_prod.npz")
    _run_workers(outfile, "production", timeout=480)
    prof_ref, cnt_ref = _single_process_reference(
        n_time=4, n_chan=128, n_pol=2, dm=50.0,
        period_samples=(16000, 3), n_phase=64, block_samples=1 << 16)
    got = np.load(outfile)
    assert np.array_equal(got["cnt"], cnt_ref)
    np.testing.assert_allclose(got["prof"], prof_ref, rtol=1e-5,
                               atol=1e-5 * np.abs(prof_ref).max())
