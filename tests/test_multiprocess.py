"""Multi-controller (multi-host) correctness: two REAL processes.

Spawns two OS processes, each owning 4 virtual CPU devices, joined through
``jax.distributed`` with gloo cross-process collectives — a faithful
simulation of a two-slice TPU deployment (the ``dcn`` mesh axis crosses
processes, ``data``/``model`` stay process-local).  Each process feeds only
its own batch rows; gradients all-reduce across dcn.

Asserts the dp x tp hybrid-mesh run (2 processes x (2 data x 2 model)):
* both processes observe identical losses and eval sums (the state is
  consistent across controllers), and
* matches a single-process control run over the same 16-row global batch on
  this test process's own 8-device mesh (dcn=1 x data=4 x model=2).

The reference has no distributed execution of any kind (SURVEY.md §2.4).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = os.path.join(REPO, "scripts", "demo_multihost.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(port, pid, env):
    return subprocess.Popen(
        [sys.executable, DEMO, "--coordinator", f"127.0.0.1:{port}",
         "--num_processes", "2", "--process_id", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO, env=env)


def _last_json(stdout: str) -> dict:
    lines = [l for l in stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON line in output:\n{stdout}"
    return json.loads(lines[-1])


@pytest.mark.slow
def test_two_process_hybrid_mesh_matches_single_process():
    env = dict(os.environ)
    # Children provision their own 4-device CPU platform; scrub this test
    # process's 8-device flags so each child sees exactly its own slice.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"

    port = _free_port()
    # Single-process control (same demo, dcn=1 x data=4 x model=2 over 8
    # devices, identical global batch and seeds — same math, different
    # process topology) ALSO runs as a child, concurrently with the pair.
    # A subprocess and not in-process: eager multi-device dispatch on
    # XLA:CPU carries a known low-rate SIGABRT flake (see the host-roll
    # note in eval/forecast.py) — in a child it is a test failure with
    # stderr attached, in the pytest process it aborts the entire suite
    # (observed: 'Fatal Python error: Aborted' mid-run).
    envc = dict(os.environ)
    envc["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    envc["JAX_PLATFORMS"] = "cpu"
    pc = subprocess.Popen(
        [sys.executable, DEMO, "--num_processes", "1",
         "--devices_per_process", "8"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO, env=envc)
    p1 = _spawn(port, 1, env)
    p0 = _spawn(port, 0, env)
    try:
        out0, err0 = p0.communicate(timeout=1100)
        out1, err1 = p1.communicate(timeout=60)
        outc, errc = pc.communicate(timeout=600)
    finally:
        for p in (p0, p1, pc):
            if p.poll() is None:
                p.kill()
    assert p0.returncode == 0, f"proc0 failed:\n{err0[-3000:]}"
    assert p1.returncode == 0, f"proc1 failed:\n{err1[-3000:]}"
    assert pc.returncode == 0, f"control failed:\n{errc[-3000:]}"
    r0, r1 = _last_json(out0), _last_json(out1)

    assert r0["processes"] == 2 and r0["mesh"] == {"dcn": 2, "data": 2, "model": 2}
    assert np.all(np.isfinite(r0["losses"]))
    # Both controllers hold the same replicated scalars.
    assert r0["losses"] == r1["losses"]
    assert r0["eval_sums"] == r1["eval_sums"]

    rc = _last_json(outc)
    assert rc["processes"] == 1
    assert rc["mesh"] == {"dcn": 1, "data": 4, "model": 2}
    np.testing.assert_allclose(rc["losses"], r0["losses"], atol=2e-5)
    for k, v in r0["eval_sums"].items():
        np.testing.assert_allclose(rc["eval_sums"][k], v, rtol=1e-4)


def test_initialize_rejects_conflicting_device_count_flag():
    """The conftest pins XLA_FLAGS to 8 host devices; requesting a different
    cpu_devices_per_process must raise BEFORE touching the runtime — the
    env flag would silently win and build a different-sized topology
    (distributed.py::initialize)."""
    from visuelle2_tpu.parallel.distributed import initialize

    assert "xla_force_host_platform_device_count=8" in os.environ["XLA_FLAGS"]
    with pytest.raises(ValueError, match="already forces 8"):
        initialize(coordinator_address="127.0.0.1:1",
                   num_processes=2, process_id=0,
                   cpu_devices_per_process=4)


def test_make_hybrid_mesh_rejects_bad_topology():
    """Topology validation must be a real raise (python -O strips asserts):
    a model axis that doesn't divide the per-process device count would
    silently break global_batch's contiguous-row-block contract."""
    from visuelle2_tpu.parallel.distributed import make_hybrid_mesh

    with pytest.raises(ValueError, match="not divisible"):
        make_hybrid_mesh(model=3)  # 8 devices / 1 process, 8 % 3 != 0
