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

import importlib.util
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = os.path.join(REPO, "scripts", "demo_multihost.py")


def _demo_module():
    spec = importlib.util.spec_from_file_location("demo_multihost", DEMO)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


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
    p1 = _spawn(port, 1, env)
    p0 = _spawn(port, 0, env)
    try:
        out0, err0 = p0.communicate(timeout=1100)
        out1, err1 = p1.communicate(timeout=60)
    finally:
        for p in (p0, p1):
            if p.poll() is None:
                p.kill()
    assert p0.returncode == 0, f"proc0 failed:\n{err0[-3000:]}"
    assert p1.returncode == 0, f"proc1 failed:\n{err1[-3000:]}"
    r0, r1 = _last_json(out0), _last_json(out1)

    assert r0["processes"] == 2 and r0["mesh"] == {"dcn": 2, "data": 2, "model": 2}
    assert np.all(np.isfinite(r0["losses"]))
    # Both controllers hold the same replicated scalars.
    assert r0["losses"] == r1["losses"]
    assert r0["eval_sums"] == r1["eval_sums"]

    # Single-process control on this test process's 8 devices: identical
    # global batch and seeds, dcn axis of size 1 — same math, different
    # process topology.
    import jax

    from visuelle2_tpu.models import VocabSizes, build
    from visuelle2_tpu.parallel.distributed import make_hybrid_mesh
    from visuelle2_tpu.train.loop import TrainConfig, Trainer

    demo = _demo_module()
    gb = demo.synthetic_global_batch(16)
    mesh = make_hybrid_mesh(model=2)
    assert dict(mesh.shape) == {"dcn": 1, "data": 4, "model": 2}
    model = build("gated_v4", vocab=VocabSizes(5, 6, 5, 126), output_len=12,
                  embedding_dim=32, hidden_dim=64, image_arch="tiny")
    trainer = Trainer(model, TrainConfig(batch_size=16, grad_clip=0.5,
                                         tp_min_dim=32), mesh=mesh)
    state = trainer.init_state(gb)
    losses = []
    for _ in range(2):
        state, m = trainer.train_step(state, gb, jax.random.key(0))
        losses.append(float(m["loss"]))
    np.testing.assert_allclose(losses, r0["losses"], atol=2e-5)
    sums = {k: float(v) for k, v in trainer.eval_step(state, gb).items()}
    for k, v in r0["eval_sums"].items():
        np.testing.assert_allclose(sums[k], v, rtol=1e-4)


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
