"""TRUE multi-process distributed training test (VERDICT r3 item 2).

Launches 2 real OS processes (coordinator + worker), each with 2 virtual CPU
devices, through the production ``parallel.mesh.init_multihost`` join
(``jax.distributed`` + gloo collectives) — the DDP-across-processes seam the
reference exercises via Lightning/NCCL (``code/train.py:177-201``) and that
every prior multi-chip artifact only covered with single-process virtual
meshes. Asserts:

* both processes join one 4-device global mesh (2 local each),
* per-host ``shard_for_host`` feeding + cross-process gradient psum produce
  per-step losses and eval logits IDENTICAL across the two processes,
* those match a single-process single-device oracle running the same math,
* the checkpoint written by process 0 holds the oracle's parameters.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
WORKER = Path(__file__).parent / "mp_train_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn_workers(nproc: int, tmp_path, batch: int = 4, steps: int = 6,
                   save_state: str = "-", timeout: int = 600) -> list[dict]:
    """Launch ``nproc`` real OS worker processes and return their reports."""
    port = _free_port()
    env = os.environ.copy()
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(nproc), str(port),
             str(tmp_path), str(batch), str(steps), save_state],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=str(REPO),
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    return [
        json.loads((tmp_path / f"worker{pid}.json").read_text())
        for pid in range(nproc)
    ]


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    env = os.environ.copy()
    # drop the axon TPU plugin entirely for the workers (they bootstrap CPU
    # themselves; no TPU relay traffic from throwaway subprocesses)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), "2", str(port), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=str(REPO),
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    r0 = json.loads((tmp_path / "worker0.json").read_text())
    r1 = json.loads((tmp_path / "worker1.json").read_text())
    assert r0["process_count"] == r1["process_count"] == 2
    assert r0["global_devices"] == r1["global_devices"] == 4
    assert r0["local_devices"] == r1["local_devices"] == 2

    # the two processes observed the SAME replicated training trajectory
    np.testing.assert_array_equal(r0["losses"], r1["losses"])
    np.testing.assert_array_equal(r0["eval_logits"], r1["eval_logits"])
    assert len(r0["losses"]) == 6 and r0["losses"][-1] < r0["losses"][0]

    # single-process single-device oracle: identical math, no mesh
    from tests.mp_train_worker import run_training

    losses, eval_logits, params = run_training(mesh=None)
    np.testing.assert_allclose(r0["losses"], losses, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(r0["eval_logits"]), eval_logits, rtol=1e-5, atol=1e-6
    )

    # process-0 checkpoint round-trips to the oracle's parameters. Tolerance
    # note: losses/logits track at 1e-5, but adam NORMALIZES gradients, so for
    # params whose gradient is ~0 the cross-device reduction-order noise flips
    # the tiny gradient's sign and adam turns that into an lr-sized (1e-3)
    # step — bound the per-leaf drift at 6 steps * lr instead of rtol.
    from transmil_deepgraft_tpu.utils.checkpoints import load_pytree

    ck = load_pytree(tmp_path / "mp_params.msgpack", params)
    import jax

    for a, b in zip(jax.tree.leaves(ck), jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


@pytest.mark.slow
def test_four_process_dp8_training_matches_single_process(tmp_path):
    """VERDICT r4 item 7 (scale): 4 real OS processes x 2 CPU devices join one
    dp=8 global mesh; every process observes the SAME replicated trajectory
    and it matches the single-device oracle at the same (batch=8) math."""
    reports = _spawn_workers(4, tmp_path, batch=8)
    for r in reports:
        assert r["process_count"] == 4
        assert r["global_devices"] == 8 and r["local_devices"] == 2
    for r in reports[1:]:
        np.testing.assert_array_equal(reports[0]["losses"], r["losses"])
        np.testing.assert_array_equal(reports[0]["eval_logits"], r["eval_logits"])
    assert len(reports[0]["losses"]) == 6
    assert reports[0]["losses"][-1] < reports[0]["losses"][0]

    from tests.mp_train_worker import run_training

    losses, eval_logits, _ = run_training(mesh=None, batch=8)
    np.testing.assert_allclose(reports[0]["losses"], losses, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(reports[0]["eval_logits"]), eval_logits, rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
def test_resume_across_world_sizes(tmp_path):
    """VERDICT r4 item 7 (elastic resume): train 3 steps in a dp=4/2-process
    world, checkpoint the FULL state (params + opt_state) from process 0, then
    resume in two SMALLER worlds — a dp=2 single-process mesh and a bare
    single device — and assert both continue the identical trajectory (losses,
    eval logits) from step 3. The preemption-recovery story no longer assumes
    a constant world size."""
    state = tmp_path / "state_after_3.msgpack"
    reports = _spawn_workers(2, tmp_path, batch=4, steps=3, save_state=str(state))
    assert state.exists()
    phase_a = reports[0]["losses"]
    assert len(phase_a) == 3

    from tests.mp_train_worker import run_training

    # phase A matches the fresh single-device oracle's first 3 steps
    oracle_a, _, _ = run_training(mesh=None, batch=4, steps=3)
    np.testing.assert_allclose(phase_a, oracle_a, rtol=1e-5, atol=1e-6)

    # continuation oracle: single device, restored state, steps 3..6
    oracle_b, oracle_logits, _ = run_training(
        mesh=None, batch=4, steps=3, start_step=3, resume_from=str(state)
    )

    # resumed world: dp=2 over 2 of this process's virtual CPU devices
    import jax

    from transmil_deepgraft_tpu.parallel.mesh import make_mesh

    mesh2 = make_mesh(jax.devices()[:2], dp=2, sp=1)
    res_losses, res_logits, _ = run_training(
        mesh2, batch=4, steps=3, start_step=3, resume_from=str(state)
    )
    np.testing.assert_allclose(res_losses, oracle_b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(res_logits, oracle_logits, rtol=1e-5, atol=1e-6)
    # trained: the resumed continuation keeps improving on phase A
    assert res_losses[-1] < phase_a[0]
