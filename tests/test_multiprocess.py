"""Multi-process (multi-host-shaped) distributed validation (VERDICT r1 #5).

Spawns 2 processes x 4 virtual CPU devices, joined via
``jax.distributed.initialize`` -- the exact program shape of one process per
TPU host (docs/SCALING.md).  Each runs a boards-sharded PPO train step over
the same GLOBAL batch; the test asserts both processes produce bit-identical
replicated parameters and metrics (the gradient psum is the only
collective).  Maps the reference's threaded scaling mode
(performance_test.cpp:71-94) per SURVEY.md §2.6 P3.
"""

import json
import os
import socket
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multiprocess_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(mode: str):
    port = _free_port()
    outdir = tempfile.mkdtemp()
    env = dict(
        os.environ,
        PYTHONPATH=REPO + ":" + os.environ.get("PYTHONPATH", ""),
    )
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu itself
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), outdir, mode],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multiprocess worker timed out")
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = []
    for pid in range(2):
        with open(os.path.join(outdir, f"result_{pid}.json")) as f:
            results.append(json.load(f))
    return results


@pytest.mark.slow
def test_two_process_sharded_train_step():
    r0, r1 = _run_workers("ppo")
    assert r0["n_global_devices"] == 8
    assert r1["n_global_devices"] == 8
    # Replicated state must agree bit-for-bit across processes.
    assert r0["params_sha256"] == r1["params_sha256"]
    assert r0["loss"] == r1["loss"]
    assert r0["reward_mean"] == r1["reward_mean"]
    assert r0["episodes"] == r1["episodes"]


@pytest.mark.slow
def test_two_process_sharded_fsm_chunk_auto_reset():
    """The FSM-policy chunk WITH the auto-reset path under jax.distributed
    (VERDICT r4 item 5): 2 processes x 4 devices run the in-kernel
    SimpleAgent chunk (interpret mode, fsm_state sharded, fresh reset
    terrain injected) over a global 16-board batch with two boards
    resetting mid-chunk; every process's local output shards must be
    bit-identical to a single-process 8-device run."""
    import importlib.util

    import jax
    import numpy as np

    spec = importlib.util.spec_from_file_location("mp_worker", WORKER)
    worker = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(worker)

    results = _run_workers("fsmchunk")

    from pomcpp_tpu.parallel import boards_mesh
    from pomcpp_tpu.parallel.mesh import shard_batch, sharded_chunk_rollout

    mesh = boards_mesh()
    cs_local, fsm_l, rand_np, reset_l, batch, steps = worker.fsmchunk_inputs()
    cs = shard_batch(jax.tree.map(jax.numpy.asarray, cs_local), mesh)
    run = sharded_chunk_rollout(
        mesh, steps=steps, policy="simple", interpret=True,
        inject=True, auto_reset=True, inject_reset=True,
    )
    out, _ = run(
        cs, 0, fsm_state=shard_batch(fsm_l, mesh), moves=rand_np,
        reset_boards=shard_batch(
            jax.tree.map(jax.numpy.asarray, reset_l), mesh
        ),
    )
    ref_np = {
        name: np.asarray(getattr(out, name))
        for name in type(out)._fields
        if getattr(out, name).ndim >= 1
        and getattr(out, name).shape[:1] == (batch,)
    }
    # The two pre-finished boards actually reset (all four agents alive).
    assert int(ref_np["alive_count"][2]) == 4
    assert int(ref_np["alive_count"][11]) == 4

    covered = []
    for r in results:
        assert r["n_global_devices"] == 8
        assert r["rows_sha256"] == worker.rows_hash(ref_np, r["rows"]), (
            f"process {r['pid']} fsmchunk shards diverge from the "
            f"single-process run (rows {r['rows']})"
        )
        covered += r["rows"]
    assert sorted(covered) == list(range(batch))


@pytest.mark.slow
def test_two_process_sharded_chunk_rollout():
    """The PRODUCTION chunk kernel under jax.distributed (VERDICT r3 #4):
    2 processes x 4 devices run ``sharded_chunk_rollout`` (interpret mode,
    injected moves) over a global 16-board batch; every process's local
    output shards must be bit-identical to the same rows of a
    single-process 8-device run of the identical program."""
    import importlib.util

    import jax
    import numpy as np

    spec = importlib.util.spec_from_file_location("mp_worker", WORKER)
    worker = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(worker)

    results = _run_workers("chunk")

    # Single-process reference run over this test process's 8 devices.
    from pomcpp_tpu.parallel import boards_mesh
    from pomcpp_tpu.parallel.mesh import shard_batch, sharded_chunk_rollout

    mesh = boards_mesh()
    cs_local, moves_np, batch, steps = worker.chunk_inputs()
    cs = shard_batch(jax.tree.map(jax.numpy.asarray, cs_local), mesh)
    run = sharded_chunk_rollout(
        mesh, steps=steps, policy="random", interpret=True,
        inject=True, auto_reset=False,
    )
    out = run(cs, 0, moves=moves_np)
    ref_np = {
        name: np.asarray(getattr(out, name))
        for name in type(out)._fields
        if getattr(out, name).ndim >= 1
        and getattr(out, name).shape[:1] == (batch,)
    }

    covered = []
    for r in results:
        assert r["n_global_devices"] == 8
        assert r["rows_sha256"] == worker.rows_hash(ref_np, r["rows"]), (
            f"process {r['pid']} chunk shards diverge from the "
            f"single-process run (rows {r['rows']})"
        )
        covered += r["rows"]
    assert sorted(covered) == list(range(batch))
