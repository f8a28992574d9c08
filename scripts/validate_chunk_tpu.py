"""On-TPU validation of the benched path: pallas_rollout_chunk with its
in-kernel PRNG + auto-reset, replayed through the cellular engine.

The chunk kernel records the moves it draws and the per-step done mask
(record=True); the recorded move stream is then replayed through
``cellular_step``.  Boards that never auto-reset must match the kernel's
final state bit-exactly; the recorded done flags must agree with the
replay's alive counts while each board is still on its first episode.
A second pass checks the reset wiring itself: a board entering the chunk
already finished must come out as a fresh corner-start board.

The axon TPU plugin cannot co-exist with the CPU backend in one process,
so the script runs in two phases (TPU produce -> CPU replay) connected by
an npz file; invoking it with no arguments drives both via subprocesses.

Run: python scripts/validate_chunk_tpu.py     Exit code 0 = all checks pass.
"""

import os
import subprocess
import sys

STEPS = 24
B = 256
TMP = "build/chunk_validate.npz"


def _cell_fields():
    from pomcpp_tpu.engine.cellular import CellState

    return [f for f in CellState._fields if f != "timestep"]


def _make_inputs():
    import jax
    import jax.numpy as jnp

    from pomcpp_tpu.core.board_gen import random_cell_state

    keys = jax.random.split(jax.random.PRNGKey(123), B)
    csb = jax.vmap(random_cell_state)(keys)
    kick = (jnp.arange(B)[:, None] % 2 == 0) & jnp.ones((B, 4), bool)
    return csb._replace(agent_can_kick=kick)


def phase_tpu() -> int:
    import jax

    # Serialize against other TPU clients on this host (a concurrent
    # second client wedges the axon tunnel; see utils/device_lock.py).
    from pomcpp_tpu.utils.device_lock import hold_tpu_client_lock

    hold_tpu_client_lock()
    jax.config.update("jax_compilation_cache_dir", "build/jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from pomcpp_tpu.engine.pallas_step import (
        pallas_rollout_chunk,
        simple_fsm_state_init,
    )

    csb = _make_inputs()
    out, mrec, drec = pallas_rollout_chunk(
        csb, 99, steps=STEPS, policy="random", record=True
    )
    save = {f"out_{f}": np.asarray(getattr(out, f)) for f in _cell_fields()}
    save["mrec"] = np.asarray(mrec)
    save["drec"] = np.asarray(drec)

    # SimpleAgent FSM path: inject a known rand stream on the REAL TPU and
    # record the kernel FSM's moves; the CPU replay re-runs the XLA FSM on
    # the same rands and must produce the identical move stream.
    rng = np.random.RandomState(4242)
    srands = rng.randint(0, 5, size=(STEPS, B, 4)).astype(np.int32)
    sout, srec, sdrec, _ = pallas_rollout_chunk(
        csb, 42, steps=STEPS, policy="simple", record=True,
        moves=jnp.asarray(srands),
        fsm_state=simple_fsm_state_init(B),
    )
    for f in _cell_fields():
        save[f"sout_{f}"] = np.asarray(getattr(sout, f))
    save["srands"] = srands
    save["srec"] = np.asarray(srec)
    save["sdrec"] = np.asarray(sdrec)

    # Mixed-control mode (the PPO curriculum's kernel config): lane 0 is an
    # injected "learner" stream (inject_slots), lanes 1-3 act via the
    # in-kernel FSM whose rand draws come from the same input's non-override
    # lanes (prng_rand=False so the CPU replay can reproduce them).
    mrng = np.random.RandomState(777)
    merged = mrng.randint(0, 5, size=(STEPS, B, 4)).astype(np.int32)
    merged[:, :, 0] = mrng.randint(0, 6, size=(STEPS, B)).astype(np.int32)
    mout, mxrec, mxdrec, _ = pallas_rollout_chunk(
        csb, 77, steps=STEPS, policy="simple", record=True,
        moves=jnp.asarray(merged),
        fsm_state=simple_fsm_state_init(B),
        inject_slots=(0,),
    )
    for f in _cell_fields():
        save[f"mout_{f}"] = np.asarray(getattr(mout, f))
    save["merged"] = merged
    save["mxrec"] = np.asarray(mxrec)
    save["mxdrec"] = np.asarray(mxdrec)

    # Reset wiring: boards entering the chunk finished must come out fresh.
    one = _make_inputs()
    one = jax.tree.map(lambda x: x[:8], one)
    dead = jnp.zeros((8, 4), bool).at[:, 1:].set(True)
    one = one._replace(agent_dead=dead, alive_count=jnp.ones((8,), jnp.int32))
    fresh = pallas_rollout_chunk(one, 7, steps=1, policy="random")
    for f in _cell_fields():
        save[f"fresh_{f}"] = np.asarray(getattr(fresh, f))
    os.makedirs("build", exist_ok=True)
    np.savez(TMP, **save)
    print(f"tpu phase done on {jax.devices()[0].platform}; wrote {TMP}")
    return 0


def phase_replay() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from pomcpp_tpu.core.constants import (
        C_AGENT0,
        C_BOMB,
        C_PASSAGE,
        C_RIGID,
        C_WOOD,
    )
    from pomcpp_tpu.engine.cellular import cellular_step

    data = np.load(TMP)
    mrec, drec = data["mrec"], data["drec"]
    csb = _make_inputs()

    step_v = jax.jit(jax.vmap(cellular_step))
    cs = csb
    valid = np.ones((B,), bool)
    for t in range(STEPS):
        cs = step_v(cs, jnp.asarray(mrec[t]))
        alive = np.asarray(4 - cs.agent_dead.sum(axis=1))
        done_replay = alive <= 1
        mism = valid & (done_replay != drec[t].astype(bool))
        if mism.any():
            print(f"FAIL: step {t}: done-flag mismatch on boards "
                  f"{np.nonzero(mism)[0][:8]}")
            return 1
        valid &= ~drec[t].astype(bool)

    print(f"boards never reset: {int(valid.sum())}/{B} "
          f"({STEPS} steps, random-with-bombs)")
    if valid.sum() < B // 4:
        print("FAIL: too few never-reset boards; lower STEPS")
        return 1

    bad = []
    for name in _cell_fields():
        a = data[f"out_{name}"][valid]
        b = np.asarray(getattr(cs, name))[valid]
        if not np.array_equal(a, b):
            bad.append(f"{name} ({int((a != b).sum())} cells)")
    if bad:
        print(f"FAIL: final-state mismatch on never-reset boards: {bad}")
        return 1
    print("PASS: kernel final state == cellular replay on never-reset boards")

    # SimpleAgent FSM path: re-run the XLA toolkit FSM on the recorded
    # rand draws; states must match on never-reset boards.
    from pomcpp_tpu.agents.simple import simple_agent_init
    from pomcpp_tpu.agents.simple_cellular import simple_agent_cell_act
    from pomcpp_tpu.strategy.cellular_toolkit import danger_map_cell

    def _joint(cs_, asts, rands):
        dmap = danger_map_cell(cs_)
        ids = jnp.arange(4, dtype=jnp.int32)
        mv, _, a2 = jax.vmap(
            lambda aid, a, rd: simple_agent_cell_act(cs_, aid, a, rd, dmap)
        )(ids, asts, rands)
        return mv, a2

    joint_v = jax.jit(jax.vmap(_joint))
    srands, srec, sdrec = data["srands"], data["srec"], data["sdrec"]
    cs = _make_inputs()
    asts = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B, 4) + x.shape), simple_agent_init()
    )
    valid = np.ones((B,), bool)
    for t in range(STEPS):
        mv, asts = joint_v(cs, asts, jnp.asarray(srands[t]))
        mv = np.asarray(
            jnp.where(cs.agent_dead, 0, mv).astype(jnp.int32)
        )
        mism = valid & (mv != srec[t]).any(axis=1)
        if mism.any():
            print(f"FAIL: simple step {t}: FSM move mismatch on boards "
                  f"{np.nonzero(mism)[0][:8]}")
            return 1
        cs = step_v(cs, jnp.asarray(mv))
        alive = np.asarray(4 - cs.agent_dead.sum(axis=1))
        mism = valid & ((alive <= 1) != sdrec[t].astype(bool))
        if mism.any():
            print(f"FAIL: simple step {t}: done-flag mismatch on "
                  f"{np.nonzero(mism)[0][:8]}")
            return 1
        valid &= ~sdrec[t].astype(bool)
    print(f"simple: boards never reset: {int(valid.sum())}/{B}")
    bad = []
    for name in _cell_fields():
        a = data[f"sout_{name}"][valid]
        b = np.asarray(getattr(cs, name))[valid]
        if not np.array_equal(a, b):
            bad.append(f"{name} ({int((a != b).sum())} cells)")
    if bad:
        print(f"FAIL: simple final-state mismatch: {bad}")
        return 1
    print("PASS: in-kernel FSM trajectory == XLA FSM replay on TPU")

    # Mixed-control replay: toolkit FSM on the merged input's lanes (lane
    # 0's entry doubles as that lane's FSM rand draw, exactly as the kernel
    # consumes it), then lane 0 overridden with the injected learner move.
    merged, mxrec, mxdrec = data["merged"], data["mxrec"], data["mxdrec"]
    cs = _make_inputs()
    asts = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B, 4) + x.shape), simple_agent_init()
    )
    valid = np.ones((B,), bool)
    for t in range(STEPS):
        mv, asts = joint_v(cs, asts, jnp.asarray(merged[t]))
        mv = jnp.asarray(mv).at[:, 0].set(jnp.asarray(merged[t][:, 0]))
        mv = np.asarray(
            jnp.where(cs.agent_dead, 0, mv).astype(jnp.int32)
        )
        mism = valid & (mv != mxrec[t]).any(axis=1)
        if mism.any():
            print(f"FAIL: mixed step {t}: move mismatch on boards "
                  f"{np.nonzero(mism)[0][:8]}")
            return 1
        cs = step_v(cs, jnp.asarray(mv))
        alive = np.asarray(4 - cs.agent_dead.sum(axis=1))
        mism = valid & ((alive <= 1) != mxdrec[t].astype(bool))
        if mism.any():
            print(f"FAIL: mixed step {t}: done-flag mismatch on "
                  f"{np.nonzero(mism)[0][:8]}")
            return 1
        valid &= ~mxdrec[t].astype(bool)
    print(f"mixed: boards never reset: {int(valid.sum())}/{B}")
    bad = []
    for name in _cell_fields():
        a = data[f"mout_{name}"][valid]
        b = np.asarray(getattr(cs, name))[valid]
        if not np.array_equal(a, b):
            bad.append(f"{name} ({int((a != b).sum())} cells)")
    if bad:
        print(f"FAIL: mixed final-state mismatch: {bad}")
        return 1
    print("PASS: mixed-control (inject_slots) kernel == XLA composition")

    # Pipelined reset (r5): a board entering the chunk finished resets at
    # the HEAD of step 0 and the fresh board then PLAYS that step -- the
    # output is a healthy one-step-old game, not a pristine snapshot:
    # all four agents alive (no flames exist on a fresh board, so one
    # step cannot kill), each within one move of its corner, terrain
    # untouched except possible plants, and no flames yet.
    board = data["fresh_board"]
    ok = bool((data["fresh_agent_dead"] == 0).all())
    ok &= bool((data["fresh_alive_count"] == 4).all())
    corners = [(0, 0), (10, 0), (10, 10), (0, 10)]
    ax, ay = data["fresh_agent_x"], data["fresh_agent_y"]
    for i, (cx, cy) in enumerate(corners):
        manh = np.abs(ax[:, i] - cx) + np.abs(ay[:, i] - cy)
        ok &= bool((manh <= 1).all())
    allowed = {C_PASSAGE, C_RIGID, C_WOOD, C_BOMB,
               C_AGENT0, C_AGENT0 + 1, C_AGENT0 + 2, C_AGENT0 + 3}
    ok &= set(np.unique(board)) <= allowed
    ok &= set(np.unique(data["fresh_bomb_timer"])) <= {0, 10}
    ok &= bool((data["fresh_flame_timer"] == 0).all())
    if not ok:
        print("FAIL: auto-reset did not produce fresh (one-step-old) boards")
        return 1
    print("PASS: auto-reset produces fresh boards (played one step, "
          "pipelined-reset semantics)")
    return 0


def main() -> int:
    # Prepend the repo; PRESERVE the existing PYTHONPATH (/root/.axon_site
    # carries the sitecustomize that registers the axon TPU plugin).
    env = dict(
        os.environ,
        PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH", ""),
    )
    for phase in ("tpu", "replay"):
        r = subprocess.run(
            [sys.executable, __file__, f"--phase={phase}"], env=env
        )
        if r.returncode:
            return r.returncode
    return 0


if __name__ == "__main__":
    if "--phase=tpu" in sys.argv:
        sys.exit(phase_tpu())
    elif "--phase=replay" in sys.argv:
        sys.exit(phase_replay())
    sys.exit(main())
