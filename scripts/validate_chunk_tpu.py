"""On-TPU validation of the benched path: pallas_rollout_chunk with its
in-kernel PRNG + auto-reset, replayed through the cellular engine.

The chunk kernel records the moves it draws and the per-step done mask
(record=True); the recorded move stream is then replayed through
``cellular_step`` on CPU.  Boards that never auto-reset must match the
kernel's final state bit-exactly; the recorded done flags must agree with
the replay's alive counts while each board is still on its first episode.
A second pass checks the reset wiring itself: a board entering the chunk
already finished must come out as a fresh corner-start board.

Run: python scripts/validate_chunk_tpu.py   (wants the axon TPU; CPU works
too but takes the interpret path timing).  Exit code 0 = all checks pass.
"""

import sys

import jax

jax.config.update("jax_platforms", "axon,cpu")
jax.config.update("jax_compilation_cache_dir", "build/jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pomcpp_tpu.core.board_gen import random_cell_state  # noqa: E402
from pomcpp_tpu.core.constants import (  # noqa: E402
    C_AGENT0,
    C_PASSAGE,
    C_RIGID,
    C_WOOD,
)
from pomcpp_tpu.engine.cellular import CellState, cellular_step  # noqa: E402
from pomcpp_tpu.engine.pallas_step import pallas_rollout_chunk  # noqa: E402

STEPS = 24
B = 256


def main() -> int:
    cpu = jax.devices("cpu")[0]
    keys = jax.random.split(jax.random.PRNGKey(123), B)
    with jax.default_device(cpu):
        csb = jax.vmap(random_cell_state)(keys)
        # Kick for half the batch so slide/bounce paths execute.
        kick = (jnp.arange(B)[:, None] % 2 == 0) & jnp.ones((B, 4), bool)
        csb = csb._replace(agent_can_kick=kick)
    csb_dev = jax.device_put(csb, jax.devices()[0])

    out, mrec, drec = pallas_rollout_chunk(
        csb_dev, 99, steps=STEPS, policy="random", record=True
    )
    out = jax.device_get(out)
    mrec = np.asarray(jax.device_get(mrec))
    drec = np.asarray(jax.device_get(drec))

    # Replay on CPU through the cellular engine.
    with jax.default_device(cpu):
        step_v = jax.jit(jax.vmap(cellular_step))
        cs = csb
        valid = np.ones((B,), bool)  # board still on its first episode
        for t in range(STEPS):
            cs = step_v(cs, jnp.asarray(mrec[t]))
            alive = np.asarray(4 - cs.agent_dead.sum(axis=1))
            done_replay = alive <= 1
            mism = valid & (done_replay != drec[t])
            if mism.any():
                print(f"FAIL: step {t}: done-flag mismatch on boards "
                      f"{np.nonzero(mism)[0][:8]}")
                return 1
            valid &= ~drec[t]

    print(f"boards never reset: {int(valid.sum())}/{B} "
          f"(coverage {STEPS} steps, random-with-bombs)")
    if valid.sum() < B // 4:
        print("FAIL: too few never-reset boards for a meaningful final-state "
              "comparison; lower STEPS")
        return 1

    bad = []
    for name in CellState._fields:
        if name == "timestep":
            continue
        a = np.asarray(getattr(out, name))[valid]
        b = np.asarray(getattr(cs, name))[valid]
        if not np.array_equal(a, b):
            n = int((~np.isclose(a, b)).sum()) if a.dtype.kind == "f" else int(
                (a != b).sum()
            )
            bad.append(f"{name} ({n} cells)")
    if bad:
        print(f"FAIL: final-state mismatch on never-reset boards: {bad}")
        return 1
    print("PASS: kernel final state == cellular replay on all never-reset boards")

    # Reset wiring: a pre-finished board must come out fresh.
    with jax.default_device(cpu):
        one = jax.vmap(random_cell_state)(
            jax.random.split(jax.random.PRNGKey(5), 8)
        )
        dead = jnp.zeros((8, 4), bool).at[:, 1:].set(True)  # all boards done
        one = one._replace(
            agent_dead=dead, alive_count=jnp.ones((8,), jnp.int32)
        )
    fresh = jax.device_get(
        pallas_rollout_chunk(
            jax.device_put(one, jax.devices()[0]), 7, steps=1, policy="random"
        )
    )
    board = np.asarray(fresh.board)
    ok = True
    ok &= bool((np.asarray(fresh.agent_dead) == False).all())  # noqa: E712
    ok &= bool((np.asarray(fresh.alive_count) == 4).all())
    corner_cells = [0, 10, 120, 110]
    for i, c in enumerate(corner_cells):
        ok &= bool((board[:, c] == C_AGENT0 + i).all())
    interior = np.ones(121, bool)
    interior[corner_cells] = False
    allowed = {C_PASSAGE, C_RIGID, C_WOOD}
    ok &= set(np.unique(board[:, interior])) <= allowed
    ok &= bool((np.asarray(fresh.bomb_timer) == 0).all())
    ok &= bool((np.asarray(fresh.flame_timer) == 0).all())
    if not ok:
        print("FAIL: auto-reset did not produce fresh corner-start boards")
        return 1
    print("PASS: auto-reset produces fresh corner-start boards")
    return 0


if __name__ == "__main__":
    sys.exit(main())
