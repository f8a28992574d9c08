"""Exhaustive TWO-step conformance on kick-heavy states (VERDICT r2 item 3).

The hardest step semantics -- optimistic move onto a bomb, phase-2
bounce-back with chain reversion (step.cpp:170-184 -> step_utility.cpp:
62-128) -- leave state (stopped bombs, restored cells, standing-on-bomb
agents) whose consequences only manifest on the NEXT step.  The 1-step
sweep (test_exhaustive_moves.py) cannot see those pairs.

Full 6^4 x 6^4 is 1.7M oracle sequences; the principled pruning: reversion
chains are built from pairwise agent/bomb interactions, so we sweep ALL
36 x 36 two-step joint-move pairs of the two agents that can interact
(other agents dead), on hand-built micro-scenarios that put every kick
mechanism in range -- slide corridors, standing-on-bomb, bomb-bomb
collision, kick-into-flames, edge bounce, short timers.  Each scenario is
exhaustive over its interaction (1296 sequences), diffed bit-for-bit
against the unmodified reference via the oracle's ``loadenum2`` mode.
Longer chains (3-4 agents) are covered by the ported kick zoo
(board_logic.cpp:474-659 -> test_board_logic.py) and the 1-step sweep.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pomcpp_tpu.engine.cellular import CellState, cellular_step, from_state
from pomcpp_tpu.engine.step import step
from pomcpp_tpu.testing import oracle as orc

from helpers import (  # noqa: F401
    SPAWN_FLAME,
    empty_state,
    kill_many,
    plant_bomb,
    put_agent,
    put_item,
)
from pomcpp_tpu.core.constants import C_RIGID, C_WOOD

pytestmark = pytest.mark.skipif(
    orc.ensure_oracle() is None, reason="reference oracle not buildable"
)

A, B = 0, 1  # the interacting agents; 2 and 3 are dead in every scenario


def _base(kick_a=True, kick_b=True):
    s = kill_many(empty_state(), 2, 3)
    kick = jnp.asarray([kick_a, kick_b, False, False])
    return s._replace(agent_can_kick=kick)


def _scenarios():
    out = {}

    # 1. Slide corridor: bomb kickable right down an open row with B in
    # the path; covers kick-slide, walk-into-sliding-bomb, B counter-kick.
    s = _base()
    s = put_agent(s, 2, 5, A)
    s = plant_bomb(s, 3, 5, A, set_item=True)
    s = put_agent(s, 6, 5, B)
    out["corridor"] = s

    # 2. Standing-on-bomb + no-kick optimistic bounce-back: A sits ON its
    # own bomb, B (no kick) walks into it -> phase-2 reversion; next step
    # replays from the reverted state.
    s = _base(kick_a=False, kick_b=False)
    s = plant_bomb(s, 4, 4, A, set_item=True)
    s = put_agent(s, 4, 4, A)
    s = put_agent(s, 5, 4, B)
    out["standing_no_kick"] = s

    # 3. Bomb-bomb collision: kicking A's bomb right hits B's parked bomb
    # (kicker chain reversion, ResolveBombCollision); B sits beyond it.
    s = _base()
    s = put_agent(s, 2, 3, A)
    s = plant_bomb(s, 3, 3, A, set_item=True)
    s = plant_bomb(s, 6, 3, B, set_item=True)
    s = put_agent(s, 7, 3, B)
    out["bomb_bomb"] = s

    # 4. Kick into flames: a live flame cross two cells down the kick
    # path (kicked bomb detonates on contact, step.cpp:269-272); B can
    # also walk into the flames or kick from below.
    s = _base()
    s = put_agent(s, 2, 7, A)
    s = plant_bomb(s, 3, 7, A, set_item=True)
    s = SPAWN_FLAME(s, 5, 7, 1)
    s = put_agent(s, 3, 8, B)
    out["kick_into_flames"] = s

    # 5. Edge block + switch moves: bomb against the right edge (kick
    # target OOB -> direction reset same step), A and B adjacent for
    # switch-move / DP-collision interplay next to the blocked bomb.
    s = _base()
    s = put_agent(s, 8, 2, A)
    s = plant_bomb(s, 9, 2, A, set_item=True)
    s = put_agent(s, 9, 3, B)
    s = put_item(s, 9, 1, C_WOOD)
    out["edge_block"] = s

    # 6. Short timers: bombs that explode inside the 2-step window while
    # kicks/moves are in flight (slide + TickBombs ordering).
    s = _base()
    s = put_agent(s, 4, 6, A)
    s = plant_bomb(s, 5, 6, A, set_item=True, life=2)
    s = put_agent(s, 7, 6, B)
    s = plant_bomb(s, 7, 5, B, set_item=True, life=3)
    s = put_item(s, 6, 7, C_RIGID)
    out["short_timers"] = s

    return out


def _sweep_moves():
    """moves[step t][code] -> i32[1296, 4] matching the oracle's order."""
    code = np.arange(1296)
    c1, c2 = code % 36, code // 36
    mv = np.zeros((2, 1296, 4), np.int64)
    mv[0, :, A], mv[0, :, B] = c1 % 6, c1 // 6
    mv[1, :, A], mv[1, :, B] = c2 % 6, c2 // 6
    return jnp.asarray(mv, jnp.int32)


_JSTEP2 = jax.jit(
    jax.vmap(lambda s, m1, m2: step(step(s, m1), m2))
)


@pytest.mark.parametrize("name", list(_scenarios()))
def test_exhaustive_two_step_parity(name):
    s = _scenarios()[name]
    base_dump, dumps = orc.enum2_pair(orc.state_to_dump(s), A, B)

    # The oracle echoes the injected state back: serializer round-trip.
    d = orc.diff_dumps(base_dump, orc.state_to_dump(s))
    assert not d, "state injection diverged: " + "; ".join(d[:5])

    mv = _sweep_moves()
    batched = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (1296,) + x.shape), s
    )
    out = _JSTEP2(batched, mv[0], mv[1])

    bad = []
    for c in range(1296):
        one = jax.tree.map(lambda x: x[c], out)
        diff = orc.diff_dumps(dumps[c], orc.state_to_dump(one))
        if diff:
            c1, c2 = c % 36, c // 36
            bad.append((
                (c1 % 6, c1 // 6), (c2 % 6, c2 // 6), diff[:3]
            ))
    assert not bad, (
        f"{name}: {len(bad)}/1296 two-step sequences diverge; "
        f"first: {bad[:3]}"
    )


@pytest.mark.parametrize("name", ["corridor", "standing_no_kick"])
def test_exhaustive_two_step_cellular(name):
    """Cellular engine on the same 2-step sweep: bounded, documented
    divergence (see engine/cellular.py header)."""
    s = _scenarios()[name]
    cs = from_state(s)
    mv = _sweep_moves()

    batched_s = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (1296,) + x.shape), s
    )
    batched_c = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (1296,) + x.shape), cs
    )
    ref = jax.jit(jax.vmap(
        lambda a, m1, m2: from_state(step(step(a, m1), m2))
    ))(batched_s, mv[0], mv[1])
    got = jax.jit(jax.vmap(
        lambda a, m1, m2: cellular_step(cellular_step(a, m1), m2)
    ))(batched_c, mv[0], mv[1])

    mismatch = 0
    for fname in CellState._fields:
        if fname == "timestep":
            continue
        a = np.asarray(getattr(ref, fname)).reshape(1296, -1)
        b = np.asarray(getattr(got, fname)).reshape(1296, -1)
        mismatch = max(mismatch, int((a != b).any(axis=1).sum()))
    assert mismatch <= 60, f"{name}: {mismatch}/1296 sequences diverge"
