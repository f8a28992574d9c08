"""Cellular engine vs exact engine: per-step equivalence.

Strategy: sample states along EXACT-engine trajectories (random moves,
several seeds, kick on/off), and for every step compare
``cellular_step(from_state(s), mv)`` against ``from_state(step(s, mv))`` in
plane space.  The documented divergence classes (cellular.py header) are
rare; the suite asserts a minimum match rate on random play and exact
matches on the basic scenario tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pomcpp_tpu.core.board_gen import init_state_np
from pomcpp_tpu.core.constants import (
    C_AGENT0,
    C_BOMB,
    C_FLAME,
    C_PASSAGE,
    C_RIGID,
    C_WOOD,
    M_BOMB,
    M_DOWN,
    M_IDLE,
    M_LEFT,
    M_RIGHT,
    M_UP,
)
from pomcpp_tpu.core.state import empty_state, plant_bomb, put_agent, put_item
from pomcpp_tpu.engine.cellular import CellState, cellular_step, from_state
from pomcpp_tpu.engine.step import step

_jstep = jax.jit(step)
_jcell = jax.jit(cellular_step)


def _diff(a: CellState, b: CellState) -> list[str]:
    out = []
    for name in CellState._fields:
        if name == "timestep":
            continue
        av = np.asarray(getattr(a, name))
        bv = np.asarray(getattr(b, name))
        if not np.array_equal(av, bv):
            idx = np.nonzero(av != bv)[0][:6]
            out.append(f"{name}@{idx}: {av[idx]} != {bv[idx]}")
    return out


def _check_exact(s, moves_list):
    """Assert cellular == exact for every step of the scenario."""
    for t, mv in enumerate(moves_list):
        mv = jnp.asarray(mv, jnp.int32)
        s2 = _jstep(s, mv)
        c2 = _jcell(from_state(s), mv)
        d = _diff(from_state(s2), c2)
        assert not d, f"step {t}: " + "; ".join(d)
        s = s2
    return s


# --- Exact scenario coverage -------------------------------------------------


def test_basic_movement_and_block():
    s = empty_state()
    s = put_agent(s, 0, 0, 0)
    s = put_agent(s, 5, 5, 1)
    s = put_agent(s, 10, 10, 2)
    s = put_agent(s, 3, 7, 3)
    s = put_item(s, 6, 5, C_RIGID)
    s = put_item(s, 5, 6, C_WOOD)
    _check_exact(
        s,
        [
            [M_DOWN, M_RIGHT, M_UP, M_LEFT],
            [M_RIGHT, M_DOWN, M_LEFT, M_UP],
            [M_IDLE, M_LEFT, M_DOWN, M_RIGHT],
        ],
    )


def test_destination_collision():
    s = empty_state()
    s = put_agent(s, 4, 5, 0)
    s = put_agent(s, 6, 5, 1)
    s = put_agent(s, 0, 0, 2)
    s = put_agent(s, 10, 10, 3)
    _check_exact(s, [[M_RIGHT, M_LEFT, M_IDLE, M_IDLE]] * 2)


def test_switch_move_blocked():
    s = empty_state()
    s = put_agent(s, 4, 5, 0)
    s = put_agent(s, 5, 5, 1)
    s = put_agent(s, 0, 0, 2)
    s = put_agent(s, 10, 10, 3)
    _check_exact(s, [[M_RIGHT, M_LEFT, M_IDLE, M_IDLE]])


def test_chain_movement():
    s = empty_state()
    s = put_agent(s, 2, 5, 0)
    s = put_agent(s, 3, 5, 1)
    s = put_agent(s, 4, 5, 2)
    s = put_agent(s, 10, 10, 3)
    _check_exact(s, [[M_RIGHT, M_RIGHT, M_RIGHT, M_IDLE]])


def test_ouroboros_rotation():
    s = empty_state()
    s = put_agent(s, 5, 5, 0)
    s = put_agent(s, 6, 5, 1)
    s = put_agent(s, 6, 6, 2)
    s = put_agent(s, 5, 6, 3)
    _check_exact(s, [[M_RIGHT, M_DOWN, M_LEFT, M_UP]] * 3)


def test_bomb_explosion_and_flames():
    s = empty_state()
    s = put_agent(s, 0, 0, 0)
    s = put_agent(s, 5, 5, 1)
    s = put_agent(s, 10, 10, 2)
    s = put_agent(s, 0, 10, 3)
    moves = [[M_BOMB, M_IDLE, M_IDLE, M_IDLE]]
    moves += [[M_RIGHT, M_IDLE, M_IDLE, M_IDLE]]
    moves += [[M_IDLE, M_IDLE, M_IDLE, M_IDLE]] * 14
    _check_exact(s, moves)


def test_wood_burn_reveals_powerup():
    s = empty_state()
    s = put_agent(s, 0, 0, 0)
    s = put_agent(s, 10, 0, 1)
    s = put_agent(s, 10, 10, 2)
    s = put_agent(s, 0, 10, 3)
    s = put_item(s, 1, 0, C_WOOD)
    s = s._replace(hidden_pow=s.hidden_pow.at[1].set(1))
    moves = [[M_BOMB, M_IDLE, M_IDLE, M_IDLE]]
    moves += [[M_DOWN, M_IDLE, M_IDLE, M_IDLE]]
    moves += [[M_IDLE, M_IDLE, M_IDLE, M_IDLE]] * 14
    _check_exact(s, moves)


def test_chained_explosion():
    s = empty_state()
    s = put_agent(s, 0, 0, 0)
    s = put_agent(s, 4, 0, 1)
    s = put_agent(s, 10, 10, 2)
    s = put_agent(s, 0, 10, 3)
    s = s._replace(agent_strength=s.agent_strength.at[0].set(4))
    # Bomb A at (2,0) via direct plant; bomb B at (3,0): when A explodes,
    # its ray detonates B.
    s = plant_bomb(s, 2, 0, 0, set_item=True, life=3)
    s = plant_bomb(s, 3, 0, 1, set_item=True, life=9)
    _check_exact(s, [[M_IDLE] * 4] * 10)


def test_kick_and_slide():
    s = empty_state()
    s = put_agent(s, 2, 5, 0)
    s = put_agent(s, 0, 0, 1)
    s = put_agent(s, 10, 10, 2)
    s = put_agent(s, 0, 10, 3)
    s = s._replace(agent_can_kick=s.agent_can_kick.at[0].set(True))
    s = plant_bomb(s, 3, 5, 1, set_item=True, life=9)
    moves = [[M_RIGHT, M_IDLE, M_IDLE, M_IDLE]]  # kick the bomb rightward
    moves += [[M_IDLE, M_IDLE, M_IDLE, M_IDLE]] * 8
    _check_exact(s, moves)


def test_kick_blocked_bounce_back():
    s = empty_state()
    s = put_agent(s, 2, 5, 0)
    s = put_agent(s, 0, 0, 1)
    s = put_agent(s, 10, 10, 2)
    s = put_agent(s, 0, 10, 3)
    s = s._replace(agent_can_kick=s.agent_can_kick.at[0].set(True))
    s = plant_bomb(s, 3, 5, 1, set_item=True, life=9)
    s = put_item(s, 4, 5, C_RIGID)  # kick target blocked
    _check_exact(s, [[M_RIGHT, M_IDLE, M_IDLE, M_IDLE], [M_IDLE] * 4])


def test_walk_onto_bomb_without_kick_bounces():
    s = empty_state()
    s = put_agent(s, 2, 5, 0)
    s = put_agent(s, 0, 0, 1)
    s = put_agent(s, 10, 10, 2)
    s = put_agent(s, 0, 10, 3)
    s = plant_bomb(s, 3, 5, 1, set_item=True, life=9)
    _check_exact(s, [[M_RIGHT, M_IDLE, M_IDLE, M_IDLE], [M_IDLE] * 4])


def test_walk_into_flame_dies():
    s = empty_state()
    s = put_agent(s, 0, 0, 0)
    s = put_agent(s, 3, 0, 1)
    s = put_agent(s, 10, 10, 2)
    s = put_agent(s, 0, 10, 3)
    from pomcpp_tpu.engine.flames import spawn_flame

    s = spawn_flame(s, 1, 1, 1)
    _check_exact(s, [[M_DOWN, M_IDLE, M_IDLE, M_IDLE], [M_IDLE] * 4])


# --- Random-trajectory match rate --------------------------------------------


# Shared with scripts/divergence_census.py (which measures real-play
# frequency per class); kept importable from the package.
from pomcpp_tpu.testing.divergence import divergence_classes as _divergence_classes  # noqa: E402,E501


@pytest.mark.parametrize("seed,kick", [(1, False), (2, True), (3, True), (0x1337, False)])
def test_random_trajectory_equivalence(seed, kick):
    steps = 100
    rng = np.random.RandomState(seed)
    s = init_state_np(seed)
    if kick:
        s = s._replace(agent_can_kick=jnp.ones((4,), bool))
    mismatch = 0
    for t in range(steps):
        mv = jnp.asarray(rng.randint(0, 6, size=4), jnp.int32)
        s2 = _jstep(s, mv)
        c2 = _jcell(from_state(s), mv)
        d = _diff(from_state(s2), c2)
        if d:
            mismatch += 1
            # Every mismatched step must be attributable to a documented
            # divergence class; anything else is a new bug.
            classes = _divergence_classes(from_state(s), mv, from_state(s2))
            assert classes, (
                f"step {t}: unclassified cellular/exact mismatch "
                f"(no documented divergence precondition held): {d[:4]}"
            )
        s = s2
        if int(s.alive_count) <= 1:
            break
    # Divergence preconditions are exotic; random play must match almost always.
    assert mismatch <= max(2, t // 50), f"{mismatch} mismatched steps of {t + 1}"
