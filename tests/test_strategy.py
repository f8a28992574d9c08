"""Strategy toolkit tests (port of unit_test/bboard/strategy_test.cpp plus
extra unit coverage for the danger model and direction sorting)."""

import jax
import jax.numpy as jnp
import numpy as np

from pomcpp_tpu.core.board_gen import init_board_items_np
from pomcpp_tpu.core.constants import (
    C_EXTRABOMB,
    C_RIGID,
    M_DOWN,
    M_IDLE,
    M_LEFT,
    M_RIGHT,
    M_UP,
)
from pomcpp_tpu.core.state import empty_state, kill_many, plant_bomb, put_agent, put_item
from pomcpp_tpu.strategy import (
    fill_rmap,
    is_adjacent_enemy,
    is_in_danger,
    is_reachable,
    move_towards_enemy,
    move_towards_position,
    move_towards_powerup,
    safe_directions,
)


def _seeded_state(seed):
    board, hidden = init_board_items_np(seed)
    s = empty_state()
    return s._replace(board=jnp.asarray(board), hidden_pow=jnp.asarray(hidden))


def test_is_adjacent_enemy_close():
    s = empty_state()
    s = put_agent(s, 5, 5, 0)
    s = put_agent(s, 4, 4, 1)
    assert bool(is_adjacent_enemy(s, 0, 2))
    assert bool(is_adjacent_enemy(s, 0, 3))


def test_is_adjacent_enemy_far():
    s = empty_state()
    s = put_agent(s, 5, 5, 0)
    s = put_agent(s, 3, 2, 1)
    for d in range(5):
        assert not bool(is_adjacent_enemy(s, 0, d))


def test_fill_rmap_rigid_unreachable():
    # strategy_test.cpp:31-59, seed 0x13327.
    s = _seeded_state(0x13327)
    s = kill_many(s, 1, 2, 3)
    s = put_agent(s, 0, 0, 0)
    r = jax.jit(fill_rmap)(s, 0)
    board = np.asarray(s.board)
    for c in range(121):
        if board[c] == C_RIGID:
            assert not bool(is_reachable(r, c)), f"rigid cell {c} reachable"


def test_move_towards_position():
    # strategy_test.cpp:66-79, seed 0x1337, agent at (4,5).
    s = _seeded_state(0x1337)
    s = kill_many(s, 1, 2, 3)
    s = put_agent(s, 4, 5, 0)
    r = jax.jit(fill_rmap)(s, 0)
    assert int(move_towards_position(r, 4 + 11 * 1)) == M_UP
    assert int(move_towards_position(r, 3 + 11 * 6)) == M_DOWN
    assert int(move_towards_position(r, 0 + 11 * 10)) == M_DOWN


def test_move_towards_powerup():
    s = _seeded_state(0x1337)
    s = kill_many(s, 1, 2, 3)
    s = put_agent(s, 4, 5, 0)
    s = put_item(s, 2, 6, C_EXTRABOMB)
    r = jax.jit(fill_rmap)(s, 0)
    assert int(move_towards_powerup(s, r, 2)) == M_IDLE
    assert int(move_towards_powerup(s, r, 3)) == M_DOWN


def test_move_towards_enemy():
    s = _seeded_state(0x1337)
    s = kill_many(s, 2, 3)
    s = put_agent(s, 4, 5, 0)
    s = put_agent(s, 2, 6, 1)
    r = jax.jit(fill_rmap)(s, 0)
    assert int(move_towards_enemy(s, r, 2)) == M_IDLE
    assert int(move_towards_enemy(s, r, 3)) == M_DOWN


def test_is_in_danger_cross_and_timer():
    s = empty_state()
    s = put_agent(s, 5, 5, 0)
    s = s._replace(agent_strength=s.agent_strength.at[0].set(2))
    s = plant_bomb(s, 5, 5, 0, set_item=False, life=7)
    # In the cross with stored strength 2.
    assert int(is_in_danger(s, 5, 5)) == 7
    assert int(is_in_danger(s, 7, 5)) == 7
    assert int(is_in_danger(s, 5, 3)) == 7
    # Outside the cross.
    assert int(is_in_danger(s, 8, 5)) == 0
    assert int(is_in_danger(s, 6, 6)) == 0


def test_safe_directions_order_and_safety():
    s = empty_state()
    s = put_agent(s, 5, 5, 0)
    # Bomb two to the right with strength 1: (6,5) not covered, safe.
    moves, count = safe_directions(s, 5, 5)
    assert int(count) == 4
    assert [int(m) for m in np.asarray(moves)] == [M_RIGHT, M_LEFT, M_DOWN, M_UP]

    # Wall left of agent blocks LEFT.
    s2 = put_item(s, 4, 5, C_RIGID)
    moves, count = safe_directions(s2, 5, 5)
    assert int(count) == 3
    assert [int(m) for m in np.asarray(moves)[:3]] == [M_RIGHT, M_DOWN, M_UP]

    # A bomb with timer 1 at (7,5), strength 2 covers (6,5): RIGHT unsafe.
    s3 = put_agent(s, 7, 5, 1)
    s3 = s3._replace(agent_strength=s3.agent_strength.at[1].set(2))
    s3 = plant_bomb(s3, 7, 5, 1, set_item=True, life=1)
    moves, count = safe_directions(s3, 5, 5)
    assert int(count) == 3
    assert [int(m) for m in np.asarray(moves)[:3]] == [M_LEFT, M_DOWN, M_UP]
