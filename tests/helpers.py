"""Shared helpers for the conformance suite (mirrors the reference test
utilities REQUIRE_AGENT / SeveralSteps / PlaceBombsHorizontally in
unit_test/bboard/board_logic.cpp:11-46)."""

import jax
import jax.numpy as jnp

from pomcpp_tpu import empty_state, step
from pomcpp_tpu.core.constants import (
    C_AGENT0,
    M_BOMB,
    M_DOWN,
    M_IDLE,
    M_LEFT,
    M_RIGHT,
    M_UP,
)
from pomcpp_tpu.core.state import (
    cell_index,
    kill_many,
    plant_bomb,
    put_agent,
    put_agents_in_corners,
    put_item,
    set_bomb_field,
)
from pomcpp_tpu.engine.flames import spawn_flame

STEP = jax.jit(step)
SPAWN_FLAME = jax.jit(spawn_flame)

__all__ = [
    "STEP",
    "SPAWN_FLAME",
    "empty_state",
    "put_agent",
    "put_agents_in_corners",
    "put_item",
    "plant_bomb",
    "kill_many",
    "set_bomb_field",
    "cell_index",
    "moves",
    "several_steps",
    "place_bombs_horizontally",
    "require_agent",
    "board_at",
    "C_AGENT0",
    "M_IDLE",
    "M_UP",
    "M_DOWN",
    "M_LEFT",
    "M_RIGHT",
    "M_BOMB",
]


def moves(m0=M_IDLE, m1=M_IDLE, m2=M_IDLE, m3=M_IDLE):
    return jnp.asarray([m0, m1, m2, m3], jnp.int32)


def several_steps(n, state, m):
    for _ in range(n):
        state = STEP(state, m)
    return state


def place_bombs_horizontally(state, agent, bombs):
    """Plant a bomb, step right, repeat (board_logic.cpp:34-46)."""
    for _ in range(bombs):
        m = [M_IDLE] * 4
        m[agent] = M_BOMB
        state = STEP(state, moves(*m))
        m[agent] = M_RIGHT
        state = STEP(state, moves(*m))
    return state


def board_at(state, x, y):
    return int(state.board[cell_index(x, y)])


def require_agent(state, agent, x, y):
    """REQUIRE_AGENT (board_logic.cpp:11-17): AgentInfo and board coherence."""
    assert int(state.agent_x[agent]) == x, (
        f"agent {agent} x: {int(state.agent_x[agent])} != {x}"
    )
    assert int(state.agent_y[agent]) == y, (
        f"agent {agent} y: {int(state.agent_y[agent])} != {y}"
    )
    assert board_at(state, x, y) == C_AGENT0 + agent, (
        f"board({x},{y}) = {board_at(state, x, y)} != agent {agent}"
    )
