"""SimpleAgent: the reference's heuristic FSM as a jittable stateful policy.

Reference: src/agents/simple_agent.cpp:12-139, include/agents.hpp:55-76.
The decision cascade (_Decide, simple_agent.cpp:51-115):

  1. in danger -> MoveTowardsSafePlace if that move is itself walkable and
     safe(min=2); else "_MoveSafeOneSpace" (random of first two sorted safe
     directions);
  2. bomb available: enemy at manhattan<=1 -> BOMB; enemy<=7 and a recent-
     position loop -> uniform random direction; enemy<=7 -> approach if the
     step is walkable and safe(min=5); wood adjacent -> BOMB;
  3. else random choice among the first two sorted safe directions.

Replicated state quirks:
* ``moveQueue`` slots persist across acts (only ``count`` is reset,
  simple_agent.cpp:88/103); the final pick reads slot ``draw % 2`` even when
  only one move was appended, exposing a stale slot.  Slots start zeroed
  (= the oracle build's -ftrivial-auto-var-init=zero).
* ``recentPositions`` is a 4-entry ring of *desired* (not actual) positions
  (simple_agent.cpp:116-129); the loop check compares logical entries i and
  i+2, where i+2 may read a stale slot for count < 4 (_HasRPLoop,
  simple_agent.cpp:24-35).
* Each act consumes at most ONE rng draw (``intDist(0,4)``), and only on the
  paths that reach a random pick; the caller passes the next draw in and is
  told whether it was consumed (host parity threads a real mt19937_64
  stream; on-device play burns one jax.random draw per act).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.constants import AGENT_COUNT, BOARD_SIZE, C_WOOD, M_BOMB, M_IDLE
from ..core.state import I32, State, is_walkable
from ..engine.util import desired_position
from ..strategy import (
    fill_rmap,
    is_adjacent_enemy,
    is_adjacent_item,
    is_in_danger,
    move_towards_enemy,
    move_towards_safe_place,
    safe_condition,
    safe_directions,
    sort_directions,
)


class SimpleAgentState(NamedTuple):
    """Persistent per-agent FSM state (agents.hpp:64-71)."""

    rp_x: jax.Array      # i32[4] recent desired positions ring
    rp_y: jax.Array      # i32[4]
    rp_head: jax.Array   # i32
    rp_count: jax.Array  # i32
    mq_slots: jax.Array  # i32[4] persistent moveQueue slots (head is always 0)


def simple_agent_init() -> SimpleAgentState:
    z = jnp.zeros((4,), I32)
    return SimpleAgentState(
        rp_x=z, rp_y=z, rp_head=jnp.zeros((), I32),
        rp_count=jnp.zeros((), I32), mq_slots=z,
    )


def _has_rp_loop(ast: SimpleAgentState) -> jax.Array:
    """_HasRPLoop (simple_agent.cpp:24-35): rp[i] == rp[i+2] for i < count/2.

    Vacuously true for count < 2; i+2 wraps physically (stale slots for
    count < 4), exactly like FixedQueue::operator[].
    """
    i = jnp.arange(2)
    li = (ast.rp_head + i) % 4
    lj = (ast.rp_head + i + 2) % 4
    active = i < ast.rp_count // 2
    eq = (ast.rp_x[li] == ast.rp_x[lj]) & (ast.rp_y[li] == ast.rp_y[lj])
    return jnp.all(eq | ~active)


def _walkable_at(state: State, x, y):
    inb = (x >= 0) & (y >= 0) & (x < BOARD_SIZE) & (y < BOARD_SIZE)
    c = jnp.clip(x + BOARD_SIZE * y, 0, BOARD_SIZE * BOARD_SIZE - 1)
    return inb, inb & is_walkable(state.board[c])


def simple_agent_act(state: State, agent_id, ast: SimpleAgentState, rand):
    """One decision.  ``rand`` is the next intDist(0,4) draw.

    Returns ``(move, consumed, new_agent_state)``.
    """
    ax = state.agent_x[agent_id]
    ay = state.agent_y[agent_id]
    r = fill_rmap(state, agent_id)
    danger = is_in_danger(state, ax, ay)

    # --- Path A: flee danger (simple_agent.cpp:57-71) ---
    in_danger = danger > 0
    m_safe = move_towards_safe_place(state, r, danger)
    sx, sy = desired_position(ax, ay, m_safe)
    _, walkable = _walkable_at(state, sx, sy)
    a_ok = in_danger & walkable & safe_condition(
        is_in_danger(state, sx, sy), 2
    )
    a_else = in_danger & ~a_ok

    # --- Shared moveQueue recompute (paths A-else and C) ---
    new_moves, mq_count = safe_directions(state, ax, ay)
    # Overlay fresh moves onto the persistent slots (count was reset to 0;
    # slots beyond the new count keep their previous contents).
    k = jnp.arange(4)
    slots = jnp.where(k < mq_count, new_moves, ast.mq_slots)
    slots, mq_count = sort_directions(
        slots, mq_count, ast.rp_x, ast.rp_y, ast.rp_head, ast.rp_count, ax, ay
    )
    mq_empty = mq_count == 0
    m_queue = jnp.where(mq_empty, M_IDLE, slots[jnp.clip(rand % 2, 0, 3)])

    # --- Path B: aggression (simple_agent.cpp:73-101) ---
    can_bomb = state.agent_bomb_count[agent_id] < state.agent_max_bombs[agent_id]
    adj1 = is_adjacent_enemy(state, agent_id, 1)
    adj7 = is_adjacent_enemy(state, agent_id, 7)
    rp_loop = _has_rp_loop(ast)
    m_enemy = move_towards_enemy(state, r, 7)
    ex, ey = desired_position(ax, ay, m_enemy)
    _, e_walk = _walkable_at(state, ex, ey)
    b3_ok = e_walk & safe_condition(is_in_danger(state, ex, ey), 5)
    wood_adj = is_adjacent_item(state, agent_id, 1, C_WOOD)

    b1 = ~in_danger & can_bomb & adj1
    b2 = ~in_danger & can_bomb & ~b1 & adj7 & rp_loop
    b3 = ~in_danger & can_bomb & ~b1 & ~b2 & adj7 & b3_ok
    b4 = ~in_danger & can_bomb & ~b1 & ~b2 & ~b3 & wood_adj
    c_path = ~in_danger & ~b1 & ~b2 & ~b3 & ~b4

    move = jnp.where(
        a_ok, m_safe,
        jnp.where(
            a_else, m_queue,
            jnp.where(
                b1, M_BOMB,
                jnp.where(
                    b2, (rand % 4).astype(I32),
                    jnp.where(
                        b3, m_enemy,
                        jnp.where(b4, M_BOMB, m_queue),
                    ),
                ),
            ),
        ),
    ).astype(I32)

    consumed = (a_else & ~mq_empty) | b2 | (c_path & ~mq_empty)
    mq_written = a_else | c_path
    new_slots = jnp.where(mq_written, slots, ast.mq_slots)

    # --- recentPositions ring update (simple_agent.cpp:116-129) ---
    px, py = desired_position(ax, ay, move)
    full = ast.rp_count == 4
    head = jnp.where(full, (ast.rp_head + 1) % 4, ast.rp_head)
    count = jnp.where(full, ast.rp_count - 1, ast.rp_count)
    slot = (head + count) % 4
    ast2 = SimpleAgentState(
        rp_x=ast.rp_x.at[slot].set(px),
        rp_y=ast.rp_y.at[slot].set(py),
        rp_head=head,
        rp_count=count + 1,
        mq_slots=new_slots,
    )
    return move, consumed, ast2


def simple_agent_policy(key: jax.Array, state: State, agent_id,
                        ast: SimpleAgentState):
    """Device-play wrapper: burns one uniform [0,4] draw per act."""
    rand = jax.random.randint(key, (), 0, 5, I32)
    move, _, ast2 = simple_agent_act(state, agent_id, ast, rand)
    return move, ast2


def simple_agent_init_batch() -> SimpleAgentState:
    """FSM state for all four agents, stacked on a leading axis."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (AGENT_COUNT,) + x.shape),
        simple_agent_init(),
    )
