"""SimpleAgent over the cellular production engine.

Same decision cascade as agents/simple.py (the conformance FSM validated
move-for-move against the C++ reference) but computed with the plane-based
strategy toolkit, so whole batches of boards run scripted self-play jitted
on-device (BASELINE config 3).  Tie-break divergences inherited from
strategy/cellular_toolkit.py are documented there; the FSM state machinery
(recent-position ring, persistent moveQueue slots, single rng draw per act)
is identical to the exact implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.constants import BOARD_SIZE, M_BOMB, M_IDLE, NUM_CELLS
from ..core.state import I32, is_walkable
from ..engine.cellular import CellState
from ..strategy.cellular_toolkit import (
    _read_at,
    danger_map_cell,
    fill_reach_map,
    is_adjacent_enemy_cell,
    is_adjacent_wood_cell,
    move_towards_enemy_cell,
    move_towards_safe_place_cell,
    safe_directions_cell,
)
from ..strategy.moves import safe_condition, sort_directions
from ..engine.util import desired_position
from .simple import SimpleAgentState, _has_rp_loop, simple_agent_init  # noqa: F401
from .simple import simple_agent_init_batch  # noqa: F401


def _danger_at(dmap, x, y):
    inb = (x >= 0) & (y >= 0) & (x < BOARD_SIZE) & (y < BOARD_SIZE)
    c = jnp.clip(x + BOARD_SIZE * y, 0, NUM_CELLS - 1)
    return jnp.where(inb, _read_at(dmap, c), 0)


def _walkable_at(cs, x, y):
    inb = (x >= 0) & (y >= 0) & (x < BOARD_SIZE) & (y < BOARD_SIZE)
    c = jnp.clip(x + BOARD_SIZE * y, 0, NUM_CELLS - 1)
    return inb & is_walkable(_read_at(cs.board, c))


def simple_agent_cell_act(cs: CellState, agent_id, ast: SimpleAgentState, rand,
                          dmap=None):
    """One decision over CellState; mirrors simple.py's cascade 1:1.

    ``dmap`` lets callers precompute the (agent-independent) danger map once
    per board instead of once per agent (see simple_agent_cell_act_joint).
    """
    ax = cs.agent_x[agent_id]
    ay = cs.agent_y[agent_id]
    if dmap is None:
        dmap = danger_map_cell(cs)
    r = fill_reach_map(cs, agent_id)
    danger = _danger_at(dmap, ax, ay)

    # Path A: flee danger.
    in_danger = danger > 0
    m_safe = move_towards_safe_place_cell(dmap, r, danger)
    sx, sy = desired_position(ax, ay, m_safe)
    a_ok = in_danger & _walkable_at(cs, sx, sy) & safe_condition(
        _danger_at(dmap, sx, sy), 2
    )
    a_else = in_danger & ~a_ok

    # Shared moveQueue recompute.
    new_moves, mq_count = safe_directions_cell(cs, dmap, ax, ay)
    k = jnp.arange(4)
    slots = jnp.where(k < mq_count, new_moves, ast.mq_slots)
    slots, mq_count = sort_directions(
        slots, mq_count, ast.rp_x, ast.rp_y, ast.rp_head, ast.rp_count, ax, ay
    )
    mq_empty = mq_count == 0
    m_queue = jnp.where(mq_empty, M_IDLE, slots[jnp.clip(rand % 2, 0, 3)])

    # Path B: aggression.
    can_bomb = cs.agent_bomb_count[agent_id] < cs.agent_max_bombs[agent_id]
    adj1 = is_adjacent_enemy_cell(cs, agent_id, 1)
    adj7 = is_adjacent_enemy_cell(cs, agent_id, 7)
    rp_loop = _has_rp_loop(ast)
    m_enemy = move_towards_enemy_cell(cs, r, 7)
    ex, ey = desired_position(ax, ay, m_enemy)
    b3_ok = _walkable_at(cs, ex, ey) & safe_condition(
        _danger_at(dmap, ex, ey), 5
    )
    wood_adj = is_adjacent_wood_cell(cs, agent_id, 1)

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
                    jnp.where(b3, m_enemy, jnp.where(b4, M_BOMB, m_queue)),
                ),
            ),
        ),
    ).astype(I32)

    consumed = (a_else & ~mq_empty) | b2 | (c_path & ~mq_empty)
    mq_written = a_else | c_path
    new_slots = jnp.where(mq_written, slots, ast.mq_slots)

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


def simple_agent_cell_policy(key, cs: CellState, agent_id,
                             ast: SimpleAgentState):
    """Stateful policy for env.rollout_stateful on the cellular engine."""
    rand = jax.random.randint(key, (), 0, 5, I32)
    move, _, ast2 = simple_agent_cell_act(cs, agent_id, ast, rand)
    return move, ast2


def simple_agent_cell_joint(key, cs: CellState, asts: SimpleAgentState):
    """All four agents in one call, sharing one danger-map computation.

    ``asts`` is the FSM state stacked over agents (leading axis 4); for
    env.rollout_stateful with ``joint=True``.
    """
    dmap = danger_map_cell(cs)
    rands = jax.random.randint(key, (4,), 0, 5, I32)
    ids = jnp.arange(4, dtype=I32)
    moves, _, asts2 = jax.vmap(
        lambda aid, ast, rand: simple_agent_cell_act(cs, aid, ast, rand, dmap)
    )(ids, asts, rands)
    return moves, asts2
