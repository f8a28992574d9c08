"""Phase 1: simultaneous agent movement (reference src/bboard/step.cpp:21-185).

The reference walks agents in dependency-chain order (an agent blocked by
another's current cell moves after it), jumping the loop index through the
``dependency`` links.  We replicate that walk with a statically-unrolled
4-iteration loop whose agent index is a traced value; the per-agent update is
a fully masked state transformation.

Replicated quirks:
* BOMB moves plant with lifetime BOMB_LIFETIME+1 (ticked the same step) and do
  NOT set the board cell -- the bomb item appears when the agent walks away.
* In an ouroboros (4-cycle) rotation, a destination covered by any bomb is
  treated as a BOMB cell (blocks the whole rotation) and moving onto an agent
  cell is allowed.
* Walking into flames kills and vacates the origin cell only if it is still
  owned by the victim.
* The passage branch restores the origin cell (BOMB if a bomb is underneath)
  only if still owned by the mover; both bomb branches restore it
  unconditionally (step.cpp:125-136 vs 152-159/171-179).
* Without kick, an agent still moves onto a bomb cell optimistically; phase 2
  bounces it back (step.cpp:170-184).
* Agents orphaned by a dependency overwrite are never processed, matching the
  reference's observable behavior (they always have a destination collision).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.constants import (
    AGENT_COUNT,
    BOMB_LIFETIME,
    C_AGENT0,
    C_BOMB,
    C_FLAME,
    C_PASSAGE,
    M_BOMB,
    M_IDLE,
)
from ..core import queue as q
from ..core.state import (
    I32,
    State,
    cell_index,
    get_bomb_index,
    has_bomb,
    is_agent,
    is_out_of_bounds,
    is_powerup,
    plant_bomb,
)
from ..engine.flames import masked_kill
from . import util


def _select(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def _process_agent(state: State, i, moves, des_x, des_y, ouroboros) -> State:
    """One iteration of the chain walk body (step.cpp:46-185), fully masked."""
    m = moves[i]
    active = ~state.agent_dead[i] & (m != M_IDLE)

    # --- BOMB: plant with life 11, no board item (step.cpp:52-56) ---
    is_plant = active & (m == M_BOMB)
    planted = plant_bomb(
        state, state.agent_x[i], state.agent_y[i], i, set_item=False,
        life=BOMB_LIFETIME + 1,
    )
    state = _select(is_plant, planted, state)

    x = state.agent_x[i]
    y = state.agent_y[i]
    dx = des_x[i]
    dy = des_y[i]
    moving = active & ~is_plant & ~is_out_of_bounds(dx, dy)
    dc = cell_index(jnp.clip(dx, 0, 10), jnp.clip(dy, 0, 10))
    oc = cell_index(x, y)

    item = state.board[dc]
    # Ouroboros: a bomb under any agent still blocks (step.cpp:70-82).
    item = jnp.where(
        ouroboros & has_bomb(state, dx, dy), C_BOMB, item
    )

    origin_mine = state.board[oc] == C_AGENT0 + i
    vacate_val = jnp.where(has_bomb(state, x, y), C_BOMB, C_PASSAGE).astype(I32)

    # --- Walking into flames (step.cpp:84-99) ---
    flame_death = moving & (item == C_FLAME)
    state = masked_kill(state, i, flame_death)
    state = state._replace(
        board=state.board.at[oc].set(
            jnp.where(flame_death & origin_mine, vacate_val, state.board[oc])
        )
    )

    moving = moving & ~flame_death & ~util.has_dp_collision(state, des_x, des_y, i)

    # --- Powerup pickup (step.cpp:111-114) ---
    powerup = moving & is_powerup(item)
    state = util.consume_powerup(state, i, item, powerup)
    item = jnp.where(powerup, C_PASSAGE, item)

    move_passage = moving & (
        (item == C_PASSAGE) | (ouroboros & is_agent(item))
    )
    onto_bomb = moving & (item == C_BOMB)
    move_kick = onto_bomb & state.agent_can_kick[i]
    does_move = move_passage | onto_bomb

    # Vacate origin: ownership-checked for passage, unconditional for bombs.
    vacate = (move_passage & origin_mine) | onto_bomb
    state = state._replace(
        board=state.board.at[oc].set(
            jnp.where(vacate, vacate_val, state.board[oc])
        )
    )
    state = state._replace(
        board=state.board.at[dc].set(
            jnp.where(does_move, C_AGENT0 + i, state.board[dc])
        ),
        agent_x=state.agent_x.at[i].set(jnp.where(does_move, dx, x)),
        agent_y=state.agent_y.at[i].set(jnp.where(does_move, dy, y)),
    )

    # Kick: set the first bomb at the destination moving (step.cpp:165-168).
    kicked = get_bomb_index(state, dx, dy)
    safe_idx = jnp.where(kicked >= 0, kicked, 0)
    new_dir = q.set_(
        state.bombs.dir,
        state.bomb_head,
        safe_idx,
        jnp.where(
            move_kick & (kicked >= 0),
            m.astype(I32),
            q.get(state.bombs.dir, state.bomb_head, safe_idx),
        ),
    )
    return state._replace(bombs=state.bombs._replace(dir=new_dir))


def move_agents(state: State, moves):
    """Phase 1 (step.cpp:21-185).  Returns (state, des_x, des_y)."""
    des_x, des_y = util.fill_dest_pos(state, moves)
    des_x, des_y = util.fix_switch_move(state, des_x, des_y)
    dependency, roots, root_count = util.resolve_dependencies(state, des_x, des_y)
    ouroboros = root_count == 0

    i = jnp.where(ouroboros, 0, roots[0]).astype(I32)
    root_idx = jnp.zeros((), I32)

    for _ in range(AGENT_COUNT):
        # If the chain ended, pick the next root (padded roots give -1,
        # making the iteration a no-op; see util.resolve_dependencies).
        take_next_root = i == -1
        root_idx = root_idx + take_next_root.astype(I32)
        i = jnp.where(take_next_root, roots[jnp.clip(root_idx, 0, AGENT_COUNT)], i)

        valid = i >= 0
        safe_i = jnp.where(valid, i, 0)
        processed = _process_agent(state, safe_i, moves, des_x, des_y, ouroboros)
        state = _select(valid, processed, state)

        i = jnp.where(valid, dependency[safe_i], jnp.asarray(-1, I32))

    return state, des_x, des_y
