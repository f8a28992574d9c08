"""Step-internal helpers (reference src/bboard/step_utility.cpp).

All functions are pure and operate on single-board state; batch via vmap.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import queue as q
from ..core.constants import (
    AGENT_COUNT,
    C_EXTRABOMB,
    C_INCRRANGE,
    C_KICK,
    MAX_BOMBS,
    MOVE_DX,
    MOVE_DY,
)
from ..core.state import I32, State

_DX = jnp.asarray(MOVE_DX, I32)
_DY = jnp.asarray(MOVE_DY, I32)


def desired_position(x, y, move):
    """util::DesiredPosition (step_utility.cpp:9-31); IDLE/BOMB stay put."""
    return x + _DX[move], y + _DY[move]


def origin_position(x, y, move):
    """util::OriginPosition (step_utility.cpp:33-55): inverse of the move."""
    return x - _DX[move], y - _DY[move]


def fill_dest_pos(state: State, moves):
    """util::FillDestPos (step_utility.cpp:138-144), vectorized over agents."""
    return desired_position(state.agent_x, state.agent_y, moves)


def fix_switch_move(state: State, des_x, des_y):
    """util::FixSwitchMove (step_utility.cpp:154-170).

    Two agents swapping cells both stay.  Replicates the reference's exact
    pair order (i ascending, j from i) and its use of *all* agent positions,
    including dead agents' stale coordinates.
    """
    ax, ay = state.agent_x, state.agent_y
    for i in range(AGENT_COUNT):
        for j in range(i, AGENT_COUNT):
            swap = (
                (des_x[i] == ax[j])
                & (des_y[i] == ay[j])
                & (des_x[j] == ax[i])
                & (des_y[j] == ay[i])
            )
            des_x = des_x.at[i].set(jnp.where(swap, ax[i], des_x[i]))
            des_y = des_y.at[i].set(jnp.where(swap, ay[i], des_y[i]))
            des_x = des_x.at[j].set(jnp.where(swap, ax[j], des_x[j]))
            des_y = des_y.at[j].set(jnp.where(swap, ay[j], des_y[j]))
    return des_x, des_y


def resolve_dependencies(state: State, des_x, des_y):
    """util::ResolveDependencies (step_utility.cpp:172-205).

    Returns (dependency[4], roots[5], root_count).  dependency[j] = i means
    "agent i moves after agent j" (i wants j's current cell).  Dead agents are
    roots.  Exactly like the reference, a later agent targeting the same cell
    overwrites dependency[j], orphaning the earlier one (see engine.movement
    for how the walk handles that).  roots is padded with -1 (the reference
    reads past the valid prefix; we return -1 so the walk no-ops, which is
    observationally identical for all reachable states -- orphans could never
    move anyway because an identical-destination rival implies a destination
    collision).
    """
    ax, ay = state.agent_x, state.agent_y
    dead = state.agent_dead
    dependency = jnp.full((AGENT_COUNT,), -1, I32)
    roots = jnp.full((AGENT_COUNT + 1,), -1, I32)
    root_count = jnp.zeros((), I32)
    j_idx = jnp.arange(AGENT_COUNT)
    for i in range(AGENT_COUNT):
        match = (j_idx != i) & ~dead & (des_x[i] == ax) & (des_y[i] == ay)
        any_match = jnp.any(match)
        first_j = jnp.argmax(match)
        write_dep = any_match & ~dead[i]
        dependency = dependency.at[first_j].set(
            jnp.where(write_dep, i, dependency[first_j])
        )
        is_root = dead[i] | ~any_match
        roots = roots.at[root_count].set(
            jnp.where(is_root, i, roots[root_count])
        )
        root_count = root_count + is_root.astype(I32)
    return dependency, roots, root_count


def has_dp_collision(state: State, des_x, des_y, i):
    """util::HasDPCollision (step_utility.cpp:264-277).

    Uses the shared (post-FixSwitchMove) destination array and *live* dead
    flags -- agents killed earlier in this step's walk no longer collide.
    """
    j = jnp.arange(AGENT_COUNT)
    return jnp.any(
        (j != i)
        & ~state.agent_dead
        & (des_x == des_x[i])
        & (des_y == des_y[i])
    )


def consume_powerup(state: State, agent_id, item, enable) -> State:
    """util::ConsumePowerup (step_utility.cpp:247-262), gated by ``enable``."""
    inc_b = (enable & (item == C_EXTRABOMB)).astype(I32)
    inc_s = (enable & (item == C_INCRRANGE)).astype(I32)
    kick = enable & (item == C_KICK)
    return state._replace(
        agent_max_bombs=state.agent_max_bombs.at[agent_id].add(inc_b),
        agent_strength=state.agent_strength.at[agent_id].add(inc_s),
        agent_can_kick=state.agent_can_kick.at[agent_id].set(
            state.agent_can_kick[agent_id] | kick
        ),
    )


def fill_bomb_dest(state: State):
    """util::FillBombDestPos (step_utility.cpp:146-152).

    Returns logical-index arrays (dest_x[20], dest_y[20]); entries at or past
    bomb_count are the bombs' own (stale-slot) positions, never read by the
    reference either.
    """
    bx = q.logical_view(state.bombs.x, state.bomb_head)
    by = q.logical_view(state.bombs.y, state.bomb_head)
    bd = q.logical_view(state.bombs.dir, state.bomb_head)
    return desired_position(bx, by, jnp.clip(bd, 0, 4))


def reset_bomb_flags(state: State) -> State:
    """util::ResetBombFlags (step_utility.cpp:331-337): valid slots only."""
    n = MAX_BOMBS
    r = (jnp.arange(n) - state.bomb_head) % n
    valid = r < state.bomb_count
    moved = jnp.where(valid, False, state.bombs.moved)
    return state._replace(bombs=state.bombs._replace(moved=moved))
