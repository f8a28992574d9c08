"""The game-state PyTree and its pure constructors/mutators.

TPU-native redesign of the reference ``State`` (pomcpp include/bboard.hpp:356-506):
instead of an object with methods mutating a bit-packed ``int board[11][11]`` and
packed-int bomb queue, state is an immutable NamedTuple of small fixed-shape
int32 arrays.  Every "method" is a pure function ``f(state, ...) -> state``.
A batch of boards is just this PyTree with a leading axis (``jax.vmap``).

Board planes are flat ``[121]`` vectors indexed by ``x + 11*y`` (the same index
the reference uses for flame signatures, bboard.cpp:155,207), which keeps the
minor dimension close to the TPU's 128-lane registers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import queue as q
from .constants import (
    AGENT_COUNT,
    BOARD_SIZE,
    BOMB_DEFAULT_STRENGTH,
    BOMB_LIFETIME,
    C_AGENT0,
    C_BOMB,
    C_EXTRABOMB,
    C_INCRRANGE,
    C_KICK,
    C_PASSAGE,
    MAX_BOMBS,
    MAX_FLAMES,
    NUM_CELLS,
)

I32 = jnp.int32
BOOL = jnp.bool_


class Bombs(NamedTuple):
    """Bomb queue fields (SoA).  Logical order via (head, count) in State.

    Mirrors the reference's packed-int bomb (bboard.hpp:246-335) as separate
    planes; slot recycling semantics are preserved (see core.queue).
    """

    x: jax.Array         # i32[MAX_BOMBS]
    y: jax.Array         # i32[MAX_BOMBS]
    id: jax.Array        # i32[MAX_BOMBS] owner agent
    strength: jax.Array  # i32[MAX_BOMBS] blast radius (stored at plant time)
    timer: jax.Array     # i32[MAX_BOMBS] ticks until explosion
    dir: jax.Array       # i32[MAX_BOMBS] movement direction (0=idle)
    moved: jax.Array     # bool[MAX_BOMBS] "moved this step" flag


class Flames(NamedTuple):
    """Flame queue fields (SoA); one record per exploded bomb (bboard.hpp:342)."""

    x: jax.Array         # i32[MAX_FLAMES] origin x
    y: jax.Array         # i32[MAX_FLAMES] origin y
    timer: jax.Array     # i32[MAX_FLAMES] time left
    strength: jax.Array  # i32[MAX_FLAMES] ray length


class State(NamedTuple):
    # Board planes, flat [NUM_CELLS], index = x + BOARD_SIZE*y.
    board: jax.Array       # i32 cell class (C_* codes)
    hidden_pow: jax.Array  # i32 powerup flag under WOOD / carried by FLAME
    flame_sig: jax.Array   # i32 owner signature (origin index) of FLAME cells

    # Agents (SoA over the 4 agents; reference AgentInfo bboard.hpp:228-245).
    agent_x: jax.Array          # i32[4]
    agent_y: jax.Array          # i32[4]
    agent_bomb_count: jax.Array  # i32[4] bombs currently live
    agent_max_bombs: jax.Array   # i32[4]
    agent_strength: jax.Array    # i32[4] blast radius of new bombs
    agent_can_kick: jax.Array    # bool[4]
    agent_dead: jax.Array        # bool[4]

    # Bomb queue.
    bombs: Bombs
    bomb_head: jax.Array   # i32 scalar
    bomb_count: jax.Array  # i32 scalar

    # Flame queue.
    flames: Flames
    flame_head: jax.Array   # i32 scalar
    flame_count: jax.Array  # i32 scalar

    # Scalars.
    timestep: jax.Array     # i32
    alive_count: jax.Array  # i32


def empty_state() -> State:
    """All-passage board, agents at (0,0) alive with default stats.

    Matches a value-initialized reference ``State`` (tests construct it via
    ``std::make_unique<State>()``, e.g. unit_test/bboard/board_logic.cpp:57).
    """
    zc = jnp.zeros((NUM_CELLS,), I32)
    za = jnp.zeros((AGENT_COUNT,), I32)
    zb = jnp.zeros((MAX_BOMBS,), I32)
    zf = jnp.zeros((MAX_FLAMES,), I32)
    return State(
        board=zc,
        hidden_pow=zc,
        flame_sig=zc,
        agent_x=za,
        agent_y=za,
        agent_bomb_count=za,
        agent_max_bombs=jnp.ones((AGENT_COUNT,), I32),
        agent_strength=jnp.full((AGENT_COUNT,), BOMB_DEFAULT_STRENGTH, I32),
        agent_can_kick=jnp.zeros((AGENT_COUNT,), BOOL),
        agent_dead=jnp.zeros((AGENT_COUNT,), BOOL),
        bombs=Bombs(zb, zb, zb, zb, zb, zb, jnp.zeros((MAX_BOMBS,), BOOL)),
        bomb_head=jnp.zeros((), I32),
        bomb_count=jnp.zeros((), I32),
        flames=Flames(zf, zf, zf, zf),
        flame_head=jnp.zeros((), I32),
        flame_count=jnp.zeros((), I32),
        timestep=jnp.zeros((), I32),
        alive_count=jnp.asarray(AGENT_COUNT, I32),
    )


def cell_index(x, y):
    """Flat board index of (x, y)."""
    return x + BOARD_SIZE * y


def board_get(state: State, x, y):
    return state.board[cell_index(x, y)]


def is_out_of_bounds(x, y):
    """Reference util::IsOutOfBounds (step_utility.hpp:155-166)."""
    return (x < 0) | (y < 0) | (x >= BOARD_SIZE) | (y >= BOARD_SIZE)


# --- Cell-class predicates (reference bboard.hpp:73-109) ---------------------

def is_powerup(c):
    return (c >= C_EXTRABOMB) & (c <= C_KICK)


def is_walkable(c):
    return is_powerup(c) | (c == C_PASSAGE)


def is_agent(c):
    return c >= C_AGENT0


def is_static_mov_block(c):
    """Walls, wood and powerups block bomb movement (bboard.hpp:94-97)."""
    from .constants import C_RIGID, C_WOOD

    return (c == C_WOOD) | is_powerup(c) | (c == C_RIGID)


def flag_item(pwp):
    """Powerup flag -> cell class (reference State::FlagItem, bboard.cpp:182)."""
    return jnp.where(
        pwp == 1,
        C_EXTRABOMB,
        jnp.where(pwp == 2, C_INCRRANGE, jnp.where(pwp == 3, C_KICK, C_PASSAGE)),
    )


# --- Agent / item placement ---------------------------------------------------

def put_item(state: State, x, y, item) -> State:
    return state._replace(board=state.board.at[cell_index(x, y)].set(item))


def put_agent(state: State, x, y, agent_id) -> State:
    """Reference State::PutAgent (bboard.cpp:313-320)."""
    return state._replace(
        board=state.board.at[cell_index(x, y)].set(C_AGENT0 + agent_id),
        agent_x=state.agent_x.at[agent_id].set(x),
        agent_y=state.agent_y.at[agent_id].set(y),
    )


def put_agents_in_corners(state: State, a0, a1, a2, a3) -> State:
    """Reference State::PutAgentsInCorners (bboard.cpp:322-333).

    Deliberately replicates the reference's partial coordinate writes: only
    a1.x, a2.x, a2.y, a3.y are assigned; the rest rely on zero-init.
    """
    last = BOARD_SIZE - 1
    board = state.board
    board = board.at[cell_index(0, 0)].set(C_AGENT0 + a0)
    board = board.at[cell_index(last, 0)].set(C_AGENT0 + a1)
    board = board.at[cell_index(last, last)].set(C_AGENT0 + a2)
    board = board.at[cell_index(0, last)].set(C_AGENT0 + a3)
    ax = state.agent_x.at[a1].set(last)
    ax = ax.at[a2].set(last)
    ay = state.agent_y.at[a2].set(last)
    ay = ay.at[a3].set(last)
    return state._replace(board=board, agent_x=ax, agent_y=ay)


def kill(state: State, agent_id) -> State:
    """Reference State::Kill (bboard.hpp:474-481): idempotent, alive-- once."""
    was_dead = state.agent_dead[agent_id]
    return state._replace(
        agent_dead=state.agent_dead.at[agent_id].set(True),
        alive_count=state.alive_count - jnp.where(was_dead, 0, 1).astype(I32),
    )


def kill_many(state: State, *agent_ids) -> State:
    for a in agent_ids:
        state = kill(state, a)
    return state


# --- Bomb queue scans (reference bboard.cpp:265-311) --------------------------

def _bomb_pos_match(state: State, x, y):
    """Per-logical-index match mask for bombs at (x, y), invalid slots False."""
    n = MAX_BOMBS
    bx = q.logical_view(state.bombs.x, state.bomb_head)
    by = q.logical_view(state.bombs.y, state.bomb_head)
    valid = jnp.arange(n) < state.bomb_count
    return valid & (bx == x) & (by == y)


def has_bomb(state: State, x, y):
    """Reference State::HasBomb (bboard.cpp:265-275)."""
    return jnp.any(_bomb_pos_match(state, x, y))


def get_bomb_index(state: State, x, y):
    """First logical bomb index at (x, y), or -1 (bboard.cpp:301-311)."""
    m = _bomb_pos_match(state, x, y)
    return jnp.where(jnp.any(m), jnp.argmax(m), -1).astype(I32)


def get_agent(state: State, x, y):
    """First *alive* agent at (x, y), or -1 (bboard.cpp:289-299)."""
    m = (~state.agent_dead) & (state.agent_x == x) & (state.agent_y == y)
    return jnp.where(jnp.any(m), jnp.argmax(m), -1).astype(I32)


def bomb_at(state: State, i):
    """Read all fields of logical bomb i as a dict of scalars."""
    h = state.bomb_head
    b = state.bombs
    return Bombs(
        x=q.get(b.x, h, i),
        y=q.get(b.y, h, i),
        id=q.get(b.id, h, i),
        strength=q.get(b.strength, h, i),
        timer=q.get(b.timer, h, i),
        dir=q.get(b.dir, h, i),
        moved=q.get(b.moved, h, i),
    )


def set_bomb_field(state: State, i, field: str, value) -> State:
    b = state.bombs._asdict()
    b[field] = q.set_(b[field], state.bomb_head, i, value)
    return state._replace(bombs=Bombs(**b))


def plant_bomb(state: State, x, y, agent_id, set_item=False, life=BOMB_LIFETIME) -> State:
    """Reference State::PlantBombModifiedLife (bboard.cpp:125-146).

    Refuses when the agent is at max bombs.  Writes id/pos/strength/time into
    the next slot but leaves the slot's stale direction/moved flags untouched
    (the reference never resets them -- a recycled slot can leak a direction).
    """
    ok = state.agent_bomb_count[agent_id] < state.agent_max_bombs[agent_id]

    new_bombs, _, new_count = q.append(
        state.bombs,
        Bombs(
            x=jnp.asarray(x, I32),
            y=jnp.asarray(y, I32),
            id=jnp.asarray(agent_id, I32),
            strength=state.agent_strength[agent_id],
            timer=jnp.asarray(life, I32),
            dir=None,    # stale-slot quirk: direction not reset
            moved=None,  # stale-slot quirk: moved flag not reset
        ),
        state.bomb_head,
        state.bomb_count,
        MAX_BOMBS,
    )
    new_board = jnp.where(
        jnp.asarray(set_item),
        state.board.at[cell_index(x, y)].set(C_BOMB),
        state.board,
    )
    planted = state._replace(
        bombs=new_bombs,
        bomb_count=new_count,
        board=new_board,
        agent_bomb_count=state.agent_bomb_count.at[agent_id].add(1),
    )
    return jax.tree.map(lambda a, b: jnp.where(ok, a, b), planted, state)


def remove_bomb(state: State, i) -> State:
    """FixedQueue::RemoveAt on the bomb queue (bboard.hpp:151-160)."""
    new_bombs, head, count = q.remove_at(
        state.bombs, state.bomb_head, state.bomb_count, i, MAX_BOMBS
    )
    return state._replace(bombs=new_bombs, bomb_head=head, bomb_count=count)


def pop_bomb(state: State) -> State:
    """PopBomb proxy (bboard.cpp:93-97): front owner's bombCount--, pop front."""
    owner = q.get(state.bombs.id, state.bomb_head, 0)
    head, count = q.pop_front(state.bomb_head, state.bomb_count, MAX_BOMBS)
    return state._replace(
        agent_bomb_count=state.agent_bomb_count.at[owner].add(-1),
        bomb_head=head,
        bomb_count=count,
    )
