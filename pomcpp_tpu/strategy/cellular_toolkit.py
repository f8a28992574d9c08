"""Plane-based strategy primitives for the cellular production engine.

The exact toolkit (strategy/rmap.py, strategy/moves.py) replicates the
reference's FIFO-BFS predecessor tree and queue scans for conformance; it
runs on the queue-encoded ``State``.  This module provides the same
*decision primitives* over ``CellState`` planes, designed like the cellular
engine itself: shifts, relaxation rounds and one-hot reads -- no queues, no
dynamic gathers -- so scripted policies run jitted at full batch scale.

Documented divergences from the exact toolkit (production-policy tradeoffs,
not accidents):
* BFS predecessors come from parallel relaxation with a fixed direction
  priority (DOWN, UP, RIGHT, LEFT -- the reference's TryAdd order) instead
  of FIFO discovery order; equal-distance tie-breaks can differ.
* ``move_towards_position`` is replaced by *root-direction labels*: each
  reachable cell knows which first step from the source leads to it
  (computed by label propagation), so path extraction is one masked read
  instead of a predecessor walk.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.constants import (
    AGENT_COUNT,
    BOARD_SIZE,
    C_WOOD,
    M_DOWN,
    M_IDLE,
    M_LEFT,
    M_RIGHT,
    M_UP,
    NUM_CELLS,
)
from ..core.state import I32, is_walkable, is_agent
from ..engine.cellular import CellState, _push

_BIG = jnp.iinfo(jnp.int32).max // 4
_X = jnp.arange(NUM_CELLS, dtype=I32) % BOARD_SIZE
_Y = jnp.arange(NUM_CELLS, dtype=I32) // BOARD_SIZE

# Reference TryAdd neighbor order (strategy.cpp:82-89): (y+1), (y-1),
# (x+1), (x-1) == directions DOWN, UP, RIGHT, LEFT.
_PRIORITY = (M_DOWN, M_UP, M_RIGHT, M_LEFT)


class ReachMap(NamedTuple):
    dist: jax.Array    # i32[121]; _BIG = unreachable, 0 = source
    root: jax.Array    # i32[121]; first move from source leading here (0 none)
    source: jax.Array  # i32 flat index


def danger_map_cell(cs: CellState) -> jax.Array:
    """Per-cell min ticks-to-blast over covering bombs (cf. IsInDanger,
    strategy.cpp:229-249: pure cross geometry, stored strength, no chains).

    Distance-k coverage propagates one cell per while-round in all four
    directions and stops at the batch's max blast radius (typically 1-3),
    instead of a fixed 10-deep unroll -- the body compiles once, which keeps
    the FSM-policy program small enough for TPU compilation.
    """
    has_bomb = cs.bomb_timer > 0
    danger0 = jnp.where(has_bomb, cs.bomb_timer, _BIG)
    t0 = cs.bomb_timer
    s0 = jnp.where(has_bomb, cs.bomb_strength, 0)
    max_s = jnp.max(s0)

    def body(carry):
        planes, danger, k = carry
        new_planes = []
        for d, (t_sh, s_sh) in zip((1, 2, 3, 4), planes):
            t_sh = _push(t_sh, d, 0)
            s_sh = _push(s_sh, d, 0)
            cover = (t_sh > 0) & (s_sh >= k)
            danger = jnp.minimum(danger, jnp.where(cover, t_sh, _BIG))
            new_planes.append((t_sh, s_sh))
        return tuple(new_planes), danger, k + 1

    def cond(carry):
        _, _, k = carry
        return k <= jnp.minimum(max_s, BOARD_SIZE - 1)

    init = tuple((t0, s0) for _ in range(4))
    _, danger, _ = lax.while_loop(
        cond, body, (init, danger0, jnp.ones((), I32))
    )
    return jnp.where(danger == _BIG, 0, danger).astype(I32)


def fill_reach_map(cs: CellState, agent_id) -> ReachMap:
    """BFS distances + root-direction labels from the agent's cell.

    Agents are path targets but not expanded through (strategy.cpp:50-52).
    """
    src = cs.agent_x[agent_id] + BOARD_SIZE * cs.agent_y[agent_id]
    src_oh = jnp.arange(NUM_CELLS, dtype=I32) == src
    enterable = is_walkable(cs.board) | is_agent(cs.board)
    expandable = is_walkable(cs.board) | src_oh  # src expands even if not walkable

    dist0 = jnp.where(src_oh, 0, _BIG)
    root0 = jnp.zeros((NUM_CELLS,), I32)

    def body(carry):
        dist, root, _ = carry
        nd, nr = dist, root
        for mv in _PRIORITY:
            # neighbor in direction mv feeds this cell when it expanded.
            cand_d = _push(jnp.where(expandable, dist, _BIG), mv, _BIG) + 1
            cand_r = _push(root, mv, 0)
            # first step label: cells adjacent to the source take the move
            # that walks from the source onto them.
            from_src = _push(src_oh, mv, False)
            cand_r = jnp.where(from_src, mv, cand_r)
            better = enterable & (cand_d < nd)
            nd = jnp.where(better, cand_d, nd)
            nr = jnp.where(better, cand_r, nr).astype(I32)
        changed = jnp.any(nd != dist)
        return nd, nr, changed

    dist, root, _ = lax.while_loop(
        lambda c: c[2], lambda c: body(c), (dist0, root0, jnp.asarray(True))
    )
    return ReachMap(dist=dist, root=root, source=src.astype(I32))


def _first_masked(mask) -> jax.Array:
    """First flat index with mask set, or -1 (row-major reference order)."""
    return jnp.where(jnp.any(mask), jnp.argmax(mask), -1).astype(I32)


def _read_at(plane, cell):
    oh = jnp.arange(NUM_CELLS, dtype=I32) == cell
    if plane.dtype == jnp.bool_:
        return jnp.any(oh & plane)
    return jnp.sum(jnp.where(oh, plane, 0))


def move_towards_cell(r: ReachMap, cell) -> jax.Array:
    """First move from the source toward ``cell`` (label lookup)."""
    reachable = _read_at(r.dist, cell) < _BIG
    return jnp.where(reachable, _read_at(r.root, cell), M_IDLE).astype(I32)


def move_towards_safe_place_cell(dmap, r: ReachMap, radius) -> jax.Array:
    """Cf. MoveTowardsSafePlace (strategy.cpp:122-141) incl. its buggy
    window bounds; safety = _safe_condition(danger, 2)."""
    ox = r.source % BOARD_SIZE
    oy = r.source // BOARD_SIZE
    window = (_Y >= oy - radius) & (_Y < radius) & (_X >= ox - radius) & (_X < radius)
    manh = jnp.abs(_X - ox) + jnp.abs(_Y - oy)
    safe = (dmap == 0) | (dmap >= 2)
    mask = window & (manh <= radius) & (r.dist != 0) & (r.dist < _BIG) & safe
    c = _first_masked(mask)
    return jnp.where(c >= 0, move_towards_cell(r, jnp.maximum(c, 0)), M_IDLE)


def move_towards_enemy_cell(cs: CellState, r: ReachMap, radius) -> jax.Array:
    """Cf. MoveTowardsEnemy (strategy.cpp:163-186)."""
    ox = r.source % BOARD_SIZE
    oy = r.source // BOARD_SIZE
    manh = jnp.abs(cs.agent_x - ox) + jnp.abs(cs.agent_y - oy)
    at_src = (cs.agent_x == ox) & (cs.agent_y == oy)
    ok = ~cs.agent_dead & ~at_src & (manh <= radius)
    i = jnp.argmax(ok)
    c = cs.agent_x[i] + BOARD_SIZE * cs.agent_y[i]
    return jnp.where(jnp.any(ok), move_towards_cell(r, c), M_IDLE)


_SAFE_ORDER = ((1, 0, M_RIGHT), (-1, 0, M_LEFT), (0, 1, M_DOWN), (0, -1, M_UP))


def safe_directions_cell(cs: CellState, dmap, x, y):
    """Cf. SafeDirections (strategy.cpp:197-221); returns (moves[4], count)."""
    moves = jnp.zeros((4,), I32)
    count = jnp.zeros((), I32)
    for dx, dy, mv in _SAFE_ORDER:
        nx, ny = x + dx, y + dy
        inb = (nx >= 0) & (ny >= 0) & (nx < BOARD_SIZE) & (ny < BOARD_SIZE)
        c = jnp.clip(nx + BOARD_SIZE * ny, 0, NUM_CELLS - 1)
        d = _read_at(dmap, c)
        ok = inb & is_walkable(_read_at(cs.board, c)) & ((d == 0) | (d >= 2))
        moves = jnp.where(jnp.arange(4) == count, jnp.where(ok, mv, moves), moves)
        count = count + ok.astype(I32)
    return moves, count


def is_adjacent_enemy_cell(cs: CellState, agent_id, distance) -> jax.Array:
    ax = cs.agent_x[agent_id]
    ay = cs.agent_y[agent_id]
    j = jnp.arange(AGENT_COUNT)
    manh = jnp.abs(cs.agent_x - ax) + jnp.abs(cs.agent_y - ay)
    return jnp.any((j != agent_id) & ~cs.agent_dead & (manh <= distance))


def is_adjacent_wood_cell(cs: CellState, agent_id, distance) -> jax.Array:
    ax = cs.agent_x[agent_id]
    ay = cs.agent_y[agent_id]
    manh = jnp.abs(_X - ax) + jnp.abs(_Y - ay)
    return jnp.any((manh <= distance) & (cs.board == C_WOOD))
