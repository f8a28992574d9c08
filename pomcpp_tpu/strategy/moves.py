"""Danger model, path-following move selectors and local scans.

Reference: src/bboard/strategy.cpp:99-338 and include/strategy.hpp:130-172.
All functions are pure scalar-per-board ops (vmap for batches).  Sequential
first-match scans become masked argmax over the row-major cell order, which
is exactly the reference's loop order (y outer ascending, x inner
ascending, flat index = x + 11*y).

Deliberately replicated bug: ``MoveTowardsSafePlace`` iterates
``y in [originY - radius, radius)`` and ``x in [originX - radius, radius)``
-- the upper bounds should be ``origin + radius`` but the reference uses
bare ``radius`` (strategy.cpp:126-128).  Parity requires the same scan
window.
"""

from __future__ import annotations

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
    MAX_BOMBS,
    NUM_CELLS,
)
from ..core import queue as q
from ..core.state import I32, State, is_walkable
from .rmap import RMap

_X = jnp.arange(NUM_CELLS, dtype=I32) % BOARD_SIZE
_Y = jnp.arange(NUM_CELLS, dtype=I32) // BOARD_SIZE


def is_in_bomb_range(x, y, s, px, py):
    """IsInBombRange (strategy.hpp:167-172): cross of radius s around (x,y)."""
    return ((py == y) & (jnp.abs(px - x) <= s)) | (
        (px == x) & (jnp.abs(py - y) <= s)
    )


def danger_map(state: State) -> jax.Array:
    """Per-cell IsInDanger (strategy.cpp:229-249): min ticks-to-blast.

    0 means "no bomb covers this cell"; otherwise the minimum stored timer
    over covering bombs (stored strength, no chain consideration -- the
    reference's TODO at strategy.cpp:232 is part of the spec).
    """
    bx = q.logical_view(state.bombs.x, state.bomb_head)
    by = q.logical_view(state.bombs.y, state.bomb_head)
    bs = q.logical_view(state.bombs.strength, state.bomb_head)
    bt = q.logical_view(state.bombs.timer, state.bomb_head)
    valid = jnp.arange(MAX_BOMBS) < state.bomb_count

    # [cells, bombs] cross coverage.
    cover = valid[None, :] & is_in_bomb_range(
        bx[None, :], by[None, :], bs[None, :], _X[:, None], _Y[:, None]
    )
    big = jnp.iinfo(jnp.int32).max
    t = jnp.where(cover, bt[None, :], big)
    m = jnp.min(t, axis=1)
    return jnp.where(m == big, 0, m).astype(I32)


def is_in_danger(state: State, x, y) -> jax.Array:
    """IsInDanger at one position (strategy.cpp:229-249)."""
    bx = q.logical_view(state.bombs.x, state.bomb_head)
    by = q.logical_view(state.bombs.y, state.bomb_head)
    bs = q.logical_view(state.bombs.strength, state.bomb_head)
    bt = q.logical_view(state.bombs.timer, state.bomb_head)
    valid = jnp.arange(MAX_BOMBS) < state.bomb_count
    cover = valid & is_in_bomb_range(bx, by, bs, x, y)
    big = jnp.iinfo(jnp.int32).max
    m = jnp.min(jnp.where(cover, bt, big))
    return jnp.where(m == big, 0, m).astype(I32)


def safe_condition(danger, min_time: int = 2):
    """_safe_condition (strategy.cpp:192-195)."""
    return (danger == 0) | (danger >= min_time)


def move_towards_position(r: RMap, target) -> jax.Array:
    """MoveTowardsPosition (strategy.cpp:99-120): predecessor walk to source.

    Walks the predecessor chain from ``target`` (flat index) until the
    predecessor is the source, then returns the first step's direction;
    a cell with distance 0 on the way means unreachable -> IDLE.
    """
    sx = r.source % BOARD_SIZE
    sy = r.source // BOARD_SIZE

    def body(carry):
        curr, result, done, n = carry
        p = r.pred[curr]
        at_src = p == r.source
        cx = curr % BOARD_SIZE
        cy = curr // BOARD_SIZE
        mv = jnp.where(
            cx > sx,
            M_RIGHT,
            jnp.where(
                cx < sx, M_LEFT, jnp.where(cy > sy, M_DOWN, M_UP)
            ),
        ).astype(I32)
        unreachable = ~at_src & (r.dist[curr] == 0)
        result = jnp.where(at_src, mv, jnp.where(unreachable, M_IDLE, result))
        done = at_src | unreachable
        return p, result, done, n + 1

    _, result, _, _ = lax.while_loop(
        lambda c: ~c[2] & (c[3] < NUM_CELLS + 2),
        body,
        (jnp.asarray(target, I32), jnp.zeros((), I32), jnp.zeros((), bool),
         jnp.zeros((), I32)),
    )
    return result


def _first_cell_match(mask) -> jax.Array:
    """First flat index with mask set, or -1 (row-major = reference order)."""
    any_ = jnp.any(mask)
    return jnp.where(any_, jnp.argmax(mask), -1).astype(I32)


def move_towards_safe_place(state: State, r: RMap, radius) -> jax.Array:
    """MoveTowardsSafePlace (strategy.cpp:122-141), buggy bounds included."""
    ox = r.source % BOARD_SIZE
    oy = r.source // BOARD_SIZE
    window = (
        (_Y >= oy - radius) & (_Y < radius) & (_X >= ox - radius) & (_X < radius)
    )
    manh = jnp.abs(_X - ox) + jnp.abs(_Y - oy)
    dmap = danger_map(state)
    mask = window & (manh <= radius) & (r.dist != 0) & safe_condition(dmap)
    c = _first_cell_match(mask)
    return jnp.where(c >= 0, move_towards_position(r, jnp.maximum(c, 0)), M_IDLE)


def move_towards_powerup(state: State, r: RMap, radius) -> jax.Array:
    """MoveTowardsPowerup (strategy.cpp:143-161): first powerup in diamond."""
    from ..core.state import is_powerup

    ox = r.source % BOARD_SIZE
    oy = r.source // BOARD_SIZE
    manh = jnp.abs(_X - ox) + jnp.abs(_Y - oy)
    mask = (manh <= radius) & is_powerup(state.board)
    c = _first_cell_match(mask)
    return jnp.where(c >= 0, move_towards_position(r, jnp.maximum(c, 0)), M_IDLE)


def move_towards_enemy(state: State, r: RMap, radius) -> jax.Array:
    """MoveTowardsEnemy (strategy.cpp:163-186): first live in-range agent.

    Skips dead agents and any agent standing on the source cell (which
    includes the owner), in agent-id order.
    """
    ox = r.source % BOARD_SIZE
    oy = r.source // BOARD_SIZE
    manh = jnp.abs(state.agent_x - ox) + jnp.abs(state.agent_y - oy)
    at_src = (state.agent_x == ox) & (state.agent_y == oy)
    ok = ~state.agent_dead & ~at_src & (manh <= radius)
    any_ = jnp.any(ok)
    i = jnp.argmax(ok)
    c = state.agent_x[i] + BOARD_SIZE * state.agent_y[i]
    return jnp.where(any_, move_towards_position(r, c), M_IDLE)


# SafeDirections probe order: RIGHT, LEFT, DOWN, UP (strategy.cpp:197-221).
_SAFE_ORDER = (
    (1, 0, M_RIGHT),
    (-1, 0, M_LEFT),
    (0, 1, M_DOWN),
    (0, -1, M_UP),
)


def safe_directions(state: State, x, y):
    """SafeDirections (strategy.cpp:197-221).

    Returns ``(moves_i32[4], count)``: the first ``count`` entries are the
    safe moves in probe order; remaining slots are 0.  (The caller overlays
    them onto its persistent queue slots -- see agents/simple.py.)
    """
    moves = jnp.zeros((4,), I32)
    count = jnp.zeros((), I32)
    for dx, dy, mv in _SAFE_ORDER:
        nx, ny = x + dx, y + dy
        inb = (nx >= 0) & (ny >= 0) & (nx < BOARD_SIZE) & (ny < BOARD_SIZE)
        c = jnp.clip(nx + BOARD_SIZE * ny, 0, NUM_CELLS - 1)
        ok = inb & is_walkable(state.board[c]) & safe_condition(
            is_in_danger(state, nx, ny)
        )
        moves = moves.at[jnp.clip(count, 0, 3)].set(
            jnp.where(ok, mv, moves[jnp.clip(count, 0, 3)])
        )
        count = count + ok.astype(I32)
    return moves, count


def sort_directions(slots, count, rp_x, rp_y, rp_head, rp_count, x, y):
    """SortDirections (strategy.hpp:130-152) over the persistent 4-slot queue.

    Replicates the reference's RemoveAt+AddElem aliasing exactly: a visited
    move that is NOT last in the queue is *deleted* and the element that
    slid into its place is *duplicated* at the back (the re-add reads the
    post-shift slot); a visited move at the back stays put.  Bounded by
    8 iterations (<= 4 original entries, <= 4 removals).
    """
    from ..engine.util import desired_position

    def iteration(_, carry):
        slots, count, i, removes = carry
        active = (i < count_orig) & (removes < 4) & (i >= 0)
        si = jnp.clip(i, 0, 3)
        dx, dy = desired_position(x, y, jnp.clip(slots[si], 0, 5))
        # visited = desired position appears in recentPositions.
        j = jnp.arange(4)
        logical = (rp_head + j) % 4
        vis = jnp.any(
            (j < rp_count) & (rp_x[logical] == dx) & (rp_y[logical] == dy)
        )
        do = active & vis

        # RemoveAt(i): shift logical (i, count) left by one.
        k = jnp.arange(4)
        shift = (k >= i) & (k < count - 1)
        shifted = jnp.where(shift, jnp.roll(slots, -1), slots)
        count2 = count - 1
        # AddElem(q[i]) AFTER the shift (the aliasing quirk).
        val = shifted[si]
        appended = shifted.at[jnp.clip(count2, 0, 3)].set(val)

        slots = jnp.where(do, appended, slots)
        count = jnp.where(do, count2 + 1, count)
        i = jnp.where(do, i - 1, i) + 1
        removes = removes + do.astype(I32)
        return slots, count, i, removes

    count_orig = count
    slots, count, _, _ = lax.fori_loop(
        0, 8, iteration, (slots, count, jnp.zeros((), I32), jnp.zeros((), I32))
    )
    return slots, count


def is_adjacent_enemy(state: State, agent_id, distance) -> jax.Array:
    """IsAdjacentEnemy (strategy.cpp:297-313): live enemy within manhattan d."""
    ax = state.agent_x[agent_id]
    ay = state.agent_y[agent_id]
    j = jnp.arange(AGENT_COUNT)
    manh = jnp.abs(state.agent_x - ax) + jnp.abs(state.agent_y - ay)
    return jnp.any((j != agent_id) & ~state.agent_dead & (manh <= distance))


def is_adjacent_item(state: State, agent_id, distance, item) -> jax.Array:
    """IsAdjacentItem (strategy.cpp:315-337): item within manhattan d.

    Like the reference, WOOD matches wood with any hidden-powerup flag.
    """
    ax = state.agent_x[agent_id]
    ay = state.agent_y[agent_id]
    manh = jnp.abs(_X - ax) + jnp.abs(_Y - ay)
    hit = jnp.where(item == C_WOOD, state.board == C_WOOD, state.board == item)
    return jnp.any((manh <= distance) & hit)
