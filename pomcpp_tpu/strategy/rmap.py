"""Reachability map: BFS distances + predecessor tree (reference RMap).

The reference fills an ``RMap`` per agent per step with a FIFO BFS
(strategy.cpp:37-93) whose *pop/push order is observable*: the predecessor
tree (and therefore every ``MoveTowards*`` decision) depends on the exact
neighbor visit order (y+1, y-1, x+1, x-1) and queue FIFO discipline.  We
re-derive it as a ``lax.while_loop`` over an explicit queue of flat cell
indices -- bounded by 121 pops, fully masked, vmappable over (board, agent).

Conventions preserved from the reference:
* distance plane is 0 for both "unvisited" and the source itself
  (RMap::GetDistance, strategy.cpp:27-30 -- the ambiguity is load-bearing in
  ``MoveTowardsPosition``'s unreachable check, strategy.cpp:110-113);
* agent cells get distance/predecessor but are not expanded through
  (strategy.cpp:50-52);
* ``info`` bit 0 accumulates "a popped cell within my own bomb range has
  distance < 10" (strategy.cpp:77-80); the source always sets it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.constants import BOARD_SIZE, NUM_CELLS
from ..core.state import I32, State, is_agent, is_walkable


class RMap(NamedTuple):
    dist: jax.Array    # i32[121]; 0 = unvisited or source
    pred: jax.Array    # i32[121]; predecessor flat index
    source: jax.Array  # i32 flat index of the BFS source
    info: jax.Array    # i32 bitflags (bit 0: own bomb endangers reachable cell)


def is_reachable(r: RMap, c) -> jax.Array:
    """IsReachable (strategy.hpp:60-66): nonzero distance or the source."""
    return (r.dist[c] != 0) | (c == r.source)


# Neighbor offsets in the reference's TryAdd order: (0,+1), (0,-1), (+1,0),
# (-1,0) (strategy.cpp:82-89).
_NEIGH = ((0, 1), (0, -1), (1, 0), (-1, 0))


def fill_rmap(state: State, agent_id) -> RMap:
    """FillRMap (strategy.cpp:58-93): exact-order BFS from the agent's cell."""
    x0 = state.agent_x[agent_id]
    y0 = state.agent_y[agent_id]
    src = x0 + BOARD_SIZE * y0
    strength = state.agent_strength[agent_id]

    dist = jnp.zeros((NUM_CELLS,), I32)
    pred = jnp.zeros((NUM_CELLS,), I32)
    queue = jnp.zeros((NUM_CELLS,), I32).at[0].set(src)
    head = jnp.zeros((), I32)
    count = jnp.ones((), I32)
    info = jnp.zeros((), I32)

    board = state.board

    def body(carry):
        dist, pred, queue, head, count, info = carry
        c = queue[head % NUM_CELLS]
        cx = c % BOARD_SIZE
        cy = c // BOARD_SIZE
        head, count = head + 1, count - 1
        d = dist[c]

        # info bit (strategy.cpp:77-80): own-bomb cross covers popped cell.
        in_range = ((cy == y0) & (jnp.abs(cx - x0) <= strength)) | (
            (cx == x0) & (jnp.abs(cy - y0) <= strength)
        )
        info = info | jnp.where(in_range & (d < 10), 1, 0).astype(I32)

        for dx, dy in _NEIGH:
            nx, ny = cx + dx, cy + dy
            n = nx + BOARD_SIZE * ny
            nc = jnp.clip(n, 0, NUM_CELLS - 1)
            item = board[nc]
            ok = (
                ((nx != x0) | (ny != y0))  # never re-add the source
                & (nx >= 0) & (ny >= 0) & (nx < BOARD_SIZE) & (ny < BOARD_SIZE)
                & (dist[nc] == 0)
                & (is_walkable(item) | is_agent(item))
            )
            pred = pred.at[nc].set(jnp.where(ok, c, pred[nc]))
            dist = dist.at[nc].set(jnp.where(ok, d + 1, dist[nc]))
            push = ok & ~is_agent(item)
            slot = (head + count) % NUM_CELLS
            queue = queue.at[slot].set(jnp.where(push, n, queue[slot]))
            count = count + push.astype(I32)
        return dist, pred, queue, head, count, info

    dist, pred, _, _, _, info = lax.while_loop(
        lambda carry: carry[4] > 0, body, (dist, pred, queue, head, count, info)
    )
    return RMap(dist=dist, pred=pred, source=src.astype(I32), info=info)
