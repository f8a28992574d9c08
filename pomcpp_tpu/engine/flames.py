"""Flame spawning, chained explosions, and flame/bomb ticking.

Reference semantics (pomcpp src/bboard/bboard.cpp:24-57, 148-263 and
src/bboard/step_utility.cpp:208-245), re-derived for XLA: the reference
implements chained explosions with *recursion* (SpawnFlameItem ->
ExplodeBombAt -> SpawnFlame -> SpawnFlameItem ...).  Recursion does not trace,
so we run the identical depth-first traversal with an explicit fixed-depth
stack inside a ``lax.while_loop``.  Every quirk is preserved:

* the DFS visit order (right, left, +y, -y rays; one cell per loop iteration),
* flame-signature last-writer-wins on overlapping flames (an outer ray
  overwrites the cell signature after an inner chained explosion returns),
* wood absorbs exactly one ray cell and transfers its hidden powerup flag,
* chained ``ExplodeBombAt`` uses the owner's *live* bombStrength
  (bboard.cpp:111-118) while ``ExplodeTopBomb`` uses the strength stored at
  plant time (bboard.cpp:191-196),
* flame-over-flame overwrite drops any powerup flag the old flame carried.

One deliberate, observationally-equivalent reordering: the reference removes
an exploding bomb from the queue *after* the recursive SpawnFlame returns
(bboard.cpp:111-118); we remove it before descending.  During the recursion the
bomb's cell already shows FLAME, so no scan can find it -- the orders are
indistinguishable (verified by the conformance + parity suites).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core import queue as q
from ..core.constants import (
    C_AGENT0,
    C_BOMB,
    C_FLAME,
    C_RIGID,
    C_WOOD,
    FLAME_LIFETIME,
    MAX_BOMBS,
    MAX_FLAMES,
)
from ..core.state import (
    Flames,
    I32,
    State,
    cell_index,
    flag_item,
    get_bomb_index,
    is_agent,
    pop_bomb,
    remove_bomb,
)

# Ray order of SpawnFlame: right (+x), left (-x), then +y, then -y
# (bboard.cpp:221-262; the code comments call +y "top").
_RAY_DX = jnp.asarray((1, -1, 0, 0), I32)
_RAY_DY = jnp.asarray((0, 0, 1, -1), I32)

_STACK_DEPTH = MAX_BOMBS + 2


class _Stack(NamedTuple):
    ox: jax.Array        # i32[D] flame origin x
    oy: jax.Array        # i32[D] flame origin y
    strength: jax.Array  # i32[D] ray length
    dir: jax.Array       # i32[D] current ray 0..3 (4 = done)
    ri: jax.Array        # i32[D] current ray step, 1..strength
    pending: jax.Array   # bool[D] waiting for a chained explosion to return


def masked_kill(state: State, agent_id, do) -> State:
    """State::Kill (bboard.hpp:474-481) gated by ``do`` (both traced)."""
    was_dead = state.agent_dead[agent_id]
    return state._replace(
        agent_dead=state.agent_dead.at[agent_id].set(was_dead | do),
        alive_count=state.alive_count - (do & ~was_dead).astype(I32),
    )


def _kill_agent_on_cell(state: State, item) -> State:
    """Kill the agent encoded in a board cell value, if any (bboard.cpp:26-29)."""
    on = is_agent(item)
    aid = jnp.where(on, item - C_AGENT0, 0)
    return masked_kill(state, aid, on)


def _flame_origin(state: State, x, y, strength) -> State:
    """Common origin handling of SpawnFlame (bboard.cpp:198-218).

    Appends the flame record, kills any agent standing on the origin, and
    stamps the origin cell with this flame's signature (powerup flag cleared).
    """
    new_flames, _, new_count = q.append(
        state.flames,
        Flames(
            x=jnp.asarray(x, I32),
            y=jnp.asarray(y, I32),
            timer=jnp.asarray(FLAME_LIFETIME, I32),
            strength=jnp.asarray(strength, I32),
        ),
        state.flame_head,
        state.flame_count,
        MAX_FLAMES,
    )
    state = state._replace(flames=new_flames, flame_count=new_count)
    c = cell_index(x, y)
    state = _kill_agent_on_cell(state, state.board[c])
    return state._replace(
        board=state.board.at[c].set(C_FLAME),
        flame_sig=state.flame_sig.at[c].set(c),
        hidden_pow=state.hidden_pow.at[c].set(0),
    )


def _stack_set(stk: _Stack, t, **kw) -> _Stack:
    d = stk._asdict()
    for k, v in kw.items():
        d[k] = d[k].at[t].set(v)
    return _Stack(**d)


def _advance_ray(stk: _Stack, t, stop) -> _Stack:
    """Move to the next ray cell; on ``stop`` or ray end, to the next ray."""
    nxt = stk.ri[t] + 1
    done = stop | (nxt > stk.strength[t])
    return _stack_set(
        stk,
        t,
        dir=jnp.where(done, stk.dir[t] + 1, stk.dir[t]),
        ri=jnp.where(done, 1, nxt),
    )


def _write_flame_cell(state: State, c, sig, pow_flag) -> State:
    return state._replace(
        board=state.board.at[c].set(C_FLAME),
        flame_sig=state.flame_sig.at[c].set(sig),
        hidden_pow=state.hidden_pow.at[c].set(pow_flag),
    )


def _dfs_body(carry):
    state, stk, sp = carry
    t = sp - 1
    ox, oy = stk.ox[t], stk.oy[t]
    d = jnp.clip(stk.dir[t], 0, 3)
    cx = ox + stk.ri[t] * _RAY_DX[d]
    cy = oy + stk.ri[t] * _RAY_DY[d]
    sig = cell_index(ox, oy)
    c = cell_index(jnp.clip(cx, 0, 10), jnp.clip(cy, 0, 10))
    oob = (cx < 0) | (cy < 0) | (cx > 10) | (cy > 10)

    def on_pending(state, stk, sp):
        # A chained explosion under this ray cell returned: overwrite the cell
        # with OUR signature (wasWood is false here) and continue the ray
        # (bboard.cpp:42-51 resuming after the ExplodeBombAt at :30-40).
        state = _write_flame_cell(state, c, sig, jnp.zeros((), I32))
        stk2 = _advance_ray(_stack_set(stk, t, pending=False), t, False)
        return state, stk2, sp

    def on_frame_done(state, stk, sp):
        return state, stk, sp - 1

    def on_oob(state, stk, sp):
        # Ray leaves the board (bounds breaks in bboard.cpp:223,234,245,257).
        return state, _stack_set(stk, t, dir=stk.dir[t] + 1, ri=1), sp

    def on_cell(state, stk, sp):
        item = state.board[c]
        state = _kill_agent_on_cell(state, item)
        bomb_idx = get_bomb_index(state, cx, cy)
        chained = ((item == C_BOMB) | is_agent(item)) & (bomb_idx >= 0)

        def explode(state, stk, sp):
            # ExplodeBombAt (bboard.cpp:111-118): live owner strength.
            bid = q.get(state.bombs.id, state.bomb_head, bomb_idx)
            stg2 = state.agent_strength[bid]
            state = remove_bomb(state, bomb_idx)
            state = state._replace(
                agent_bomb_count=state.agent_bomb_count.at[bid].add(-1)
            )
            state = _flame_origin(state, cx, cy, stg2)
            stk2 = _stack_set(stk, t, pending=True)
            stk2 = _stack_set(
                stk2, sp, ox=cx, oy=cy, strength=stg2,
                dir=jnp.zeros((), I32), ri=jnp.ones((), I32),
                pending=jnp.zeros((), jnp.bool_),
            )
            return state, stk2, sp + 1

        def burn(state, stk, sp):
            # SpawnFlameItem tail (bboard.cpp:42-56).
            rigid = item == C_RIGID

            def on_rigid(state, stk, sp):
                return state, _stack_set(stk, t, dir=stk.dir[t] + 1, ri=1), sp

            def on_burnable(state, stk, sp):
                was_wood = item == C_WOOD
                pow_flag = jnp.where(was_wood, state.hidden_pow[c], 0).astype(I32)
                state = _write_flame_cell(state, c, sig, pow_flag)
                return state, _advance_ray(stk, t, was_wood), sp

            return lax.cond(rigid, on_rigid, on_burnable, state, stk, sp)

        return lax.cond(chained, explode, burn, state, stk, sp)

    def not_pending(state, stk, sp):
        return lax.cond(
            stk.dir[t] >= 4,
            on_frame_done,
            lambda s, k, p: lax.cond(oob, on_oob, on_cell, s, k, p),
            state, stk, sp,
        )

    return lax.cond(stk.pending[t], on_pending, not_pending, state, stk, sp)


def spawn_flame(state: State, x, y, strength) -> State:
    """State::SpawnFlame (bboard.cpp:198-263) incl. chained explosions."""
    x = jnp.asarray(x, I32)
    y = jnp.asarray(y, I32)
    strength = jnp.asarray(strength, I32)
    state = _flame_origin(state, x, y, strength)
    zi = jnp.zeros((_STACK_DEPTH,), I32)
    stk = _Stack(
        ox=zi.at[0].set(x),
        oy=zi.at[0].set(y),
        strength=zi.at[0].set(strength),
        dir=zi,
        ri=zi.at[0].set(1),
        pending=jnp.zeros((_STACK_DEPTH,), jnp.bool_),
    )
    state, _, _ = lax.while_loop(
        lambda c: c[2] > 0, _dfs_body, (state, stk, jnp.ones((), I32))
    )
    return state


def explode_bomb_at(state: State, i) -> State:
    """State::ExplodeBombAt (bboard.cpp:111-118): live owner strength."""
    bx = q.get(state.bombs.x, state.bomb_head, i)
    by = q.get(state.bombs.y, state.bomb_head, i)
    bid = q.get(state.bombs.id, state.bomb_head, i)
    strength = state.agent_strength[bid]
    state = remove_bomb(state, i)
    state = state._replace(
        agent_bomb_count=state.agent_bomb_count.at[bid].add(-1)
    )
    return spawn_flame(state, bx, by, strength)


def explode_top_bomb(state: State) -> State:
    """State::ExplodeTopBomb (bboard.cpp:191-196): stored strength, PopBomb."""
    bx = q.get(state.bombs.x, state.bomb_head, 0)
    by = q.get(state.bombs.y, state.bomb_head, 0)
    strength = q.get(state.bombs.strength, state.bomb_head, 0)
    state = pop_bomb(state)
    return spawn_flame(state, bx, by, strength)


def pop_flame(state: State) -> State:
    """State::PopFlame (bboard.cpp:148-180).

    Clears only cells whose signature matches this flame's origin
    ("only vanish your own flame"), revealing hidden powerups via FlagItem.
    """
    fx = q.get(state.flames.x, state.flame_head, 0)
    fy = q.get(state.flames.y, state.flame_head, 0)
    s = q.get(state.flames.strength, state.flame_head, 0)
    sig = cell_index(fx, fy)

    idx = jnp.arange(state.board.shape[0])
    x = idx % 11
    y = idx // 11
    in_cross = ((y == fy) & (jnp.abs(x - fx) <= s)) | (
        (x == fx) & (jnp.abs(y - fy) <= s)
    )
    mine = in_cross & (state.board == C_FLAME) & (state.flame_sig == sig)

    board = jnp.where(mine, flag_item(state.hidden_pow), state.board)
    head, count = q.pop_front(state.flame_head, state.flame_count, MAX_FLAMES)
    return state._replace(
        board=board,
        flame_sig=jnp.where(mine, 0, state.flame_sig),
        hidden_pow=jnp.where(mine, 0, state.hidden_pow),
        flame_head=head,
        flame_count=count,
    )


def tick_flames(state: State) -> State:
    """util::TickFlames (step_utility.cpp:208-222).

    All flame timers decrement; front flames reaching 0 are popped.  (Flames
    are queued in creation order with equal lifetimes, so the front always
    holds the minimum timer -- popping from the front is exhaustive.)
    """
    n = MAX_FLAMES
    r = (jnp.arange(n) - state.flame_head) % n
    valid = r < state.flame_count
    timer = jnp.where(valid, state.flames.timer - 1, state.flames.timer)
    state = state._replace(flames=state.flames._replace(timer=timer))

    def cond(s):
        return (s.flame_count > 0) & (
            q.get(s.flames.timer, s.flame_head, 0) == 0
        )

    return lax.while_loop(cond, pop_flame, state)


def tick_bombs(state: State) -> State:
    """util::TickBombs (step_utility.cpp:224-245).

    All bomb timers decrement; then bombs explode from the queue front while
    the front timer is 0 (a non-zero front stops the sweep -- bombs behind it
    do NOT explode this step even at 0).
    """
    n = MAX_BOMBS
    r = (jnp.arange(n) - state.bomb_head) % n
    valid = r < state.bomb_count
    timer = jnp.where(valid, state.bombs.timer - 1, state.bombs.timer)
    state = state._replace(bombs=state.bombs._replace(timer=timer))

    snapshot = state.bomb_count

    def cond(carry):
        i, s = carry
        return (
            (i < snapshot)
            & (s.bomb_count > 0)
            & (q.get(s.bombs.timer, s.bomb_head, 0) == 0)
        )

    def body(carry):
        i, s = carry
        return i + 1, explode_top_bomb(s)

    _, state = lax.while_loop(cond, body, (jnp.zeros((), I32), state))
    return state
