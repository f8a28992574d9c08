"""Phase 2: bomb kinematics -- blocking, kicking, collisions, bounce-back.

Reference: src/bboard/step.cpp:188-278 plus the reversion/collision machinery
in src/bboard/step_utility.cpp:62-128, 279-329.

The reference's hardest sequential logic, AgentBombChainReversion, is a tail
recursion (agent bounced back -> displaces the agent that took its cell ->
stops a kicked bomb -> displaces the agent at the bomb's origin -> ...).  We
run it as a bounded ``lax.while_loop`` over the chain: one link per iteration,
at most 4 agents + 20 bombs links.

Sequencing quirks preserved:
* Both passes iterate in queue order; the *move* pass re-reads ``bomb_count``
  every iteration because mid-loop explosions (bomb kicked into flames) shrink
  the queue under the loop (step.cpp:230).
* The bomb destination array fed to reversion is filled once, before the block
  pass, and never refreshed (step.cpp:191-192) -- reversion deliberately sees
  stale destinations, and after mid-loop explosions the logical indices it
  scans are misaligned exactly like the reference's.
* Bomb identity in collision checks is *value* equality of the packed bomb
  int (step_utility.cpp:287); we compare all fields, which is identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..core import queue as q
from ..core.constants import (
    AGENT_COUNT,
    C_AGENT0,
    C_BOMB,
    C_FLAME,
    C_PASSAGE,
    M_BOMB,
    M_IDLE,
    MAX_BOMBS,
)
from ..core.state import (
    I32,
    State,
    bomb_at,
    cell_index,
    get_agent,
    get_bomb_index,
    has_bomb,
    is_agent,
    is_out_of_bounds,
    is_static_mov_block,
    is_walkable,
)
from .flames import explode_bomb_at
from . import util


_MAX_CHAIN = AGENT_COUNT + MAX_BOMBS + 1


def _select(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def chain_reversion(state: State, moves, bdest_x, bdest_y, agent_id) -> State:
    """util::AgentBombChainReversion (step_utility.cpp:62-128), iteratively.

    Bounces ``agent_id`` back to its origin cell, cascading through any agent
    that took that cell and any kicked bomb destined for it.
    """

    def cond(carry):
        _, _, active, n = carry
        return active & (n < _MAX_CHAIN)

    def body(carry):
        state, cur, _, n = carry
        m = moves[cur]
        ax = state.agent_x[cur]
        ay = state.agent_y[cur]
        ox, oy = util.origin_position(ax, ay, m)
        oob = is_out_of_bounds(ox, oy)
        oxc = jnp.clip(ox, 0, 10)
        oyc = jnp.clip(oy, 0, 10)

        # Who/what is at the origin BEFORE we move back (step_utility.cpp:70-82).
        ia = get_agent(state, oxc, oyc)
        li = jnp.arange(MAX_BOMBS)
        bmatch = (li < state.bomb_count) & (bdest_x == ox) & (bdest_y == oy)
        has_bomb_dest = jnp.any(bmatch)
        bidx = jnp.argmax(bmatch)

        # Move the agent back (step_utility.cpp:84-87).
        oc = cell_index(oxc, oyc)
        moved = state._replace(
            agent_x=state.agent_x.at[cur].set(ox),
            agent_y=state.agent_y.at[cur].set(oy),
            board=state.board.at[oc].set(C_AGENT0 + cur),
        )

        def after_agent(st):
            """No agent at origin: maybe revert a kicked bomb (89-121)."""
            b = bomb_at(st, bidx)
            bdx = bdest_x[bidx]
            bdy = bdest_y[bidx]
            obx, oby = util.origin_position(bdx, bdy, jnp.clip(b.dir, 0, 4))
            self_laid = has_bomb_dest & (obx == bdx) & (oby == bdy)
            obc = cell_index(jnp.clip(obx, 0, 10), jnp.clip(oby, 0, 10))

            # Agent bounced back onto a bomb it just laid (101-106).
            st_self = st._replace(
                board=st.board.at[obc].set(C_AGENT0 + cur)
            )

            # Otherwise stop the bomb and put it back (108-111).
            ha = get_agent(st, obx, oby)
            bombs = st.bombs
            bombs = bombs._replace(
                dir=q.set_(bombs.dir, st.bomb_head, bidx, jnp.zeros((), I32)),
                x=q.set_(bombs.x, st.bomb_head, bidx, obx),
                y=q.set_(bombs.y, st.bomb_head, bidx, oby),
            )
            st_bomb = st._replace(
                bombs=bombs, board=st.board.at[obc].set(C_BOMB)
            )

            st2 = _select(self_laid, st_self, _select(has_bomb_dest, st_bomb, st))
            cont = has_bomb_dest & ~self_laid & (ha != -1)
            nxt = jnp.where(cont, ha, 0)
            return st2, nxt, cont

        def chase_agent(st):
            return st, ia, jnp.ones((), jnp.bool_)

        st2, nxt, cont = lax.cond(ia != -1, chase_agent, after_agent, moved)

        # Out-of-bounds origin: whole link is a no-op (step_utility.cpp:124-127).
        st2 = _select(oob, state, st2)
        cont = cont & ~oob
        return st2, jnp.where(cont, nxt, 0).astype(I32), cont, n + 1

    state, _, _, _ = lax.while_loop(
        cond,
        body,
        (state, jnp.asarray(agent_id, I32), jnp.ones((), jnp.bool_),
         jnp.zeros((), I32)),
    )
    return state


def _bomb_value_neq(state: State, i):
    """Per-logical-slot mask: bombs[j] != bombs[i] as packed-int values."""
    h = state.bomb_head
    b = state.bombs
    bi = bomb_at(state, i)
    lv = lambda f: q.logical_view(f, h)
    eq = (
        (lv(b.x) == bi.x)
        & (lv(b.y) == bi.y)
        & (lv(b.id) == bi.id)
        & (lv(b.strength) == bi.strength)
        & (lv(b.timer) == bi.timer)
        & (lv(b.dir) == bi.dir)
        & (lv(b.moved) == bi.moved)
    )
    return ~eq


def has_bomb_collision(state: State, i):
    """util::HasBombCollision (step_utility.cpp:279-293), window [i, count)."""
    bi = bomb_at(state, i)
    tx, ty = util.desired_position(bi.x, bi.y, jnp.clip(bi.dir, 0, 4))
    dx, dy = util.fill_bomb_dest(state)
    li = jnp.arange(MAX_BOMBS)
    return jnp.any(
        (li >= i)
        & (li < state.bomb_count)
        & _bomb_value_neq(state, i)
        & (dx == tx)
        & (dy == ty)
    )


def resolve_bomb_collision(state: State, moves, bdest_x, bdest_y, i) -> State:
    """util::ResolveBombCollision (step_utility.cpp:295-329)."""
    bi = bomb_at(state, i)
    tx, ty = util.desired_position(bi.x, bi.y, jnp.clip(bi.dir, 0, 4))
    dx, dy = util.fill_bomb_dest(state)
    li = jnp.arange(MAX_BOMBS)
    collidees = (
        (li >= i)
        & (li < state.bomb_count)
        & _bomb_value_neq(state, i)
        & (dx == tx)
        & (dy == ty)
    )
    has_collided = jnp.any(collidees)

    # All collidees go idle (305-312).
    h = state.bomb_head
    n = MAX_BOMBS
    phys_mask = collidees[(jnp.arange(n) - h) % n]  # logical -> physical
    new_dir = jnp.where(phys_mask, 0, state.bombs.dir)
    state = state._replace(bombs=state.bombs._replace(dir=new_dir))

    # If this bomb was moving, stop it and bounce back its kicker (313-327).
    was_moving = has_collided & (bi.dir != 0)
    state2 = state._replace(
        bombs=state.bombs._replace(
            dir=q.set_(
                state.bombs.dir, h, i,
                jnp.where(was_moving, 0, q.get(state.bombs.dir, h, i)),
            )
        )
    )
    ia = get_agent(state2, bi.x, bi.y)
    revert = (
        was_moving
        & (ia > -1)
        & (moves[jnp.clip(ia, 0, 3)] != M_IDLE)
        & (moves[jnp.clip(ia, 0, 3)] != M_BOMB)
    )
    reverted = chain_reversion(
        state2, moves, bdest_x, bdest_y, jnp.where(revert, ia, 0)
    )
    # The reference writes through a live reference to bombs[i], whose
    # position the reversion may have just changed (step_utility.cpp:322-323).
    bi_after = bomb_at(reverted, i)
    reverted = reverted._replace(
        board=reverted.board.at[cell_index(bi_after.x, bi_after.y)].set(C_BOMB)
    )
    return _select(revert, reverted, state2)


def bomb_block_pass(state: State, moves, bdest_x, bdest_y, old_x, old_y) -> State:
    """step.cpp:195-227: stop bombs blocked by walls/static items/agents and
    bounce back any agent that moved onto a now-stuck bomb this turn."""

    def body(i, state):
        in_range = i < state.bomb_count
        b = bomb_at(state, i)
        tx, ty = util.desired_position(b.x, b.y, jnp.clip(b.dir, 0, 4))
        oob = is_out_of_bounds(tx, ty)
        tc = cell_index(jnp.clip(tx, 0, 10), jnp.clip(ty, 0, 10))
        titem = state.board[tc]
        blocked = in_range & (oob | is_static_mov_block(titem) | is_agent(titem))

        h = state.bomb_head
        state = state._replace(
            bombs=state.bombs._replace(
                dir=q.set_(
                    state.bombs.dir, h, i,
                    jnp.where(blocked, 0, q.get(state.bombs.dir, h, i)),
                )
            )
        )

        ia = get_agent(state, b.x, b.y)
        sa = jnp.clip(ia, 0, 3)
        revert = (
            blocked
            & (ia > -1)
            & (moves[sa] != M_IDLE)
            & (moves[sa] != M_BOMB)
            # Bounced back to the bomb he was already standing on (step.cpp:212-214).
            & ~((state.agent_x[sa] == old_x[sa]) & (state.agent_y[sa] == old_y[sa]))
        )
        reverted = chain_reversion(
            state, moves, bdest_x, bdest_y, jnp.where(revert, ia, 0)
        )
        # Restore the BOMB item if the reversion vacated this bomb's cell.
        vacated = get_agent(reverted, b.x, b.y) == -1
        bc = cell_index(b.x, b.y)
        reverted = reverted._replace(
            board=reverted.board.at[bc].set(
                jnp.where(vacated, C_BOMB, reverted.board[bc])
            )
        )
        return _select(revert, reverted, state)

    return lax.fori_loop(0, MAX_BOMBS, body, state)


def bomb_move_pass(state: State, moves, bdest_x, bdest_y) -> State:
    """step.cpp:230-278: move kicked bombs, resolve bomb-bomb collisions,
    explode bombs sliding into flames."""

    def cond(carry):
        i, state = carry
        return i < state.bomb_count

    def body(carry):
        i, state = carry
        b = bomb_at(state, i)
        collides = has_bomb_collision(state, i)

        # Idle bombs: only collision resolution (step.cpp:234-241).
        idle_resolve = (b.dir == 0) & collides

        tx, ty = util.desired_position(b.x, b.y, jnp.clip(b.dir, 0, 4))
        oob = is_out_of_bounds(tx, ty)
        tc = cell_index(jnp.clip(tx, 0, 10), jnp.clip(ty, 0, 10))
        titem = state.board[tc]
        can_enter = ~oob & ~is_static_mov_block(titem)

        moving_resolve = ~idle_resolve & can_enter & collides
        do_resolve = idle_resolve | moving_resolve

        def resolve(st):
            return resolve_bomb_collision(st, moves, bdest_x, bdest_y, i)

        def advance(st):
            def do_move(st):
                h = st.bomb_head
                bombs = st.bombs._replace(
                    x=q.set_(st.bombs.x, h, i, tx),
                    y=q.set_(st.bombs.y, h, i, ty),
                )
                st = st._replace(bombs=bombs)
                # Clear the old cell if no bomb remains there (step.cpp:260-263).
                oc = cell_index(b.x, b.y)
                clear = ~has_bomb(st, b.x, b.y) & (st.board[oc] == C_BOMB)
                st = st._replace(
                    board=st.board.at[oc].set(
                        jnp.where(clear, C_PASSAGE, st.board[oc])
                    )
                )

                def into_walkable(st):
                    return st._replace(board=st.board.at[tc].set(C_BOMB))

                def into_flame(st):
                    return explode_bomb_at(st, get_bomb_index(st, tx, ty))

                return lax.cond(
                    is_walkable(titem),
                    into_walkable,
                    lambda s: lax.cond(
                        titem == C_FLAME, into_flame, lambda t: t, s
                    ),
                    st,
                )

            def go_idle(st):
                h = st.bomb_head
                return st._replace(
                    bombs=st.bombs._replace(
                        dir=q.set_(st.bombs.dir, h, i, jnp.zeros((), I32))
                    )
                )

            return lax.cond(can_enter, do_move, go_idle, st)

        state = lax.cond(do_resolve, resolve, advance, state)
        return i + 1, state

    _, state = lax.while_loop(cond, body, (jnp.zeros((), I32), state))
    return state
