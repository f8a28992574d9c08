"""The cellular step engine: the TPU-native production path.

The exact engine (engine/step.py) replicates the reference's queue-and-
recursion architecture bit-for-bit; it is the conformance oracle, but its
program is ~12k ops of scalar gathers and nested loops -- hostile to XLA/TPU.
This module re-derives the same game as a *cellular automaton* over per-cell
planes, which is the form the hardware wants: every phase is a handful of
[121]-wide vector ops (vmapped to [B, 121]).

Performance rules this file obeys (XLA/TPU lowers dynamic scatter/gather to
serialized updates, which murders throughput at batch size):

* NO dynamic-index scatter or gather anywhere on the step path.  Bomb
  kinematics use directional plane shifts (a bomb moves one cell per step,
  so "what arrives at cell c" is a shifted plane); agent-indexed reads and
  writes (4 agents) use one-hot compares, which preserve sequential write
  order.
* Explosion rays are blocked max-plus segment scans (`associative_scan`),
  log-depth instead of per-cell walks.
* The only loop whose trip count is data-dependent is the explosion chain
  round (`while_loop`), and its body is pure vector ops.

Key equivalences that make the plane representation faithful:

* Flame signatures ("only vanish your own flame", bboard.cpp:148-180) are
  equivalent to a per-cell last-write timer: a flame cell is cleared exactly
  FLAME_LIFETIME steps after the last flame wrote it, because all flame
  records carry the same lifetime.
* The bomb queue's "explode from the front while timer==0" sweep
  (step_utility.cpp:224-245) equals "explode every timer==0 bomb": timers
  are planted equal and tick together, so they are monotone along the queue.
* At most one bomb occupies a cell (collision resolution guarantees it), so
  bombs are per-cell planes {timer, strength, dir, owner}.

Documented divergences from the reference (attributed per-transition in
tests/test_cellular.py; each is an explicit rule choice, not an accident).
Measured real-play frequency (scripts/divergence_census.py, 10k random
full games x both kick modes, first-divergence semantics): **155 ppm of
live board-steps total** — class 1: 29, class 2: 10, class 3: 4, class 4:
0, unclassified: 0 (of 277,177 synced live board-steps; BASELINE.md).
Random play is the worst case (it plants on occupied bomb cells
constantly; scripted/trained policies do not):

1. Planting on a cell that already holds a bomb is refused.  The reference
   allows stacking two bombs on one cell (PlantBomb checks only the count,
   bboard.cpp:125-146) -- a queue artifact standard Pommerman rejects.
2. A fresh plant always starts with direction IDLE.  The reference recycles
   queue slots without resetting direction (bboard.cpp:125-146), so a new
   bomb can inherit a stale direction and slide on its own.
3. Explosion chains run in breadth-first rounds on the round-start board
   instead of depth-first with suspend/resume; visible only when two same-
   step rays compete for one wood cell or a chain re-orders flame overwrite.
   This is the dominant class in bomb-dense play (~0.07% of SimpleAgent
   self-play steps, r5 census) and is KEPT deliberately: DFS suspend/
   resume is inherently sequential (hostile to the lockstep plane
   design), both orders are valid Pommerman rules, and the upstream
   python playground's engine explodes same-step chains all-at-once --
   closer to OUR rule than to the reference's recursion.
4. Simultaneous multi-chain bounce-backs and multi-bomb pileups resolve in
   cell order rather than queue order.  This includes the single-kick
   variant (r5 census find): kicking a bomb into a cell whose next cell
   holds a STATIONARY bomb — the reference's queue-windowed collision
   scan leaves the kicker standing on the stopped bomb, while the
   per-cell arrival count bounces the kicker back.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.constants import (
    AGENT_COUNT,
    BOARD_SIZE,
    BOMB_LIFETIME,
    C_AGENT0,
    C_BOMB,
    C_EXTRABOMB,
    C_FLAME,
    C_INCRRANGE,
    C_KICK,
    C_PASSAGE,
    C_RIGID,
    C_WOOD,
    FLAME_LIFETIME,
    M_BOMB,
    MOVE_DX,
    MOVE_DY,
    NUM_CELLS,
)
from ..core import queue as q
from ..core.state import I32, State, flag_item, is_agent, is_powerup

BOOL = jnp.bool_
_DX = jnp.asarray(MOVE_DX, I32)
_DY = jnp.asarray(MOVE_DY, I32)
_CELL_X = jnp.arange(NUM_CELLS, dtype=I32) % BOARD_SIZE
_CELL_Y = jnp.arange(NUM_CELLS, dtype=I32) // BOARD_SIZE

# Direction codes reuse move codes 1..4: UP(-y), DOWN(+y), LEFT(-x), RIGHT(+x).
_OPP = {1: 2, 2: 1, 3: 4, 4: 3}


class CellState(NamedTuple):
    """Plane-encoded game state; a batch is a leading axis (vmap)."""

    board: jax.Array          # i32[121] cell classes (C_*)
    hidden_pow: jax.Array     # i32[121] hidden powerup under WOOD / in FLAME
    flame_timer: jax.Array    # i32[121] steps until flame clears (0 = none)
    bomb_timer: jax.Array     # i32[121] ticks to explosion (0 = no bomb)
    bomb_strength: jax.Array  # i32[121] blast radius (stored at plant)
    bomb_dir: jax.Array       # i32[121] sliding direction (0 = idle)
    bomb_owner: jax.Array     # i32[121] owner agent id

    agent_x: jax.Array        # i32[4]
    agent_y: jax.Array        # i32[4]
    agent_bomb_count: jax.Array
    agent_max_bombs: jax.Array
    agent_strength: jax.Array
    agent_can_kick: jax.Array  # bool[4]
    agent_dead: jax.Array      # bool[4]

    alive_count: jax.Array    # i32
    timestep: jax.Array       # i32


# --- Shift / one-hot primitives (the only "memory ops" on the step path) -----


def _push(plane, d: int, fill):
    """What arrives at each cell from a move in direction d: out[c] = plane[c-d]."""
    p = plane.reshape(plane.shape[:-1] + (BOARD_SIZE, BOARD_SIZE))
    fr = jnp.full_like(p[..., :1, :], fill)
    fc = jnp.full_like(p[..., :, :1], fill)
    if d == 1:    # UP (y-1): arrives from below
        s = jnp.concatenate([p[..., 1:, :], fr], axis=-2)
    elif d == 2:  # DOWN (y+1): arrives from above
        s = jnp.concatenate([fr, p[..., :-1, :]], axis=-2)
    elif d == 3:  # LEFT (x-1): arrives from the right
        s = jnp.concatenate([p[..., :, 1:], fc], axis=-1)
    else:         # RIGHT (x+1): arrives from the left
        s = jnp.concatenate([fc, p[..., :, :-1]], axis=-1)
    return s.reshape(plane.shape)


def _pull(plane, d: int, fill):
    """Value at each cell's direction-d neighbor: out[c] = plane[c+d]."""
    return _push(plane, _OPP[d], fill)


def _dest_val(plane, dir_plane, fill):
    """Value at each cell's destination (dir 0 = the cell itself)."""
    out = plane
    for d in (1, 2, 3, 4):
        out = jnp.where(dir_plane == d, _pull(plane, d, fill), out)
    return out


def _dest_oob(dir_plane):
    """True where the destination lies off-board."""
    return (
        ((dir_plane == 1) & (_CELL_Y == 0))
        | ((dir_plane == 2) & (_CELL_Y == BOARD_SIZE - 1))
        | ((dir_plane == 3) & (_CELL_X == 0))
        | ((dir_plane == 4) & (_CELL_X == BOARD_SIZE - 1))
    )


def _cell(x, y):
    return x + BOARD_SIZE * y


def _onehot(x, y):
    """[4, 121] one-hot of agent cells (rows masked later by callers)."""
    return _cell(x, y)[:, None] == jnp.arange(NUM_CELLS, dtype=I32)[None, :]


def _read_cells(plane, oh):
    """plane[cell_i] for each agent via one-hot reduce -> [4]."""
    if plane.dtype == BOOL:
        return jnp.any(oh & plane[None, :], axis=1)
    return jnp.sum(jnp.where(oh, plane[None, :], 0), axis=1)


def _write_cells(plane, oh, values, mask):
    """Sequential per-agent cell writes (later agent wins), scatter-free."""
    out = plane
    for i in range(AGENT_COUNT):
        out = jnp.where(oh[i] & mask[i], values[i], out)
    return out


def empty_cell_state() -> CellState:
    """All-passage board, agents at (0,0), default stats (cf. empty_state)."""
    zc = jnp.zeros((NUM_CELLS,), I32)
    za = jnp.zeros((AGENT_COUNT,), I32)
    return CellState(
        board=zc,
        hidden_pow=zc,
        flame_timer=zc,
        bomb_timer=zc,
        bomb_strength=zc,
        bomb_dir=zc,
        bomb_owner=zc,
        agent_x=za,
        agent_y=za,
        agent_bomb_count=za,
        agent_max_bombs=jnp.ones((AGENT_COUNT,), I32),
        agent_strength=jnp.ones((AGENT_COUNT,), I32),
        agent_can_kick=jnp.zeros((AGENT_COUNT,), BOOL),
        agent_dead=jnp.zeros((AGENT_COUNT,), BOOL),
        alive_count=jnp.asarray(AGENT_COUNT, I32),
        timestep=jnp.zeros((), I32),
    )


# --- Conversion from the queue-encoded exact state (tests/interop only) ------


def from_state(s: State) -> CellState:
    """Scatter the queue state into planes (host/test path; scatters OK)."""
    n = s.bombs.x.shape[0]
    li = jnp.arange(n)
    lv = lambda f: q.logical_view(f, s.bomb_head)
    bx, by = lv(s.bombs.x), lv(s.bombs.y)
    valid = li < s.bomb_count
    c = jnp.clip(_cell(bx, by), 0, NUM_CELLS - 1)
    zero = jnp.zeros((NUM_CELLS,), I32)

    def scat(field):
        return zero.at[c].max(jnp.where(valid, lv(field), 0))

    fn = s.flames.x.shape[0]
    fli = jnp.arange(fn)
    flv = lambda f: q.logical_view(f, s.flame_head)
    fx, fy, ft = flv(s.flames.x), flv(s.flames.y), flv(s.flames.timer)
    fvalid = fli < s.flame_count
    sig = _cell(fx, fy)
    match = fvalid[None, :] & (sig[None, :] == s.flame_sig[:, None])
    flame_timer = jnp.max(
        jnp.where(match, ft[None, :], 0), axis=1
    ) * (s.board == C_FLAME)

    return CellState(
        board=s.board,
        hidden_pow=s.hidden_pow,
        flame_timer=flame_timer.astype(I32),
        bomb_timer=scat(s.bombs.timer),
        bomb_strength=scat(s.bombs.strength),
        bomb_dir=scat(s.bombs.dir),
        bomb_owner=scat(s.bombs.id),
        agent_x=s.agent_x,
        agent_y=s.agent_y,
        agent_bomb_count=s.agent_bomb_count,
        agent_max_bombs=s.agent_max_bombs,
        agent_strength=s.agent_strength,
        agent_can_kick=s.agent_can_kick,
        agent_dead=s.agent_dead,
        alive_count=s.alive_count,
        timestep=s.timestep,
    )


def to_state(cs: CellState) -> State:
    """Rebuild a queue-encoded ``State`` from planes (host/test path).

    Bomb queue order is recovered as (timer asc, owner asc): timers are
    monotone along the reference queue and same-step plants append in agent
    order, so this reproduces the reference ordering for every state the
    cellular engine can produce.  Flame records are synthesized one-per-cell
    (origin = the cell itself) -- extinguish timing is identical because
    per-cell timers ARE the signature semantics (see module header).
    """
    import numpy as np

    from ..core.state import empty_state

    bt = np.asarray(cs.bomb_timer)
    cells = np.nonzero(bt > 0)[0]
    order = sorted(
        cells.tolist(),
        key=lambda c: (int(bt[c]), int(np.asarray(cs.bomb_owner)[c])),
    )
    s = empty_state()
    s = s._replace(
        board=jnp.asarray(np.asarray(cs.board)),
        hidden_pow=jnp.asarray(np.asarray(cs.hidden_pow)),
        agent_x=cs.agent_x,
        agent_y=cs.agent_y,
        agent_bomb_count=cs.agent_bomb_count,
        agent_max_bombs=cs.agent_max_bombs,
        agent_strength=cs.agent_strength,
        agent_can_kick=cs.agent_can_kick,
        agent_dead=cs.agent_dead,
        alive_count=cs.alive_count,
        timestep=cs.timestep,
    )
    bombs = s.bombs
    for i, c in enumerate(order):
        bombs = bombs._replace(
            x=bombs.x.at[i].set(c % BOARD_SIZE),
            y=bombs.y.at[i].set(c // BOARD_SIZE),
            id=bombs.id.at[i].set(int(np.asarray(cs.bomb_owner)[c])),
            strength=bombs.strength.at[i].set(
                int(np.asarray(cs.bomb_strength)[c])
            ),
            timer=bombs.timer.at[i].set(int(bt[c])),
            dir=bombs.dir.at[i].set(int(np.asarray(cs.bomb_dir)[c])),
        )
    s = s._replace(bombs=bombs, bomb_count=jnp.asarray(len(order), I32))

    ft = np.asarray(cs.flame_timer)
    fcells = np.nonzero((ft > 0) & (np.asarray(cs.board) == C_FLAME))[0]
    forder = sorted(fcells.tolist(), key=lambda c: int(ft[c]))
    flames = s.flames
    sig = s.flame_sig
    for i, c in enumerate(forder):
        flames = flames._replace(
            x=flames.x.at[i].set(c % BOARD_SIZE),
            y=flames.y.at[i].set(c // BOARD_SIZE),
            timer=flames.timer.at[i].set(int(ft[c])),
            strength=flames.strength.at[i].set(0),
        )
        sig = sig.at[c].set(c)
    return s._replace(
        flames=flames,
        flame_count=jnp.asarray(len(forder), I32),
        flame_sig=sig,
    )


# --- Phase 0: flame decay ----------------------------------------------------


def _tick_flames(cs: CellState) -> CellState:
    ft = jnp.maximum(cs.flame_timer - 1, 0)
    expired = (ft == 0) & (cs.board == C_FLAME)
    board = jnp.where(expired, flag_item(cs.hidden_pow & 0b11), cs.board)
    return cs._replace(
        board=board.astype(I32),
        hidden_pow=jnp.where(expired, 0, cs.hidden_pow),
        flame_timer=ft,
    )


# --- Phase 1: agent movement -------------------------------------------------


def _fix_switch(ax, ay, dx, dy):
    """FixSwitchMove (step_utility.cpp:154-170), same pair order."""
    for i in range(AGENT_COUNT):
        for j in range(i, AGENT_COUNT):
            swap = (
                (dx[i] == ax[j]) & (dy[i] == ay[j])
                & (dx[j] == ax[i]) & (dy[j] == ay[i])
            )
            dx = dx.at[i].set(jnp.where(swap, ax[i], dx[i]))
            dy = dy.at[i].set(jnp.where(swap, ay[i], dy[i]))
            dx = dx.at[j].set(jnp.where(swap, ax[j], dx[j]))
            dy = dy.at[j].set(jnp.where(swap, ay[j], dy[j]))
    return dx, dy


def _move_agents(cs: CellState, moves):
    alive = ~cs.agent_dead
    m = jnp.clip(moves, 0, 5)
    directional = (m >= 1) & (m <= 4)
    ax, ay = cs.agent_x, cs.agent_y
    dx = ax + _DX[m]
    dy = ay + _DY[m]
    dx, dy = _fix_switch(ax, ay, dx, dy)
    directional = directional & ((dx != ax) | (dy != ay))

    inb = (dx >= 0) & (dy >= 0) & (dx < BOARD_SIZE) & (dy < BOARD_SIZE)
    oh_dest = _onehot(jnp.clip(dx, 0, 10), jnp.clip(dy, 0, 10)) & inb[:, None]
    oh_org = _onehot(ax, ay)
    dest_item = _read_cells(cs.board, oh_dest)

    # Ouroboros: nobody is a movement root (step_utility.cpp:172-205).
    targets_other = (
        alive[None, :]
        & (jnp.arange(4)[:, None] != jnp.arange(4)[None, :])
        & (dx[:, None] == ax[None, :])
        & (dy[:, None] == ay[None, :])
    )
    is_root = cs.agent_dead | ~jnp.any(targets_other, axis=1)
    ouroboros = ~jnp.any(is_root)

    # Flame deaths (step.cpp:84-99).
    victim = alive & directional & inb & (dest_item == C_FLAME)

    # Destination collisions among live non-victims (step_utility.cpp:264-277).
    cand = alive & ~victim
    same_dest = (
        cand[None, :]
        & (jnp.arange(4)[:, None] != jnp.arange(4)[None, :])
        & (dx[:, None] == dx[None, :])
        & (dy[:, None] == dy[None, :])
    )
    coll = jnp.any(same_dest, axis=1)

    base = alive & directional & inb & ~victim & ~coll
    enterable = (
        (dest_item == C_PASSAGE) | is_powerup(dest_item) | (dest_item == C_BOMB)
    )
    dest_agent = is_agent(dest_item)
    dest_aid = jnp.clip(dest_item - C_AGENT0, 0, 3)

    # Chain fixed point: entering an occupied cell requires its occupant to
    # vacate (move or die); a 4-cycle rotates unconditionally (step.cpp:70-82).
    move = jnp.zeros((4,), BOOL)
    for _ in range(AGENT_COUNT):
        vacating = dest_agent & (move[dest_aid] | victim[dest_aid])
        move = base & (enterable | vacating | (ouroboros & dest_agent))

    # Kicks: mover onto a bomb cell with canKick (step.cpp:147-169).
    has_bomb_dest = _read_cells(cs.bomb_timer, oh_dest) > 0
    kick = move & cs.agent_can_kick & has_bomb_dest
    bomb_dir = _write_cells(cs.bomb_dir, oh_dest, m, kick)

    # Powerups (step.cpp:111-114, step_utility.cpp:247-262).
    take = move & is_powerup(dest_item)
    max_bombs = cs.agent_max_bombs + (take & (dest_item == C_EXTRABOMB))
    strength = cs.agent_strength + (take & (dest_item == C_INCRRANGE))
    can_kick = cs.agent_can_kick | (take & (dest_item == C_KICK))

    # Board: vacate origins of movers and flame victims, then place movers.
    vacate = move | victim
    org_bomb = _read_cells(cs.bomb_timer, oh_org) > 0
    vac_val = jnp.where(org_bomb, C_BOMB, C_PASSAGE).astype(I32)
    board = _write_cells(cs.board, oh_org, vac_val, vacate)
    board = _write_cells(
        board, oh_dest, C_AGENT0 + jnp.arange(4, dtype=I32), move
    )

    dead = cs.agent_dead | victim
    alive_count = cs.alive_count - jnp.sum(victim).astype(I32)
    nx = jnp.where(move, dx, ax)
    ny = jnp.where(move, dy, ay)

    # Plants: BOMB move, capacity left, no bomb already here (divergence #1).
    plant = (
        alive
        & (moves == M_BOMB)
        & (cs.agent_bomb_count < cs.agent_max_bombs)
        & ~org_bomb
    )
    ids = jnp.arange(4, dtype=I32)
    lt = jnp.full((4,), BOMB_LIFETIME + 1, I32)
    bomb_timer = _write_cells(cs.bomb_timer, oh_org, lt, plant)
    bomb_strength = _write_cells(
        cs.bomb_strength, oh_org, cs.agent_strength, plant
    )
    bomb_owner = _write_cells(cs.bomb_owner, oh_org, ids, plant)
    bomb_dir = _write_cells(bomb_dir, oh_org, jnp.zeros((4,), I32), plant)
    bomb_count = cs.agent_bomb_count + plant.astype(I32)

    return cs._replace(
        board=board.astype(I32),
        bomb_timer=bomb_timer,
        bomb_strength=bomb_strength,
        bomb_dir=bomb_dir,
        bomb_owner=bomb_owner,
        agent_x=nx,
        agent_y=ny,
        agent_bomb_count=bomb_count,
        agent_max_bombs=max_bombs.astype(I32),
        agent_strength=strength.astype(I32),
        agent_can_kick=can_kick,
        agent_dead=dead,
        alive_count=alive_count,
    )


# --- Phase 2: bomb kinematics ------------------------------------------------


def _static_block(item):
    return (item == C_RIGID) | (item == C_WOOD) | is_powerup(item)


def _revert_chain(cs: CellState, moves, trigger, dir0):
    """AgentBombChainReversion (step_utility.cpp:62-128), vectorized.

    ``trigger`` is a bool[4] mask of agents to bounce back; chains cascade
    through displaced agents and kicked bombs destined for vacated cells.
    ``dir0`` is the phase-start direction plane: the reference fills bomb
    destinations once and reversion sees those stale values
    (step.cpp:191-192).
    """
    agent_ids = jnp.arange(4, dtype=I32)
    eye = agent_ids[:, None] == agent_ids[None, :]
    m = jnp.clip(moves, 0, 5)
    mdx = _DX[m]
    mdy = _DY[m]
    has_bomb = cs.bomb_timer > 0

    def link(carry, _):
        board, ax, ay, bomb_dir, cur, done = carry
        ox = ax - mdx
        oy = ay - mdy
        oinb = (ox >= 0) & (oy >= 0) & (ox < BOARD_SIZE) & (oy < BOARD_SIZE)
        act = cur & oinb
        done = done | act
        oh_org = _onehot(jnp.clip(ox, 0, 10), jnp.clip(oy, 0, 10)) & act[:, None]

        # Occupant of each origin cell (get_agent, bboard.cpp:289-299).
        here = (
            ~cs.agent_dead[None, :]
            & (ax[None, :] == ox[:, None])
            & (ay[None, :] == oy[:, None])
            & ~eye
        )
        occ = jnp.where(
            jnp.any(here, axis=1), jnp.argmax(here, axis=1), -1
        ).astype(I32)

        # Bomb handling runs only when no agent occupies the origin
        # (step_utility.cpp:70-121: the agent branch takes priority).
        no_occ = act & (occ < 0)
        wanted = jnp.any(oh_org & no_occ[:, None], axis=0)
        # A bomb is "destined" for a wanted cell per its STALE direction.
        dest_wanted = _dest_val(wanted, dir0, False)
        bomb_to_oc = has_bomb & dest_wanted
        # Self-laid idle bombs (dest == own cell) just get the agent back on
        # top (step_utility.cpp:101-106); moving bombs are stopped in place.
        moving_bomb = bomb_to_oc & (bomb_dir != 0)
        bomb_dir = jnp.where(moving_bomb, 0, bomb_dir)
        board = jnp.where(moving_bomb & ~is_agent(board), C_BOMB, board)

        # Move the reverting agents back.
        board = _write_cells(board, oh_org, C_AGENT0 + agent_ids, act)
        ax = jnp.where(act, ox, ax)
        ay = jnp.where(act, oy, ay)

        # Next links: displaced occupants, plus agents standing where a
        # moving bomb was just stopped (step_utility.cpp:113-120).
        nxt = jnp.any(
            (act & (occ >= 0))[:, None]
            & (occ[:, None] == agent_ids[None, :]),
            axis=0,
        )
        on_stopped = _read_cells(moving_bomb, _onehot(ax, ay)) & ~cs.agent_dead
        cur = (nxt | on_stopped) & ~done
        return (board, ax, ay, bomb_dir, cur, done), None

    (board, ax, ay, bomb_dir, _, _), _ = lax.scan(
        link,
        (cs.board, cs.agent_x, cs.agent_y, cs.bomb_dir, trigger,
         jnp.zeros((4,), BOOL)),
        None,
        length=AGENT_COUNT + 2,
    )
    return cs._replace(board=board, agent_x=ax, agent_y=ay, bomb_dir=bomb_dir)


def _restore_bomb_items(cs: CellState) -> CellState:
    """Show C_BOMB on bomb cells no live agent stands on (post-reversion)."""
    occupied = jnp.any(
        _onehot(cs.agent_x, cs.agent_y) & ~cs.agent_dead[:, None], axis=0
    )
    show = (cs.bomb_timer > 0) & ~occupied & is_agent(cs.board)
    return cs._replace(board=jnp.where(show, C_BOMB, cs.board).astype(I32))


def _bomb_phase(cs: CellState, moves, old_x, old_y):
    """Block pass + move pass (step.cpp:188-278).  Returns (cs, slide_explode)."""
    dir0 = cs.bomb_dir  # stale directions for reversion (step.cpp:191-192)

    directional_move = (moves >= 1) & (moves <= 4)

    # --- Block pass (step.cpp:195-227): two rounds, because a reversion can
    # land an agent on another bomb's target and block it too.  A bomb is
    # "blocked" when its target cell (own cell for idle bombs) is OOB, a
    # static item, or an agent -- the idle-bomb-with-walker case is exactly
    # how the reference bounces back non-kick walkers.
    for _ in range(2):
        agent_moved = (cs.agent_x != old_x) | (cs.agent_y != old_y)
        dest_item = _dest_val(cs.board, cs.bomb_dir, C_RIGID)
        blocked = (cs.bomb_timer > 0) & (
            _dest_oob(cs.bomb_dir) | _static_block(dest_item)
            | is_agent(dest_item)
        )
        oh_pos = _onehot(cs.agent_x, cs.agent_y)
        trigger = (
            ~cs.agent_dead
            & _read_cells(blocked, oh_pos)
            & directional_move
            & agent_moved
        )
        cs = cs._replace(bomb_dir=jnp.where(blocked, 0, cs.bomb_dir))
        cs = _revert_chain(cs, moves, trigger, dir0)
        cs = _restore_bomb_items(cs)

    # --- Move pass (step.cpp:230-278).
    has_bomb = cs.bomb_timer > 0
    moving = has_bomb & (cs.bomb_dir != 0)
    dest_item = _dest_val(cs.board, cs.bomb_dir, C_RIGID)
    can_enter = ~_dest_oob(cs.bomb_dir) & ~_static_block(dest_item)

    # Collisions: >= 2 bombs targeting one cell all stop (an idle bomb's
    # target is its own cell, step_utility.cpp:279-329).
    arrivals = (has_bomb & ~moving).astype(I32)
    for d in (1, 2, 3, 4):
        arrivals = arrivals + _push(
            (moving & (cs.bomb_dir == d)).astype(I32), d, 0
        )
    dest_count = _dest_val(arrivals, jnp.where(moving, cs.bomb_dir, 0), 0)
    collide = has_bomb & (dest_count >= 2)
    stopped_kick = collide & moving
    cs = cs._replace(
        bomb_dir=jnp.where(collide | (moving & ~can_enter), 0, cs.bomb_dir)
    )

    # Kicker bounce-back for stopped kicked bombs (step_utility.cpp:313-327).
    oh_pos = _onehot(cs.agent_x, cs.agent_y)
    trigger = (
        ~cs.agent_dead & _read_cells(stopped_kick, oh_pos) & directional_move
    )
    cs = _revert_chain(cs, moves, trigger, dir0)
    cs = _restore_bomb_items(cs)

    # Surviving movers advance one cell (unique destinations by collision).
    do_move = (cs.bomb_timer > 0) & (cs.bomb_dir != 0) & can_enter & ~collide

    def advance(plane):
        stay = jnp.where(do_move, 0, plane)
        inc = jnp.zeros_like(plane)
        for d in (1, 2, 3, 4):
            inc = jnp.maximum(
                inc,
                _push(jnp.where(do_move & (cs.bomb_dir == d), plane, 0), d, 0),
            )
        return jnp.maximum(stay, inc)

    arrived = jnp.zeros((NUM_CELLS,), BOOL)
    for d in (1, 2, 3, 4):
        arrived = arrived | _push(do_move & (cs.bomb_dir == d), d, False)

    moved = cs._replace(
        bomb_timer=advance(cs.bomb_timer),
        bomb_strength=advance(cs.bomb_strength),
        bomb_dir=advance(cs.bomb_dir),
        bomb_owner=advance(cs.bomb_owner),
    )

    # Board bookkeeping (step.cpp:255-272): vacated bomb cells revert to
    # passage, entered walkable cells show the bomb, and a bomb arriving on
    # a flame cell explodes (handled by phase 3 with live owner strength).
    vacated = do_move & (cs.board == C_BOMB) & (moved.bomb_timer == 0)
    board = jnp.where(vacated, C_PASSAGE, cs.board)
    slide_explode = arrived & (board == C_FLAME)
    board = jnp.where(
        arrived & ((board == C_PASSAGE) | is_powerup(board)), C_BOMB, board
    )
    cs = moved._replace(board=board.astype(I32))
    return cs, slide_explode


# --- Phase 3: explosions -----------------------------------------------------

_NEG = -1000


def _ray_reach(board, origin_allowance):
    """Blocked max-plus scan: best allowance ARRIVING at each cell from an
    explosion along any of the 4 axis directions.

    Segment element: (a = best allowance exiting the segment, t = whole
    segment transmits, L = length).  Composition is associative, so 11-cell
    rays reduce to log-depth ``lax.associative_scan``s.
    """
    transmit = (board != C_RIGID) & (board != C_WOOD)
    a0 = origin_allowance

    def compose(x, y):
        ax_, tx, lx = x
        ay_, ty, ly = y
        a = jnp.maximum(ay_, jnp.where(ty, ax_ - ly, _NEG))
        return a, tx & ty, lx + ly

    def scan_axis(axis, reverse):
        a = a0.reshape(a0.shape[:-1] + (BOARD_SIZE, BOARD_SIZE))
        t = transmit.reshape(a.shape)
        length = jnp.ones(a.shape, I32)
        aa, _, _ = lax.associative_scan(
            compose, (a, t, length), axis=a.ndim - 2 + axis, reverse=reverse
        )
        pad_shape = list(aa.shape)
        pad_shape[-2 + axis] = 1
        pad = jnp.full(pad_shape, _NEG, I32)
        if axis == 0:
            prev = (
                jnp.concatenate([aa[..., 1:, :], pad], axis=-2) if reverse
                else jnp.concatenate([pad, aa[..., :-1, :]], axis=-2)
            )
        else:
            prev = (
                jnp.concatenate([aa[..., :, 1:], pad], axis=-1) if reverse
                else jnp.concatenate([pad, aa[..., :, :-1]], axis=-1)
            )
        return (prev - 1).reshape(a0.shape)

    down = scan_axis(0, False)
    up = scan_axis(0, True)
    right = scan_axis(1, False)
    left = scan_axis(1, True)
    return jnp.maximum(jnp.maximum(down, up), jnp.maximum(right, left))


def _explode(cs: CellState, slide_explode):
    """Tick timers, explode timer==0 and slid-into-flame bombs, chain in
    rounds, write flames (per-cell timers), kill agents, burn wood."""
    has_bomb = cs.bomb_timer > 0
    timer = jnp.where(has_bomb, cs.bomb_timer - 1, 0)
    cs = cs._replace(bomb_timer=jnp.where(slide_explode, cs.bomb_timer, timer))

    first = ((cs.bomb_timer == 0) & has_bomb) | slide_explode
    live = slide_explode  # live-owner strength (ExplodeBombAt, bboard.cpp:111)

    def round_body(carry):
        cs, explode, live, _ = carry
        # Stored strength for timer explosions (ExplodeTopBomb), the owner's
        # live strength for slide/chained ones.
        live_strength = jnp.zeros((NUM_CELLS,), I32)
        for i in range(AGENT_COUNT):
            live_strength = jnp.where(
                cs.bomb_owner == i, cs.agent_strength[i], live_strength
            )
        s_cell = jnp.where(live, live_strength, cs.bomb_strength)

        arriving = _ray_reach(
            cs.board, jnp.where(explode, s_cell, _NEG).astype(I32)
        )
        burn = explode | ((arriving >= 0) & (cs.board != C_RIGID))

        was_wood = burn & (cs.board == C_WOOD)
        kill_cell = burn & is_agent(cs.board)
        aid = cs.board - C_AGENT0
        victims = jnp.zeros((4,), BOOL)
        refund = jnp.zeros((4,), I32)
        for i in range(AGENT_COUNT):
            victims = victims.at[i].set(jnp.any(kill_cell & (aid == i)))
            refund = refund.at[i].set(
                jnp.sum(explode & (cs.bomb_owner == i)).astype(I32)
            )
        newly_dead = victims & ~cs.agent_dead

        next_explode = burn & (cs.bomb_timer > 0) & ~explode

        cs = cs._replace(
            board=jnp.where(burn, C_FLAME, cs.board).astype(I32),
            hidden_pow=jnp.where(
                burn, jnp.where(was_wood, cs.hidden_pow, 0), cs.hidden_pow
            ),
            flame_timer=jnp.where(burn, FLAME_LIFETIME, cs.flame_timer),
            bomb_timer=jnp.where(explode, 0, cs.bomb_timer),
            bomb_strength=jnp.where(explode, 0, cs.bomb_strength),
            bomb_dir=jnp.where(explode, 0, cs.bomb_dir),
            bomb_owner=jnp.where(explode, 0, cs.bomb_owner),
            agent_bomb_count=cs.agent_bomb_count - refund,
            agent_dead=cs.agent_dead | victims,
            alive_count=cs.alive_count - jnp.sum(newly_dead).astype(I32),
        )
        return cs, next_explode, next_explode, jnp.any(next_explode)

    def cond(carry):
        return carry[3]

    cs, _, _, _ = lax.while_loop(
        cond, round_body, (cs, first, live, jnp.any(first))
    )
    return cs


# --- The step ----------------------------------------------------------------


def cellular_step(cs: CellState, moves) -> CellState:
    """One simultaneous step over plane state.  Pure, jittable, vmappable."""
    moves = jnp.asarray(moves, I32)
    cs = _tick_flames(cs)
    old_x, old_y = cs.agent_x, cs.agent_y
    cs = _move_agents(cs, moves)
    cs, slide = _bomb_phase(cs, moves, old_x, old_y)
    cs = _explode(cs, slide)
    return cs
