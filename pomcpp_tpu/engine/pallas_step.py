"""Fused Pallas TPU kernel for the cellular step.

Why: the XLA path (engine/cellular.py) executes ~600 small [B,121] vector
ops per step; imperfect fusion makes every step re-stream the ~90MB plane
state through HBM dozens of times, capping one chip near 2M env-steps/s.
This kernel runs the ENTIRE step (all four phases) as one Pallas program:
each grid block loads its boards' planes into VMEM once, does every phase
on-chip, and writes the new state once -- HBM traffic drops to
read-state + write-state per step.

Layout: the 121 cells of a board pad to one 128-lane register row, so every
plane is a [BLOCK, 128] i32 tile.  All neighbor access is a lane-roll
(x +-1 => roll 1, y +-1 => roll 11) with board-edge masks; explosion rays
use doubling (shift 1,2,4,8) of blocked max-plus segments; the four agents
are unrolled with [BLOCK, 128] one-hot masks.  No scatter, no gather, no
data-dependent trip counts except the chain-round loop (bounded by
MAX_CHAIN_ROUNDS).

Semantics: identical to engine/cellular.py (same documented divergences
from the C++ reference), except explosion chain depth is capped at
MAX_CHAIN_ROUNDS=4 rounds per step -- deeper same-step chains (>= 4 nested
bomb triggers, essentially unseen in play) explode over subsequent rounds'
steps.  Equivalence is asserted against cellular_step in
tests/test_pallas_step.py.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
    NUM_CELLS,
)
from ..core.state import I32
from .cellular import CellState

LANES = 128
BLOCK = 256        # boards per grid block (single-step kernel)
CHUNK_BLOCK = int(_os.environ.get("PALLAS_CHUNK_BLOCK", "128"))
                   # boards per grid block of the multi-step chunk kernel:
                   # in-loop temporaries must fit the 16MB scoped VMEM at
                   # 128; 256 measured slower (r2), env knob for profiling
MAX_CHAIN_ROUNDS = 4
_NEG = -1000
_RP_STALE = 14     # pallas_fsm._enc_pos(0, 0): what a never-written FSM
                   # recentPositions ring slot must read as (the reference's
                   # zero-initialized queue storage holds Position(0,0))

# Per-lane coordinates (lane i is cell i; lanes >= 121 are void).
def _lane_iota(block):
    return jax.lax.broadcasted_iota(jnp.int32, (block, LANES), 1)


def _valid_mask(block):
    return _lane_iota(block) < NUM_CELLS


# Direction codes 1..4: UP(-y) DOWN(+y) LEFT(-x) RIGHT(+x).
_DSHIFT = {1: BOARD_SIZE, 2: -BOARD_SIZE, 3: 1, 4: -1}


def _push(plane, d: int, fill, dist: int = 1):
    """Value arriving at each cell from ``dist`` moves in direction d.

    out[c] = plane[c - dist*off(d)] with board-edge masking: the roll is a
    lane rotation, so cells whose source would cross an edge (or the
    121..127 pad) read ``fill``.
    """
    block = plane.shape[0]
    lane = _lane_iota(block)
    x = lane % BOARD_SIZE
    y = lane // BOARD_SIZE
    if d == 1:      # from below: source y+dist
        ok = y + dist < BOARD_SIZE
        shift = -dist * BOARD_SIZE
    elif d == 2:    # from above: source y-dist
        ok = y - dist >= 0
        shift = dist * BOARD_SIZE
    elif d == 3:    # from the right: source x+dist
        ok = x + dist < BOARD_SIZE
        shift = -dist
    else:           # from the left: source x-dist
        ok = x - dist >= 0
        shift = dist
    # Mosaic's rotate only handles 32-bit data: round-trip bools via i32.
    is_bool = plane.dtype == jnp.bool_
    p = plane.astype(jnp.int32) if is_bool else plane
    f = jnp.int32(bool(fill)) if is_bool else fill
    rolled = pltpu.roll(p, shift % LANES, 1)  # circular; negatives wrap
    ok = ok & (lane < NUM_CELLS)
    out = jnp.where(ok, rolled, f)
    return (out != 0) if is_bool else out


def _pull(plane, d: int, fill, dist: int = 1):
    """Value at each cell's direction-d neighbor at ``dist``."""
    opp = {1: 2, 2: 1, 3: 4, 4: 3}[d]
    return _push(plane, opp, fill, dist)


def _push_masks(rows: int):
    """Hoisted dist-1 push masks: Mosaic does NOT CSE the per-call
    iota/mod/compare chain inside `_push` (measured ~12 ns/push,
    scripts/microbench_patterns.py push vs push_hoist), so hot loops
    compute these once and use `_push_h`.  Keyed by direction code."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    x = lane % BOARD_SIZE
    y = lane // BOARD_SIZE
    inb = lane < NUM_CELLS
    return {
        1: ((-BOARD_SIZE) % LANES, (y + 1 < BOARD_SIZE) & inb),
        2: (BOARD_SIZE % LANES, (y >= 1) & inb),
        3: ((-1) % LANES, (x + 1 < BOARD_SIZE) & inb),
        4: (1, (x >= 1) & inb),
    }


def _push_h(plane, masks, d: int, fill=0):
    """`_push(plane, d, fill)` with the masks precomputed (i32 planes)."""
    shift, ok = masks[d]
    return jnp.where(ok, pltpu.roll(plane, shift, 1), fill)


def _dest_val(plane, dir_plane, fill):
    # Select over *stored* bool operands hits Mosaic's unsupported i8->i1
    # truncation; route bools through i32.
    is_bool = plane.dtype == jnp.bool_
    p = plane.astype(jnp.int32) if is_bool else plane
    f = jnp.int32(bool(fill)) if is_bool else fill
    out = p
    for d in (1, 2, 3, 4):
        out = jnp.where(dir_plane == d, _pull(p, d, f), out)
    return (out != 0) if is_bool else out


def _dest_oob(dir_plane):
    block = dir_plane.shape[0]
    lane = _lane_iota(block)
    x = lane % BOARD_SIZE
    y = lane // BOARD_SIZE
    return (
        ((dir_plane == 1) & (y == 0))
        | ((dir_plane == 2) & (y == BOARD_SIZE - 1))
        | ((dir_plane == 3) & (x == 0))
        | ((dir_plane == 4) & (x == BOARD_SIZE - 1))
    )


def _is_agent(item):
    return item >= C_AGENT0


def _is_powerup(item):
    return (item >= C_EXTRABOMB) & (item <= C_KICK)


def _static_block(item):
    return (item == C_RIGID) | (item == C_WOOD) | _is_powerup(item)


def _flag_item(pwp):
    return jnp.where(
        pwp == 1,
        C_EXTRABOMB,
        jnp.where(pwp == 2, C_INCRRANGE, jnp.where(pwp == 3, C_KICK, C_PASSAGE)),
    )


def _ray_reach(board, origin_allowance, pm):
    """Ray propagation with early exit: iterate one cell per round in all
    four directions until every ray is exhausted.  Typical blast radius is
    1-2, so this runs ~2 cheap rounds instead of a fixed log-depth doubling
    sweep; worst case is bounded by the board diameter.

    r4 audit: (a) a ray with 0 remaining allowance burns its cell but can
    never extend, so the liveness check is ``e >= 1``, not ``e >= 0`` --
    strength-1 bombs (the common case) converge one round earlier; (b) two
    rounds unroll per while body (post-exhaustion rounds are no-ops), so
    the per-iteration fixed cost (scalar round trip + the cross-lane any)
    is paid once per two rounds -- the r3 BFS lesson applied here."""
    rigid = board == C_RIGID
    absorb = rigid | (board == C_WOOD)
    neg = jnp.full_like(board, _NEG)

    def one_round(e1, e2, e3, e4, burn):
        outs = []
        for d, e in ((1, e1), (2, e2), (3, e3), (4, e4)):
            inc = _push_h(e, pm, d, _NEG) - 1
            entered = (inc >= 0) & ~rigid
            burn = jnp.where(entered, 1, burn)
            outs.append(jnp.where(entered & ~absorb, inc, neg))
        return outs[0], outs[1], outs[2], outs[3], burn

    def body(carry):
        e1, e2, e3, e4, burn, k = carry
        e1, e2, e3, e4, burn = one_round(e1, e2, e3, e4, burn)
        e1, e2, e3, e4, burn = one_round(e1, e2, e3, e4, burn)
        return e1, e2, e3, e4, burn, k + 2

    def cond(carry):
        e1, e2, e3, e4, _, k = carry
        # ONE cross-lane reduction (reductions cost ~an order more than
        # element-wise ops): fold the four ray planes with cheap maxes.
        m12 = jnp.maximum(e1, e2)
        m34 = jnp.maximum(e3, e4)
        alive = jnp.any(jnp.maximum(m12, m34) >= 1)
        return alive & (k < BOARD_SIZE + 1)

    a0 = origin_allowance
    # i32 burn mask: bool planes in a while carry break Mosaic layouts.
    burn0 = jnp.zeros_like(board)
    # First body straight-line: callers only explode bombs with strength
    # >= 1, so the entry check is provably true -- the common strength-1/2
    # blast finishes with ONE any instead of two.
    carry = body((a0, a0, a0, a0, burn0, jnp.zeros((), I32)))
    e1, e2, e3, e4, burn, _ = jax.lax.while_loop(cond, body, carry)
    return jnp.where(burn != 0, 0, _NEG)


# Trace-time phase-skip knob for cost-attribution experiments only
# (PALLAS_SKIP_PHASES=move,bomb,explode); never set in production.
_SKIP = frozenset(
    p for p in _os.environ.get("PALLAS_SKIP_PHASES", "").split(",") if p
)


def _step_block(board, hidden, ftimer, bp, ax, ay, abc, amb, ast, akick,
                adead, moves, inv=None):
    """One full step on a [BLOCK, LANES] tile set.  All i32 except noted.

    ``bp`` is the PACKED bomb plane (timer bits [0,4), strength [4,10),
    dir [10,13), owner [13,15)) -- r4 keeps it packed across the whole
    chunk loop so the per-step pack/unpack (~10 plane ops) is paid once
    per chunk, not once per step.  ``ax..adead, moves`` are [BLOCK, 4]
    i32.  Returns the same structure.
    """
    block = board.shape[0]
    # Loop-invariant mask planes: taken from the chunk prologue when the
    # caller provides them (r5: computed ONCE per chunk instead of per
    # step -- Mosaic neither CSEs nor hoists the iota chains).
    inv = inv or {}
    valid = inv.get("valid")
    if valid is None:
        valid = _valid_mask(block)
    pm = inv.get("pm") or _push_masks(block)

    # ---- Phase 0: flames --------------------------------------------------
    ftimer = jnp.maximum(ftimer - 1, 0)
    expired = (ftimer == 0) & (board == C_FLAME)
    board = jnp.where(expired, _flag_item(hidden & 0b11), board)
    hidden = jnp.where(expired, 0, hidden)

    # ---- Phase 1: agent movement ------------------------------------------
    # Op-diet re-derivation (round 2): positions are flat cell indices, all
    # cross-agent comparisons are 4-lane rotations of whole [block,4] arrays
    # (a [block,4] op costs the same as a [block,128] op, so the win is op
    # COUNT), and the 12 separate one-hot plane reads collapse into ONE
    # packed lane-reduction.  Logic is formula-for-formula equivalent to the
    # round-1 version (validated against engine/cellular.py by
    # tests/test_pallas_step.py).
    old_ax, old_ay = ax, ay
    if "move" in _SKIP:
        return (board, hidden, ftimer, bp,
                ax, ay, abc, amb, ast, akick, adead)
    alive = adead == 0
    lane = inv.get("lane")
    if lane is None:
        lane = _lane_iota(block)
    lane4 = jax.lax.broadcasted_iota(I32, (block, 4), 1)

    def rot4(a, k):
        """Rotate the agent axis left by k: out[:, i] = a[:, (i+k) % 4]."""
        if a.dtype == jnp.bool_:
            b = jnp.concatenate([a[:, k:].astype(I32), a[:, :k].astype(I32)], 1)
            return b != 0
        return jnp.concatenate([a[:, k:], a[:, :k]], axis=1)

    ac = ax + BOARD_SIZE * ay
    m = moves
    off = jnp.where(
        m == 1, -BOARD_SIZE,
        jnp.where(m == 2, BOARD_SIZE, jnp.where(m == 3, -1, jnp.where(m == 4, 1, 0))),
    )
    acx = ac % BOARD_SIZE
    # and/or chain, NOT a select: Mosaic cannot select narrow bool vectors.
    inb = (
        ((m != 1) | (ac >= BOARD_SIZE))
        & ((m != 2) | (ac < NUM_CELLS - BOARD_SIZE))
        & ((m != 3) | (acx > 0))
        & ((m != 4) | (acx < BOARD_SIZE - 1))
    )
    # Comparison-space destination: in-bounds -> real cell; out-of-bounds ->
    # a unique code >= 128 per (origin, move), mirroring the reference's
    # off-board coordinates (distinct agents never share an OOB target).
    dcell = jnp.where(inb, ac + off, 128 + ac + NUM_CELLS * m)

    # FixSwitchMove: mutual destination exchange freezes both (pairwise
    # detection is order-independent: a frozen agent's dest becomes its own
    # origin, which cannot create new swaps).
    swap = jnp.zeros((block, 4), jnp.bool_)
    rac = [None, rot4(ac, 1), rot4(ac, 2), rot4(ac, 3)]
    for k in (1, 2, 3):
        swap = swap | ((dcell == rac[k]) & (rot4(dcell, k) == ac))
    dcell = jnp.where(swap, ac, dcell)

    directional = (m >= 1) & (m <= 4) & (dcell != ac)

    # tk[k]: "my destination is the current cell of live agent i+k".
    ralive = [None, rot4(alive, 1), rot4(alive, 2), rot4(alive, 3)]
    tk = [None] + [(dcell == rac[k]) & ralive[k] for k in (1, 2, 3)]
    targ = tk[1] | tk[2] | tk[3]
    is_root = (adead != 0) | ~targ
    ouroboros = ~jnp.any(is_root, axis=1, keepdims=True)  # [block,1]

    # Packed plane read: ONE lane reduction yields, per agent, the board
    # item + bomb presence at the destination (5-bit fields, bits [0,20))
    # and bomb presence at the origin (1-bit fields, bits [20,24)).
    bomb_b = ((bp & 15) > 0).astype(I32)
    pk = board + (bomb_b << 4)
    rdcell = jnp.where(inb, ac + off, 127)  # void lane reads 0
    oh_dest = [lane == rdcell[:, i : i + 1] for i in range(4)]
    oh_org = [lane == ac[:, i : i + 1] for i in range(4)]
    w = jnp.zeros((block, LANES), I32)
    for i in range(4):
        w = w + (oh_dest[i].astype(I32) << (5 * i)) + (
            oh_org[i].astype(I32) << (20 + i)
        )
    red = jnp.sum(pk * (w & 0xFFFFF) + bomb_b * (w >> 20 << 20), axis=1,
                  keepdims=True)
    dvals = (red >> (5 * lane4)) & 31
    dest_item = dvals & 15
    bomb_at_dest = dvals >= 16
    org_bomb = ((red >> 20) >> lane4) & 1 != 0

    victim = alive & directional & inb & (dest_item == C_FLAME)

    cand = alive & ~victim
    coll = jnp.zeros((block, 4), jnp.bool_)
    for k in (1, 2, 3):
        coll = coll | (rot4(cand, k) & (dcell == rot4(dcell, k)))

    base = alive & directional & inb & ~victim & ~coll
    enterable = (
        (dest_item == C_PASSAGE) | _is_powerup(dest_item) | (dest_item == C_BOMB)
    )
    # "Destination holds a live agent" == targ (board and positions agree).
    ouro_enter = ouroboros & targ

    move = jnp.zeros((block, 4), jnp.bool_)
    for _ in range(AGENT_COUNT):
        mv_or_v = move | victim
        vac = (
            (tk[1] & rot4(mv_or_v, 1))
            | (tk[2] & rot4(mv_or_v, 2))
            | (tk[3] & rot4(mv_or_v, 3))
        )
        move = base & (enterable | vac | ouro_enter)

    # Kicks (write the packed dir field).  stepped_on_bomb feeds the idle
    # bomb phase's revert trigger (phase-1 read reused, r5).
    stepped_on_bomb = move & bomb_at_dest
    kick = move & (akick != 0) & bomb_at_dest
    for i in range(4):
        sel = oh_dest[i] & kick[:, i : i + 1]
        bp = jnp.where(
            sel, (bp & ~(7 << 10)) | (m[:, i : i + 1] << 10), bp
        )

    # Powerups.
    take = move & _is_powerup(dest_item)
    amb = amb + (take & (dest_item == C_EXTRABOMB))
    ast = ast + (take & (dest_item == C_INCRRANGE))
    akick = akick | (take & (dest_item == C_KICK))

    # Board updates: vacate (origin restored to BOMB iff a bomb is under
    # it), then place movers.
    vacate = move | victim
    vmask = jnp.zeros((block, LANES), jnp.bool_)
    for i in range(4):
        vmask = vmask | (oh_org[i] & vacate[:, i : i + 1])
    board = jnp.where(vmask, jnp.where(bomb_b != 0, C_BOMB, C_PASSAGE), board)
    for i in range(4):
        board = jnp.where(oh_dest[i] & move[:, i : i + 1], C_AGENT0 + i, board)

    adead = jnp.where(victim, 1, adead)
    ac = jnp.where(move, ac + off, ac)
    ax = ac % BOARD_SIZE
    ay = ac // BOARD_SIZE

    # Plants (one packed write: timer=BOMB_LIFETIME+1, str, owner, dir=0).
    plant = alive & (m == M_BOMB) & (abc < amb) & ~org_bomb
    pmask = jnp.zeros((block, LANES), jnp.bool_)
    packp = jnp.zeros((block, LANES), I32)
    for i in range(4):
        sel = oh_org[i] & plant[:, i : i + 1]
        pmask = pmask | sel
        packp = packp + sel * (
            (BOMB_LIFETIME + 1) + (ast[:, i : i + 1] << 4) + (i << 13)
        )
    bp = jnp.where(pmask, packp, bp)
    abc = abc + plant

    # ---- Phase 2: bomb kinematics -----------------------------------------
    # Round-2 op diet: the four bomb planes travel as ONE packed plane
    # (timer bits [0,4), strength [4,10), dir [10,13), owner [13,15)) so
    # sliding advances one plane instead of four; per-agent position reads
    # are single packed lane-reductions; the reversion chain walks with
    # 4-lane rotations under a while_loop (typical chains: 1-2 rounds).
    # r4: the plane arrives and leaves packed (the chunk loop carries it).
    if "bomb" in _SKIP:
        return (board, hidden, ftimer, bp,
                ax, ay, abc, amb, ast, akick, adead)
    dir0 = (bp >> 10) & 7
    directional_move = (m >= 1) & (m <= 4)
    alive2 = adead == 0

    def bp_timer(bp):
        return bp & 15

    def bp_dir(bp):
        return (bp >> 10) & 7

    def read_bits(bit_plane, cells):
        """bit_plane in {0,1}; value at each agent cell -> bool [block, 4].

        One packed lane-reduction instead of four one-hot max-reads."""
        wpos = jnp.zeros((block, LANES), I32)
        for i in range(4):
            wpos = wpos + ((lane == cells[:, i : i + 1]).astype(I32) << i)
        r = jnp.sum(bit_plane * wpos, axis=1, keepdims=True)
        return (r >> lane4) & 1 != 0

    def revert_chain(board, ac_, bp, trigger, no_moving: bool = False):
        """Bounce reverting agents back to their origins, cascading into
        occupants and kicked bombs (step_utility.cpp:62-128 semantics as
        re-derived in round 1; control flow is a while_loop over the <= 6
        cascade rounds).  Round 1 runs straight-line outside the loop --
        callers only enter with a nonzero trigger, so the first round is
        always active and the common single-round cascade pays ONE
        any+scalar-round-trip (the exit check) instead of two.

        ``no_moving`` (STATIC, r5): the idle bomb phase is only entered
        when NO bomb has a direction (the phase gate tests dir != 0 after
        kicks), and reverts never set directions -- so the whole
        moving-bomb half of the body (the wanted/_dest_val probe, the
        dir-clear writes, and the on_stopped packed reduction) is
        provably dead there and traced away (~43 ops + one cross-lane
        reduction per cascade round on the common path)."""

        def cond(carry):
            board, ac_, bp, cur, done, k = carry
            return jnp.any(cur != 0) & (k < AGENT_COUNT + 2)

        def body(carry):
            board, ac_, bp, cur, done, k = carry
            curb = cur != 0
            acx_ = ac_ % BOARD_SIZE
            # and/or chain, NOT a select (Mosaic narrow-bool limit).
            oinb = (
                ((m != 1) | (ac_ < NUM_CELLS - BOARD_SIZE))
                & ((m != 2) | (ac_ >= BOARD_SIZE))
                & ((m != 3) | (acx_ < BOARD_SIZE - 1))
                & ((m != 4) | (acx_ > 0))
            )
            act = curb & oinb
            done = done | act.astype(I32)
            oc = ac_ - off

            # Occupant of my origin cell (at most one live agent per cell).
            occk = [None] + [
                (rot4(ac_, k2) == oc) & rot4(alive2, k2) for k2 in (1, 2, 3)
            ]
            has_occ = occk[1] | occk[2] | occk[3]
            oh_oc = [lane == oc[:, i : i + 1] for i in range(4)]
            if not no_moving:
                no_occ = act & ~has_occ
                wanted = jnp.zeros((block, LANES), jnp.bool_)
                for i in range(4):
                    wanted = wanted | (oh_oc[i] & no_occ[:, i : i + 1])
                dest_wanted = _dest_val(wanted, dir0, False)
                moving_bomb = (
                    (bp_timer(bp) > 0) & dest_wanted & (bp_dir(bp) != 0)
                )
                bp = jnp.where(moving_bomb, bp & ~(7 << 10), bp)
                board = jnp.where(
                    moving_bomb & ~_is_agent(board), C_BOMB, board
                )

            for i in range(4):
                board = jnp.where(
                    oh_oc[i] & act[:, i : i + 1], C_AGENT0 + i, board
                )
            ac_ = jnp.where(act, oc, ac_)

            nxt = jnp.zeros((block, 4), jnp.bool_)
            for k2 in (1, 2, 3):
                nxt = nxt | rot4(act & occk[k2], 4 - k2)
            if no_moving:
                cur = (nxt & (done == 0)).astype(I32)
            else:
                on_stopped = (
                    read_bits(moving_bomb.astype(I32), ac_) & alive2
                )
                cur = ((nxt | on_stopped) & (done == 0)).astype(I32)
            return board, ac_, bp, cur, done, k + 1

        zero4 = jnp.zeros((block, 4), I32)
        carry = (board, ac_, bp, trigger, zero4, jnp.zeros((), I32))
        carry = body(carry)  # round 1: always active on entry
        board, ac_, bp, _, _, _ = jax.lax.while_loop(cond, body, carry)
        return board, ac_, bp

    def restore_bomb_items(board, ac_, bp):
        occupied = jnp.zeros((block, LANES), jnp.bool_)
        for i in range(4):
            occupied = occupied | (
                (lane == ac_[:, i : i + 1]) & alive2[:, i : i + 1]
            )
        show = (bp_timer(bp) > 0) & ~occupied & _is_agent(board)
        return jnp.where(show, C_BOMB, board)

    def gated_revert(board, ac_, bp, bit_bool, relevant,
                     no_moving: bool = False):
        """Revert cascade behind a CHEAP scalar gate (r4): fired iff some
        ``relevant`` agent stands on a set cell of ``bit_bool``.  The gate
        is one bool-plane any over an 11-op occupancy mask; the [block,4]
        trigger (a packed lane reduction + unpack) is built only inside
        the taken branch, so the common quiet step never pays it.
        ``no_moving`` (static) forwards to revert_chain."""
        occ = jnp.zeros((block, LANES), jnp.bool_)
        for i in range(4):
            occ = occ | (
                (lane == ac_[:, i : i + 1]) & relevant[:, i : i + 1]
            )
        fired = jnp.any(bit_bool & occ)

        def taken(carry):
            board, ac_, bp = carry
            trigger = (
                relevant & read_bits(bit_bool.astype(I32), ac_)
            ).astype(I32)
            board, ac_, bp = revert_chain(board, ac_, bp, trigger,
                                          no_moving=no_moving)
            board = restore_bomb_items(board, ac_, bp)
            return board, ac_, bp

        board, ac_, bp = jax.lax.cond(
            fired, taken, lambda c: c, (board, ac_, bp)
        )
        return board, ac_, bp, fired

    old_ac = old_ax + BOARD_SIZE * old_ay

    def full_bomb_phase(carry):
        """Some bomb is sliding: block round(s) + move pass.  The second
        block round exists only because a round-1 reversion can land an
        agent on another bomb's target -- so it runs only after a round-1
        reversion actually fired."""
        board, bp, ac_ = carry

        def block_round(board, ac_, bp):
            agent_moved = ac_ != old_ac
            bd = bp_dir(bp)
            ditem = _dest_val(board, bd, C_RIGID)
            blocked = (bp_timer(bp) > 0) & (
                _dest_oob(bd) | _static_block(ditem) | _is_agent(ditem)
            )
            relevant = alive2 & directional_move & agent_moved
            bp = jnp.where(blocked, bp & ~(7 << 10), bp)
            board, ac_, bp, fired = gated_revert(
                board, ac_, bp, blocked, relevant
            )
            return board, ac_, bp, fired

        board, ac_, bp, fired = block_round(board, ac_, bp)

        def round2(carry):
            board, ac_, bp = carry
            board, ac_, bp, _ = block_round(board, ac_, bp)
            return board, ac_, bp

        board, ac_, bp = jax.lax.cond(
            fired, round2, lambda c: c, (board, ac_, bp)
        )
        return move_pass((board, bp, ac_))

    def idle_bomb_phase(carry):
        """No sliding bombs: the only phase-2 effect is bouncing walkers
        off bombs they stepped on.  The trigger is phase 1's
        ``move & bomb_at_dest`` verbatim (r5): in the idle phase no bomb
        moved and fresh plants sit under their (non-moving) planters, so
        the pre-move destination read still describes the board -- the
        occupancy-mask build and the read_bits packed reduction the r4
        gate paid are free here."""
        board, bp, ac_ = carry
        trigger = stepped_on_bomb.astype(I32)
        fired = jnp.any(trigger != 0)

        def taken(c):
            board, ac_, bp = c
            board, ac_, bp = revert_chain(board, ac_, bp, trigger,
                                          no_moving=True)
            board = restore_bomb_items(board, ac_, bp)
            return board, ac_, bp

        board, ac_, bp = jax.lax.cond(
            fired, taken, lambda c: c, (board, ac_, bp)
        )
        return board, bp, ac_, jnp.zeros((block, LANES), I32)

    # Move pass: a pure no-op unless some bomb is sliding (idle bombs can
    # never collide with each other or enter flames).
    def move_pass(carry):
        board, bp, ac_ = carry
        has_bomb = bp_timer(bp) > 0
        bd = bp_dir(bp)
        moving = has_bomb & (bd != 0)
        ditem = _dest_val(board, bd, C_RIGID)
        can_enter = ~_dest_oob(bd) & ~_static_block(ditem)

        # ONE merged push set (r5): each direction pushes the packed bomb
        # word (bits [0,15)) together with an arrival-count unit (bit 25;
        # field [25,28) holds <= 5 arrivals+stay) and a can-enter flag
        # (bit 28; field [28,31) sums <= 4 flags without touching the
        # count).  This replaces the r4 indicator-push set; the value
        # deposit is valid on the FAST path below (identical sources),
        # and the rare revert-fired case falls back to a fresh push set
        # because the revert can clear a slider's direction mid-pass.
        val = bp | jnp.where(can_enter, (1 << 25) | (1 << 28), 1 << 25)
        tot = jnp.where(has_bomb & ~moving, bp | (1 << 25), 0)
        for d in (1, 2, 3, 4):
            tot = tot + _push(jnp.where(moving & (bd == d), val, 0), d, 0)
        cnt = (tot >> 25) & 7
        dest_count = _dest_val(cnt, jnp.where(moving, bd, 0), 0)
        collide = has_bomb & (dest_count >= 2)
        stopped_kick = collide & moving
        bp = jnp.where(collide | (moving & ~can_enter), bp & ~(7 << 10), bp)

        board, ac_, bp, fired = gated_revert(
            board, ac_, bp, stopped_kick, alive2 & directional_move
        )

        def moved(bp, inc):
            bd2 = bp_dir(bp)
            do_move = (bp_timer(bp) > 0) & (bd2 != 0) & can_enter & ~collide
            stay = jnp.where(do_move, 0, bp)
            return jnp.maximum(stay, inc), inc

        def fast(bp):
            # cnt==1 with the can-enter flag set means exactly one mover
            # deposits here and nothing blocked/collided it; its packed
            # word is tot's low field verbatim.
            arr = ((cnt == 1) & (((tot >> 28) & 7) != 0)).astype(I32)
            return moved(bp, arr * (tot & 0x7FFF))

        def slow(bp):
            bd2 = bp_dir(bp)
            do_move = (bp_timer(bp) > 0) & (bd2 != 0) & can_enter & ~collide
            inc = jnp.zeros_like(bp)
            for d in (1, 2, 3, 4):
                inc = jnp.maximum(
                    inc, _push(jnp.where(do_move & (bd2 == d), bp, 0), d, 0)
                )
            return moved(bp, inc)

        new_bp, inc = jax.lax.cond(fired, slow, fast, bp)
        arrived = inc > 0  # a sliding bomb's packed word is nonzero

        # A source cell loses its bomb only by moving out (stay keeps the
        # word), so (had bomb) & (now empty) == the old do_move & empty.
        vacated = ((bp & 15) > 0) & (board == C_BOMB) & (new_bp == 0)
        board = jnp.where(vacated, C_PASSAGE, board)
        slide = (arrived & (board == C_FLAME)).astype(I32)
        board = jnp.where(
            arrived & ((board == C_PASSAGE) | _is_powerup(board)),
            C_BOMB, board,
        )
        return board, new_bp, ac_, slide

    (board, bp, ac, slide_i) = jax.lax.cond(
        jnp.any(((bp & 15) > 0) & (((bp >> 10) & 7) != 0)),
        full_bomb_phase, idle_bomb_phase,
        (board, bp, ac),
    )
    ax = ac % BOARD_SIZE
    ay = ac // BOARD_SIZE
    slide_explode = slide_i != 0

    # ---- Phase 3: explosions (operates on the PACKED bomb plane) ----------
    if "explode" in _SKIP:
        return (board, hidden, ftimer, bp,
                ax, ay, abc, amb, ast, akick, adead)
    has_bomb = (bp & 15) > 0
    # Timer tick in place: decrement the low field (timer > 0, no borrow);
    # slide-detonating bombs keep their timer (they explode regardless).
    bp = jnp.where(has_bomb & ~slide_explode, bp - 1, bp)
    explode = (((bp & 15) == 0) & has_bomb) | slide_explode
    live = slide_explode

    def explosion_round(carry):
        board, hidden, ftimer, bp, abc, adead, explode, live = carry
        own_pl = (bp >> 13) & 3
        live_strength = jnp.zeros((block, LANES), I32)
        for i in range(4):
            live_strength = jnp.where(
                own_pl == i, ast[:, i : i + 1], live_strength
            )
        s_cell = jnp.where(live != 0, live_strength, (bp >> 4) & 63)

        arriving = _ray_reach(board, jnp.where(explode != 0, s_cell, _NEG),
                              pm)
        burn = (explode != 0) | ((arriving >= 0) & (board != C_RIGID) & valid)

        was_wood = burn & (board == C_WOOD)
        kill_cell = burn & _is_agent(board)
        # ONE packed reduction: agent-kill bits (bits [20,24) -- an agent
        # occupies at most one cell) and per-owner refund counts (5-bit
        # fields, bits [0,20)) share a single lane-sum.  INVARIANT: owner
        # 3's refund field [15,20) sits directly below agent 0's kill bit,
        # so >=32 bombs of ONE owner detonating in ONE chain round would
        # carry into the kill bits.  That is unreachable: an owner's live
        # bombs are bounded by max ammo (MAX_POWERUPS_PER_AGENT-class
        # pickups over a 121-cell board keep it far under 32; the
        # reference's own bomb queue caps at MAX_BOMBS=121 TOTAL, and per-
        # owner ammo in real play stays single-digit).  If a variant ever
        # lifts ammo >=32, split the kill bits into their own reduction.
        lane4_ = jax.lax.broadcasted_iota(I32, (block, 4), 1)
        red = jnp.sum(
            jnp.where(kill_cell, 1 << (20 + board - C_AGENT0), 0)
            + jnp.where(explode != 0, 1 << (5 * own_pl), 0),
            axis=1, keepdims=True,
        )
        hit = ((red >> (20 + lane4_)) & 1) != 0
        adead = jnp.where(hit, 1, adead)
        abc = abc - ((red >> (5 * lane4_)) & 31)

        next_explode = (burn & ((bp & 15) > 0) & (explode == 0)).astype(I32)

        hidden = jnp.where(burn, jnp.where(was_wood, hidden, 0), hidden)
        board = jnp.where(burn, C_FLAME, board)
        ftimer = jnp.where(burn, FLAME_LIFETIME, ftimer)
        bp = jnp.where(explode != 0, 0, bp)
        return (board, hidden, ftimer, bp, abc, adead,
                next_explode, next_explode)

    # i32 masks in the cond carry (stored narrow bools break Mosaic).
    # The chain rounds NEST inside each other's taken branch (r4): a step
    # with no explosion pays ONE any+cond instead of MAX_CHAIN_ROUNDS of
    # them, and a depth-1 chain (the overwhelmingly common case) pays two.
    carry = (board, hidden, ftimer, bp, abc, adead,
             explode.astype(I32), live.astype(I32))

    def _chain(depth, c):
        if depth == 0:
            return c

        def taken(c):
            return _chain(depth - 1, explosion_round(c))

        return jax.lax.cond(jnp.any(c[6] != 0), taken, lambda c: c, c)

    carry = _chain(MAX_CHAIN_ROUNDS, carry)
    board, hidden, ftimer, bp, abc, adead, _, _ = carry

    return (board, hidden, ftimer, bp,
            ax, ay, abc, amb, ast, akick, adead)


def _fresh_boards(block, board=None, hidden=None):
    """In-kernel board generation from the seeded PRNG.

    Same distribution family as core.board_gen.random_board_fast (1/7 rigid,
    1/7 wood, each wood carries a powerup w.p. 1/2, flag uniform in [1,4]);
    modulo bias from the 2^30 draw range is < 1e-8.  Agents go to the
    classic corners.

    ``board``/``hidden`` (test hook, the inject_reset mode): pre-generated
    terrain planes replace the PRNG draws -- the assembly (corner agents,
    zeroed dynamics, default stats) is identical, so interpret-mode tests
    exercise the REAL auto-reset merge path off-TPU (the PRNG primitive is
    TPU-only).
    """
    lane = _lane_iota(block)
    valid = lane < NUM_CELLS

    if board is None:
        def draw():
            bits = pltpu.prng_random_bits((block, LANES))
            return (pltpu.bitcast(bits, jnp.int32) >> 1) & 0x3FFFFFFF

        tmp = draw() % 7
        board = jnp.where(
            tmp == 1, C_RIGID, jnp.where(tmp == 2, C_WOOD, C_PASSAGE)
        )
        board = jnp.where(valid, board, 0)
        flags = draw()
        hidden = jnp.where(
            (board == C_WOOD) & ((flags & 1) == 0), (flags >> 1) % 4 + 1, 0
        )
    # Corner agents (cells 0, 10, 110, 120).
    corners = (0, 10, 120, 110)
    for i, c in enumerate(corners):
        board = jnp.where(lane == c, C_AGENT0 + i, board)
    zero = jnp.zeros((block, LANES), I32)
    aidx = jax.lax.broadcasted_iota(jnp.int32, (block, 4), 1)
    cx = jnp.where((aidx == 1) | (aidx == 2), BOARD_SIZE - 1, 0)
    cy = jnp.where((aidx == 2) | (aidx == 3), BOARD_SIZE - 1, 0)
    ones4 = jnp.ones((block, 4), I32)
    return (
        board, hidden, zero, zero, zero, zero, zero,  # planes
        cx, cy,                       # ax, ay
        ones4 * 0,                    # bomb_count
        ones4,                        # max_bombs
        ones4,                        # strength
        ones4 * 0,                    # can_kick
        ones4 * 0,                    # dead
    )


def _chunk_kernel(seed_ref, *refs, steps: int, n_moves: int = 6,
                  inject: bool = False, record: bool = False,
                  auto_reset: bool = True, inject_slots: tuple = (),
                  prng_rand: bool = False, inject_reset: bool = False):
    """K fused steps with in-kernel random-agent moves and auto-reset.

    State stays in VMEM across all ``steps``; HBM sees one read and one
    write of the planes per chunk instead of per step.  ``n_moves=6`` is
    the RandomAgent config (bombs included); ``n_moves=5`` is HarmlessAgent
    (the reference README's published benchmark config, README.md:99).

    Test hooks (static): ``inject`` reads moves (for the simple policy:
    the per-agent rand draws) from an extra input ref [steps, block, 4]
    instead of the in-kernel PRNG (no prng_seed -> works in interpret
    mode); ``record`` writes the moves drawn and the per-step done mask to
    extra output refs, letting tests replay the exact trajectory through
    the cellular engine; ``auto_reset=False`` disables board regeneration.

    ``n_moves=-1`` selects the in-kernel SimpleAgent FSM
    (engine/pallas_fsm.py); it carries 10 extra [block,4] state arrays
    (ring slots x4, ring head, ring count, moveQueue slots x4) as
    additional in/out refs right after the 14 game-state refs.

    ``inject_slots`` (simple mode only) makes the injected moves input a
    per-slot OVERRIDE: the FSM drives every agent as usual, then lanes in
    ``inject_slots`` take their move from the input instead -- the
    mixed-control mode (externally-policied learner vs in-kernel
    SimpleAgent opponents) the PPO curriculum trains in.  The FSM's rand
    draws then come from the in-kernel PRNG when ``prng_rand`` is set
    (production) or from the non-override lanes of the same input
    (interpret-compatible tests).
    """
    simple = n_moves < 0
    n_fsm = 10 if simple else 0
    n_in = 14 + n_fsm + (1 if inject else 0) + (2 if inject_reset else 0)
    in_refs, out_refs = refs[:n_in], refs[n_in:]
    state_in = in_refs[:14 + n_fsm]
    moves_in = in_refs[14 + n_fsm] if inject else None
    reset_in = in_refs[14 + n_fsm + (1 if inject else 0):] \
        if inject_reset else None
    state_out = out_refs[:14 + n_fsm]
    rec_refs = out_refs[14 + n_fsm:] if record else ()
    block = state_in[0].shape[0]
    if not inject or (auto_reset and not inject_reset) or prng_rand:
        # Auto-reset's board regeneration draws from the PRNG even when
        # the move stream is injected; interpret mode (which lacks
        # prng_seed) uses inject + either auto_reset=False or
        # inject_reset (pre-generated fresh terrain planes).
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    inv_masks = {
        "pm": _push_masks(block),
        "lane": _lane_iota(block),
        "valid": _valid_mask(block),
        "pmQ": _push_masks(block // 2) if block % 2 == 0 else None,
    }

    def _finished_mask(adead):
        """i32[block,1]: board finished (<= 1 agent alive).  Dead-count
        via 4-lane rotations -- pure element-wise, no cross-lane
        reduction."""
        def r4_(a, k):
            return jnp.concatenate([a[:, k:], a[:, :k]], axis=1)

        deadcnt = adead + r4_(adead, 1) + r4_(adead, 2) + r4_(adead, 3)
        return (deadcnt[:, :1] >= 3).astype(I32)

    def merge_fresh(state, done):
        """Replace done boards' rows with fresh state (14 selects)."""
        fr = fresh() if callable(fresh) else fresh
        return tuple(
            jnp.where(done != 0, f, c) for f, c in zip(fr, state)
        )

    def body(i, carry):
        if inject and not prng_rand:
            drawn = moves_in[pl.dslice(i, 1), :, :][0]
        else:
            bits = pltpu.prng_random_bits((block, LANES))
            pos = (pltpu.bitcast(bits, jnp.int32) >> 1) & 0x3FFFFFFF
            drawn = pos[:, :4] % (5 if simple else n_moves)
        # PIPELINED reset merge (r5): the mask applied at the head of
        # step t was computed at the head of step t-1 from the carried
        # adead, giving the done -> merge data edge one full step of
        # slack instead of tying every step's start to the previous
        # step's explosion-phase kill reduction.  Measured worth ~6-10
        # ms/4chunks on each config (CAUTION for future attribution:
        # skip=reset / never-reset diagnostics looked like ~120 ms, but
        # they CHANGE THE WORKLOAD -- boards that never reset fill up
        # with dead agents, whose pruned BFS waves and quiet bomb
        # phases converge faster; most of that delta is population
        # drift, not reset cost).  The cost of the slack is reset
        # LATENCY 2: a board finishing during step t is replaced at the
        # head of t+2, i.e. it plays one inert extra step per episode
        # (~0.25%% of steps at episode length ~400); the catch-up merge
        # after the loop keeps the CHUNK OUTPUT fully reset, so chunk
        # callers observe the same contract as before.  (The env-layer
        # auto-reset -- env_step_auto_reset, what PPO trains through --
        # is unchanged: it calls the kernel with auto_reset=False and
        # latches done itself.)
        carry, done_prev = carry[:-1], carry[-1]
        if auto_reset and "reset" not in _SKIP:
            carry = merge_fresh(carry, done_prev)
            done_next = _finished_mask(carry[10])
        else:
            done_next = done_prev
        game = carry[:11]
        if simple:
            from .pallas_fsm import fsm_block

            (board, hidden, ftimer, bpp,
             ax, ay, abc, amb, ast, akick, adead) = game
            rp_pk, rpc, mq_pk = carry[11:14]
            moves, rp_pk2, rpc2, mq_pk2 = fsm_block(
                board, bpp & 15, (bpp >> 4) & 63,
                ax + BOARD_SIZE * ay, abc, amb,
                adead, drawn, rp_pk, rpc, mq_pk, inv=inv_masks,
            )
            if inject_slots:
                ov = moves_in[pl.dslice(i, 1), :, :][0]
                lane = jax.lax.broadcasted_iota(I32, (block, 4), 1)
                is_ov = functools.reduce(
                    lambda a, b: a | b,
                    [lane == s for s in inject_slots],
                )
                # Blend bitwise: `where` over mixed provenance i32 is fine,
                # but keep the FSM's value for non-override lanes exactly.
                moves = jnp.where(is_ov, ov, moves)
            moves = jnp.where(adead != 0, 0, moves)
            fsm_new = (rp_pk2, rpc2, mq_pk2)
        else:
            moves = drawn
            fsm_new = ()
        game = _step_block(*game, moves, inv=inv_masks)
        carry = tuple(game) + fsm_new

        if record:
            # End-of-step doneness for the test replay hooks (tail
            # compute; record mode is interpret/test-only).
            rec_refs[0][pl.dslice(i, 1), :, :] = moves[None]
            rec_refs[1][pl.dslice(i, 1), :, :] = \
                _finished_mask(game[10])[None]

        return carry + (done_next,)

    if auto_reset:
        # Fresh replacement boards are drawn ONCE per chunk, not per step:
        # with ~1 board/block finishing per step the reset cond fires most
        # steps, and regenerating (~30 ops + 2 PRNG draws) inside the loop
        # cost ~40 ms/4chunks (r4 measured).  Boards resetting at
        # different steps of one chunk share a layout only if the SAME row
        # resets twice within 64 steps (rare; the layout is still random
        # across rows and chunks).
        def make_fresh():
            if inject_reset:
                f14 = _fresh_boards(block, reset_in[0][:], reset_in[1][:])
            else:
                f14 = _fresh_boards(block)
            # Fresh boards have no bombs: the packed plane is the zero
            # plane (f14 carries four separate zero planes; keep one).
            fr = f14[:3] + (f14[3],) + f14[7:]
            if simple:
                # Ring slots reset to encoded (0,0) = _RP_STALE in every
                # BYTE of the packed ring word -- see
                # simple_fsm_state_init (stale-slot reads in _HasRPLoop).
                rp_pk0 = jnp.full((block, 4), _RP_STALE * 0x01010101, I32)
                z4 = jnp.zeros((block, 4), I32)
                fr = fr + (rp_pk0, z4, z4)
            return fr

        # PALLAS_FRESH_PER_STEP=1: regenerate the replacement boards
        # inside every step instead of hoisting one set per chunk --
        # probes whether the hoisted planes' loop-long VMEM residency is
        # what the skip=reset attribution charges (r5 experiment knob).
        if _os.environ.get("PALLAS_FRESH_PER_STEP", "0") == "1":
            fresh = make_fresh
        else:
            fresh = make_fresh()

    full = tuple(r[:] for r in state_in)
    # Pack the four bomb planes ONCE per chunk; the loop carries the packed
    # plane and _step_block consumes/produces it directly.
    bp0 = full[3] + (full[4] << 4) + (full[5] << 10) + (full[6] << 13)
    carry = full[:3] + (bp0,) + full[7:11 + 3]
    if simple:
        # FSM state packed ONCE per chunk (r5): ring slots as bytes of
        # one word (codes <= 168), moveQueue slots as nibbles, and the
        # constant-zero ring head dropped -- the loop carry shrinks from
        # 21 to 14 arrays (less carry churn + a narrower reset merge).
        g11 = full[:3] + (bp0,) + full[7:14]
        rp0, rp1, rp2_, rp3, _rph, rpc0, mq0, mq1, mq2_, mq3 = full[14:24]
        rp_pk = rp0 | (rp1 << 8) | (rp2_ << 16) | (rp3 << 24)
        mq_pk = mq0 | (mq1 << 4) | (mq2_ << 8) | (mq3 << 12)
        carry = g11 + (rp_pk, rpc0, mq_pk)
    # Pipelined mask (see body): seed with the INITIAL state's mask so
    # boards entering the chunk already finished reset at step 0, and
    # catch up with TWO merges after the loop (the pipeline leaves
    # boards finishing in the last two steps unmerged) -- chunk callers
    # observe fully-reset output exactly as before.
    if auto_reset and "reset" not in _SKIP:
        carry = carry + (_finished_mask(carry[10]),)
    else:
        carry = carry + (jnp.zeros((block, 1), I32),)
    carry = jax.lax.fori_loop(0, steps, body, carry)
    carry = carry[:-1]
    if auto_reset and "reset" not in _SKIP:
        # One catch-up merge: the final state's own mask covers every
        # board the pipeline left unreset (those finishing in the last
        # two steps).
        carry = merge_fresh(carry, _finished_mask(carry[10]))
    bp = carry[3]
    out = (carry[:3] + (bp & 15, (bp >> 4) & 63, (bp >> 10) & 7,
                        (bp >> 13) & 3) + carry[4:11])
    if simple:
        rp_pk, rpc_o, mq_pk = carry[11:14]
        out = out + tuple(
            ((rp_pk >> (8 * k)) & 255) for k in range(4)
        ) + (jnp.zeros_like(rpc_o), rpc_o) + tuple(
            ((mq_pk >> (4 * k)) & 7) for k in range(4)
        )
    for ref, val in zip(state_out, out):
        ref[:] = val


@functools.partial(
    jax.jit,
    static_argnames=("steps", "interpret", "policy", "record", "auto_reset",
                     "inject_slots", "prng_rand"),
)
def pallas_rollout_chunk(cs: CellState, seed, steps: int = 64,
                         interpret: bool = False,
                         policy: str = "random",
                         moves=None,
                         record: bool = False,
                         auto_reset: bool = True,
                         fsm_state=None,
                         inject_slots: tuple = (),
                         prng_rand: bool = False,
                         reset_boards=None):
    """Run ``steps`` random-policy auto-reset env steps in ONE kernel call.

    The throughput path for scripted/random self-play: per chunk the plane
    state makes a single HBM round trip.  ``seed`` is an i32 scalar; the
    in-kernel PRNG is seeded per (seed, block).  Win/draw bookkeeping is the
    caller's concern (finished boards restart immediately); ``timestep``
    advances by ``steps`` uniformly.

    Test hooks: pass ``moves`` (i32[steps, B, 4]) to inject a fixed move
    stream instead of the in-kernel PRNG (interpret-mode compatible);
    ``record=True`` additionally returns ``(moves_drawn[steps, B, 4],
    done[steps, B])`` so tests can replay the exact trajectory through the
    cellular engine; ``auto_reset=False`` disables board regeneration.
    Returns ``CellState`` (or ``(CellState, moves, done)`` when recording).

    ``policy="simple"`` runs the in-kernel SimpleAgent FSM
    (engine/pallas_fsm.py): pass ``fsm_state`` (a 10-tuple of i32[B,4]
    arrays, e.g. ``simple_fsm_state_init(b)``; ``moves`` then injects the
    per-agent rand stream) and the result gains a trailing fsm_state
    output: ``(CellState, fsm_state')`` (+ record outputs in between).

    ``inject_slots`` (simple mode, needs ``moves``): mixed control -- the
    FSM drives every slot except those listed, which execute the moves
    input verbatim (the PPO-learner-vs-SimpleAgent configuration, one
    kernel launch per env step).  ``prng_rand=True`` sources the FSM's
    rand draws from the in-kernel PRNG (production; otherwise the
    non-override lanes of ``moves`` supply them, which is what
    interpret-mode tests use).

    ``reset_boards`` (test hook): a ``(board, hidden)`` pair of i32[B,
    NUM_CELLS] pre-generated terrain planes replacing the auto-reset
    PRNG draws -- lets interpret-mode tests (and the multichip dryrun)
    run the REAL auto-reset merge path off-TPU (VERDICT r4 item 5).
    """
    b = cs.board.shape[0]
    assert b % CHUNK_BLOCK == 0 or b < CHUNK_BLOCK, (
        f"batch {b} not blockable into {CHUNK_BLOCK}-board grid blocks; "
        f"pad the batch to a multiple of {CHUNK_BLOCK}"
    )
    block = min(b, CHUNK_BLOCK)
    inject = moves is not None

    def pad(p):
        return jnp.pad(p, ((0, 0), (0, LANES - NUM_CELLS)))

    planes = [
        pad(cs.board), pad(cs.hidden_pow), pad(cs.flame_timer),
        pad(cs.bomb_timer), pad(cs.bomb_strength), pad(cs.bomb_dir),
        pad(cs.bomb_owner),
    ]
    agents = [
        cs.agent_x, cs.agent_y, cs.agent_bomb_count, cs.agent_max_bombs,
        cs.agent_strength, cs.agent_can_kick.astype(I32),
        cs.agent_dead.astype(I32),
    ]
    seed_arr = jnp.asarray([seed], I32)

    grid = (b // block,)
    # Index maps under scalar prefetch receive the prefetched refs too.
    plane_spec = pl.BlockSpec(
        (block, LANES), lambda i, s: (i, 0), memory_space=pltpu.VMEM
    )
    agent_spec = pl.BlockSpec(
        (block, 4), lambda i, s: (i, 0), memory_space=pltpu.VMEM
    )
    mv_spec = pl.BlockSpec(
        (steps, block, 4), lambda i, s: (0, i, 0), memory_space=pltpu.VMEM
    )
    done_spec = pl.BlockSpec(
        (steps, block, 1), lambda i, s: (0, i, 0), memory_space=pltpu.VMEM
    )
    simple = policy == "simple"
    n_fsm = 10 if simple else 0
    if simple:
        assert fsm_state is not None and len(fsm_state) == 10, (
            "policy='simple' needs fsm_state (see simple_fsm_state_init)"
        )
    if inject_slots:
        assert simple and inject, (
            "inject_slots is the mixed-control mode: needs policy='simple' "
            "and a moves input carrying the override lanes"
        )
    in_specs = [plane_spec] * 7 + [agent_spec] * (7 + n_fsm)
    fsm_in = tuple(jnp.asarray(f, I32) for f in (fsm_state or ()))
    extra_in = ()
    if inject:
        in_specs.append(mv_spec)
        extra_in = (jnp.asarray(moves, I32),)
    inject_reset = reset_boards is not None
    if inject_reset:
        assert auto_reset, "inject_reset is the auto-reset test hook"
        fb, fh = reset_boards
        in_specs += [plane_spec, plane_spec]
        extra_in = extra_in + (
            pad(jnp.asarray(fb, I32)), pad(jnp.asarray(fh, I32))
        )
    out_specs = [plane_spec] * 7 + [agent_spec] * (7 + n_fsm)
    out_shape = (
        [jax.ShapeDtypeStruct((b, LANES), I32)] * 7
        + [jax.ShapeDtypeStruct((b, 4), I32)] * (7 + n_fsm)
    )
    if record:
        out_specs += [mv_spec, done_spec]
        out_shape += [
            jax.ShapeDtypeStruct((steps, b, 4), I32),
            jax.ShapeDtypeStruct((steps, b, 1), I32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
    )
    n_moves = {"random": 6, "harmless": 5, "simple": -1}[policy]
    outs = pl.pallas_call(
        functools.partial(
            _chunk_kernel, steps=steps, n_moves=n_moves,
            inject=inject, record=record, auto_reset=auto_reset,
            inject_slots=tuple(inject_slots), prng_rand=prng_rand,
            inject_reset=inject_reset,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # Default scoped-VMEM budget (16MB) caps the block at 128 boards;
            # raising it lets bigger tiles amortize Mosaic's per-op overhead.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(seed_arr, *planes, *agents, *fsm_in, *extra_in)

    (board, hidden, ftimer, btimer, bstr, bdir, bown,
     ax, ay, abc, amb, ast, akick, adead) = outs[:14]

    dead = adead != 0
    result = CellState(
        board=board[:, :NUM_CELLS],
        hidden_pow=hidden[:, :NUM_CELLS],
        flame_timer=ftimer[:, :NUM_CELLS],
        bomb_timer=btimer[:, :NUM_CELLS],
        bomb_strength=bstr[:, :NUM_CELLS],
        bomb_dir=bdir[:, :NUM_CELLS],
        bomb_owner=bown[:, :NUM_CELLS],
        agent_x=ax,
        agent_y=ay,
        agent_bomb_count=abc,
        agent_max_bombs=amb,
        agent_strength=ast,
        agent_can_kick=akick != 0,
        agent_dead=dead,
        alive_count=(AGENT_COUNT - jnp.sum(dead, axis=1)).astype(I32),
        timestep=cs.timestep + steps,
    )
    n_state = 14 + n_fsm
    fsm_out = tuple(outs[14:n_state])
    rec = (
        (outs[n_state], outs[n_state + 1][..., 0] != 0) if record else ()
    )
    if simple:
        return (result,) + rec + (fsm_out,)
    if record:
        return (result,) + rec
    return result


def simple_fsm_state_init(b: int):
    """Fresh SimpleAgent FSM state for ``pallas_rollout_chunk(policy=
    'simple')``: 10 i32[b,4] arrays (ring slots x4, ring head, ring
    count, moveQueue slots x4).  Ring slots start at ``_enc_pos(0, 0)``
    = 14, NOT 0: the reference's _HasRPLoop (simple_agent.cpp:24-35)
    reads ring slots [2] and [3] while count is still 2-3, and the
    oracle pins those stale reads to Position(0,0) (zero-initialized
    queue storage; simple_agent_init matches with rp_x=rp_y=0), so the
    kernel's encoded stale slots must read as (0,0) too.  Heads, counts
    and moveQueue slots start at 0 (= M_IDLE, matching the stale
    moveQueue reads)."""
    rp = jnp.full((b, 4), _RP_STALE, I32)
    return (rp, rp, rp, rp) + tuple(
        jnp.zeros((b, 4), I32) for _ in range(6)
    )


def _kernel(board_ref, hidden_ref, ftimer_ref, btimer_ref, bstr_ref,
            bdir_ref, bown_ref, ax_ref, ay_ref, abc_ref, amb_ref, ast_ref,
            akick_ref, adead_ref, moves_ref,
            o_board, o_hidden, o_ftimer, o_btimer, o_bstr, o_bdir, o_bown,
            o_ax, o_ay, o_abc, o_amb, o_ast, o_akick, o_adead):
    bp = (btimer_ref[:] + (bstr_ref[:] << 4) + (bdir_ref[:] << 10)
          + (bown_ref[:] << 13))
    outs = _step_block(
        board_ref[:], hidden_ref[:], ftimer_ref[:], bp, ax_ref[:],
        ay_ref[:], abc_ref[:], amb_ref[:], ast_ref[:], akick_ref[:],
        adead_ref[:], moves_ref[:],
    )
    bp = outs[3]
    outs = (outs[:3] + (bp & 15, (bp >> 4) & 63, (bp >> 10) & 7,
                        (bp >> 13) & 3) + outs[4:])
    refs = (o_board, o_hidden, o_ftimer, o_btimer, o_bstr, o_bdir, o_bown,
            o_ax, o_ay, o_abc, o_amb, o_ast, o_akick, o_adead)
    for ref, val in zip(refs, outs):
        ref[:] = val


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_step(cs: CellState, moves, interpret: bool = False) -> CellState:
    """Batched fused step: ``cs`` planes are [B, 121], ``moves`` is [B, 4].

    Pads cells to 128 lanes, runs the fused kernel over a boards grid, and
    strips the padding.  ``alive_count``/``timestep`` are maintained outside
    the kernel.
    """
    b = cs.board.shape[0]
    assert b % BLOCK == 0 or b < BLOCK, f"batch {b} not blockable"
    block = min(b, BLOCK)

    def pad(p):
        return jnp.pad(p, ((0, 0), (0, LANES - NUM_CELLS)))

    planes = [
        pad(cs.board), pad(cs.hidden_pow), pad(cs.flame_timer),
        pad(cs.bomb_timer), pad(cs.bomb_strength), pad(cs.bomb_dir),
        pad(cs.bomb_owner),
    ]
    agents = [
        cs.agent_x, cs.agent_y, cs.agent_bomb_count, cs.agent_max_bombs,
        cs.agent_strength, cs.agent_can_kick.astype(I32),
        cs.agent_dead.astype(I32),
    ]
    moves = jnp.asarray(moves, I32)

    grid = (b // block,)
    plane_spec = pl.BlockSpec(
        (block, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    agent_spec = pl.BlockSpec(
        (block, 4), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [plane_spec] * 7 + [agent_spec] * 8
    out_specs = [plane_spec] * 7 + [agent_spec] * 7
    out_shape = (
        [jax.ShapeDtypeStruct((b, LANES), I32)] * 7
        + [jax.ShapeDtypeStruct((b, 4), I32)] * 7
    )

    outs = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*planes, *agents, moves)

    (board, hidden, ftimer, btimer, bstr, bdir, bown,
     ax, ay, abc, amb, ast, akick, adead) = outs

    def unpad(p):
        return p[:, :NUM_CELLS]

    dead = adead != 0
    return CellState(
        board=unpad(board),
        hidden_pow=unpad(hidden),
        flame_timer=unpad(ftimer),
        bomb_timer=unpad(btimer),
        bomb_strength=unpad(bstr),
        bomb_dir=unpad(bdir),
        bomb_owner=unpad(bown),
        agent_x=ax,
        agent_y=ay,
        agent_bomb_count=abc,
        agent_max_bombs=amb,
        agent_strength=ast,
        agent_can_kick=akick != 0,
        agent_dead=dead,
        alive_count=(AGENT_COUNT - jnp.sum(dead, axis=1)).astype(I32),
        timestep=cs.timestep,
    )
