"""In-kernel SimpleAgent FSM: the scripted-self-play policy fused into the
Pallas chunk kernel.

Re-implements the decision cascade of ``agents/simple_cellular.py`` (itself
the plane-based production mirror of the conformance FSM in
``agents/simple.py``, reference src/agents/simple_agent.cpp:12-139) on
kernel tiles, so SimpleAgent self-play -- the reference's checked-in
benchmark configuration (performance_test.cpp:38) -- runs entirely inside
the fused chunk kernel with state resident in VMEM.

The throughput trick is the 4-agent SWAR BFS: all four agents' VISITED
masks live in ONE [block,128] plane as 8-bit byte fields and the wave
expands for all of them together.  The FSM consumes the BFS only through
reachability predicates and root ranks (never distance magnitudes), so
the wave needs no SWAR distance arithmetic at all -- the round body is
pure AND/OR/shift, ~40% fewer ops than the compare-select distance
version it replaced (r3).  Direction priority (DOWN, UP, RIGHT, LEFT --
the reference's TryAdd order, strategy.cpp:82-89) is preserved by
expanding directions sequentially with first-writer-wins, exactly like
strategy/cellular_toolkit.fill_reach_map; root-rank labels ride in the
same packed field (vis | rank << 1 per agent).

Equivalence with simple_agent_cell_joint (same rand stream) is asserted in
tests/test_pallas_fsm.py (interpret mode).
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import (
    BOARD_SIZE,
    C_EXTRABOMB,
    C_KICK,
    C_PASSAGE,
    C_WOOD,
    M_BOMB,
    M_DOWN,
    M_IDLE,
    M_LEFT,
    M_RIGHT,
    M_UP,
    NUM_CELLS,
)
from ..core.state import I32
from .pallas_step import (
    LANES,
    _SKIP,
    _is_agent,
    _lane_iota,
    _push,
    _push_h,
    _push_masks,
)

# SWAR constants (int32 bit patterns).
_BYTE = 0xFF
# BFS combined-plane 3-bit fields: bit 3i = visited(agent i), bits
# [3i+1, 3i+3) = root rank.
_VIS3 = np.int32(0b001001001001)

# BFS relaxation priority = reference TryAdd order (strategy.cpp:82-89):
# DOWN, UP, RIGHT, LEFT; rank r encodes the root move with that priority.
_PRIORITY = (M_DOWN, M_UP, M_RIGHT, M_LEFT)
_RANK_TO_MOVE = _PRIORITY  # rank index -> move code

# Cell offsets per move code 1..4 (UP -y, DOWN +y, LEFT -x, RIGHT +x).
_MOVE_OFF = {M_UP: -BOARD_SIZE, M_DOWN: BOARD_SIZE, M_LEFT: -1, M_RIGHT: 1}

_BIGD = 10000
_NOCELL = 999  # "no candidate" cell sentinel (matches no lane)


def _iota4(block):
    return jax.lax.broadcasted_iota(I32, (block, 4), 1)


def _rot4(a, k):
    if a.dtype == jnp.bool_:
        b = jnp.concatenate([a[:, k:].astype(I32), a[:, :k].astype(I32)], 1)
        return b != 0
    return jnp.concatenate([a[:, k:], a[:, :k]], axis=1)


def _is_walkable_t(board):
    return (board == C_PASSAGE) | ((board >= C_EXTRABOMB) & (board <= C_KICK))


_BYTE_AT = tuple(np.int32(np.uint32(0xFF << (8 * i))) for i in range(4))
_NIBBLE_HI = tuple(np.int32(np.uint32(0xF0 << (8 * i))) for i in range(4))


def _mkw_bytes(oh):
    """One-hot list (len 4) -> byte-field weight plane (field i = 0xFF)."""
    w = jnp.zeros(oh[0].shape, I32)
    for i in range(4):
        w = w + (oh[i].astype(I32) * _BYTE_AT[i])
    return w


def _mkw_hi(oh):
    """One-hot list (len 4) -> weight plane with field i = 0xF0 (the high
    nibble of byte i) -- the second field set of a merged byte read."""
    w = jnp.zeros(oh[0].shape, I32)
    for i in range(4):
        w = w + (oh[i].astype(I32) * _NIBBLE_HI[i])
    return w


def danger_map_tile(btimer, bstr, valid):
    """Per-cell min ticks-to-blast (cf. cellular_toolkit.danger_map_cell)."""
    has_bomb = (btimer > 0) & valid
    danger = jnp.where(has_bomb, btimer, _BIGD)
    t0 = jnp.where(has_bomb, btimer, 0)
    s0 = jnp.where(has_bomb, bstr, 0)
    max_s = jnp.max(s0)
    pm = _push_masks(btimer.shape[0])

    def body(carry):
        t1, s1, t2, s2, t3, s3, t4, s4, danger, k = carry
        outs = []
        for d, (t_sh, s_sh) in zip(
            (1, 2, 3, 4), ((t1, s1), (t2, s2), (t3, s3), (t4, s4))
        ):
            t_sh = _push_h(t_sh, pm, d)
            s_sh = _push_h(s_sh, pm, d)
            cover = (t_sh > 0) & (s_sh >= k)
            danger = jnp.minimum(danger, jnp.where(cover, t_sh, _BIGD))
            outs += [t_sh, s_sh]
        return tuple(outs) + (danger, k + 1)

    def cond(carry):
        return carry[-1] <= jnp.minimum(max_s, BOARD_SIZE - 1)

    init = (t0, s0) * 4 + (danger, jnp.ones((), I32))
    out = jax.lax.while_loop(cond, body, init)
    danger = out[-2]
    return jnp.where(danger == _BIGD, 0, danger)


def swar_bfs(board, ac, valid, alive=None, pmQ=None):
    """4-agent BFS -> fr: byte-packed (vis | rank << 1) 3-bit fields.

    Byte i of the returned [block, LANES] plane holds agent i's raw BFS
    field for the cell: bit 0 = visited (source included), bits [1,3) =
    root rank (index into _RANK_TO_MOVE; meaningful only when visited and
    not the source).  Consumers decode ok = f & 1, rank = f >> 1.

    ``alive`` ([block,4] bool) prunes DEAD agents' sources (r4): waves are
    per-agent-isolated bit fields, a dead agent's moves are masked before
    use/recording, and its FSM state is never consulted again before the
    board resets -- so skipping its wave changes no observable move while
    letting the block-max convergence loop stop at the LIVE waves' extent
    (a dead agent's stale source on a reverted-to-passage cell otherwise
    expands a full wave of its own).

    The FSM consumes BFS results ONLY through reachability predicates and
    root ranks (fsm_block reads ``df != 0 && df < 0x7E`` and the rank --
    never a distance magnitude), so the wave tracks (visited, rank)
    packed into ONE plane as 3-bit fields (bit 3i = visited from agent i,
    bits [3i+1, 3i+3) = root rank).  The round cost is dominated by
    ``_push`` lane rotations (~100 ns each vs ~10 ns for a fused
    element-wise op -- measured via scripts/profile_fsm.py attribution;
    the r2 distance version needed 8 pushes/round, two per direction);
    packing lets each direction push the combined field ONCE, halving
    the pushes.  All remaining ops are carry-free bitwise.  Visit order
    is identical to the distance version -- a cell enters V exactly at
    round == its BFS distance, directions relax sequentially
    (DOWN/UP/RIGHT/LEFT) with first-writer-wins -- so rank tie-breaks
    still match cellular_toolkit.fill_reach_map bit-for-bit.

    NOTE an exact early exit cannot beat run-to-convergence here: the
    loop terminates per 128-board BLOCK, and on measured self-play states
    ~21% of boards have an unreachable consumed cell (certifiable only at
    convergence), capping the block-max ceiling at ~1.07x
    (scripts/bfs_round_histogram.py; VERDICT r2 item 2 negative result).
    """
    block = board.shape[0]
    lane = _lane_iota(block)
    walk = _is_walkable_t(board) & valid
    enterable = walk | (_is_agent(board) & valid)

    oh_src = [lane == ac[:, i : i + 1] for i in range(4)]
    if alive is not None:
        oh_src = [oh_src[i] & alive[:, i : i + 1] for i in range(4)]
    src3 = jnp.zeros((block, LANES), I32)
    for i in range(4):
        src3 = src3 | (oh_src[i].astype(I32) << (3 * i))

    # --- 2-board row packing -------------------------------------------
    # The wave is vector-throughput-bound (vreg count per op); the 12-bit
    # field group of board b and board b+block/2 fit side by side in one
    # i32 ([12h, 12h+12) for half h), so the whole BFS runs on HALF the
    # sublane rows -- every round op touches half the vregs.  Pure
    # bitwise fields make this free of carry/guard concerns; pack and
    # unpack are a handful of one-time ops.
    halves = 2 if block % 2 == 0 else 1
    if _os.environ.get("FSM_BFS_HALVES", "") == "1":
        halves = 1  # experiment knob: unpacked rounds on [block,128]
    Q = block // halves
    vis_m = _VIS3
    for h in range(1, halves):
        vis_m = vis_m | (_VIS3 << (12 * h))

    def pk(x12):
        """[block,128] rows of <=12-bit values -> [Q,128] packed halves."""
        if halves == 1:
            return x12
        return x12[:Q] | (x12[Q:] << 12)

    walk12 = jnp.where(walk, 0xFFF, 0)
    ent12 = jnp.where(enterable, 0xFFF, 0)
    walk_p = pk(walk12)
    ent_p = pk(ent12)
    src_p = pk(src3)

    # Per-direction source planes with the rank PRE-SEEDED in the source
    # fields (r5): a cell's cand comes from exactly one parent per push
    # direction, so seeding the src field with 0b001|rank<<1 makes the
    # pushed cand carry the correct root rank for src-adjacent cells with
    # NO in-loop override (the r4 nrs/sav masks cost 3 ops/direction/
    # round).  Fields are 3 bits apart and 1+2*rank <= 7, so the constant
    # multiply is carry-free (= per-field OR of vis|rank bits).
    if pmQ is None or Q != next(iter(pmQ.values()))[1].shape[0]:
        pmQ = _push_masks(Q)
    srk = {}
    for rank, mv in enumerate(_PRIORITY):
        srk[mv] = src_p * (1 + 2 * rank)

    # Rounds are cheap (4 pushes + ~50 fused bitwise ops) but each
    # while_loop iteration carries a large fixed cost (scalar-loop
    # round trip + the cross-lane `any` reduction) -- measured ~650
    # ns/round of which <200 ns is the actual vector work.  Unrolling
    # UNROLL rounds per body amortizes that overhead; rounds after
    # convergence are exact no-ops (the wave is stable), so the only
    # waste is up to UNROLL-1 idle rounds at the end.
    UNROLL = int(_os.environ.get("FSM_BFS_UNROLL", "2"))

    # Round-invariant fold (r4): new-visit candidates are masked by ONE
    # precomputed plane, and an unvisited cell's whole 3-bit field is 000
    # (rank bits are only ever written together with the vis bit), so the
    # field merge is a plain OR -- ~4 fewer ops per direction.
    vm_ent = vis_m & ent_p

    def one_round(c):
        # Jacobi within the round: the wave expands from the ROUND-START
        # visited set (so a cell reached this round expands next round),
        # but `new` tests against the accumulating c -- an earlier
        # direction wins the round's ties, the toolkit's exact rule.
        # Sources expand even though their cells are not walkable
        # (agents block paths but are BFS targets); their fields ride in
        # srk[mv] with the rank pre-seeded.
        base = c & walk_p
        for mv in _PRIORITY:
            cand = _push_h(base | srk[mv], pmQ, mv)  # parent vis|rank
            new = (cand & ~c) & vm_ent     # vis bits of first visits
            mm = (new << 3) - new          # full 0b111 field masks
            c = c | (cand & mm)
        return c

    def body(carry):
        c0, _, k = carry
        c = c0
        for _ in range(UNROLL):
            c = one_round(c)
        # Convergence via monotone growth: c changed iff some cell was
        # newly visited this body.  ONE cross-lane reduction per UNROLL
        # rounds (reductions cost ~an order more than element-wise ops).
        return c, jnp.any(c != c0).astype(I32), k + UNROLL

    # Straight-line PREFIX (r5): the block terminator is the MAX round
    # over 128 boards -- measured mean 27.0, and a block essentially never
    # converges before ~20 (per-board p5 is ~11 and the block max is over
    # 128 draws; scripts/bfs_round_histogram.py).  The wave is monotone,
    # so post-convergence rounds are exact no-ops: running the first
    # PREFIX rounds with NO while_loop machinery is always correct and
    # skips ceil(PREFIX/UNROLL) body overheads (~650 ns each: scalar
    # round trip + cross-lane any -- about half the measured BFS time at
    # UNROLL=4).
    PREFIX = int(_os.environ.get("FSM_BFS_PREFIX", "24"))
    # FSM_BFS_FIXED=N (profiling only): run exactly ceil(N/UNROLL)
    # bodies, no convergence check -- isolates per-round cost vs count.
    _fixed = int(_os.environ.get("FSM_BFS_FIXED", "0"))
    if _fixed:
        PREFIX = 0
    c = src_p
    for _ in range(PREFIX):
        c = one_round(c)
    if _fixed:
        def cond(carry):
            return carry[2] < _fixed
    else:
        # The convergence check is the real terminator.  The cap only
        # exists as a compile-time bound and must cover the worst
        # possible shortest path on the board (a serpentine corridor can
        # reach ~120 cells), else far cells would silently read
        # unreachable and diverge from cellular_toolkit.fill_reach_map's
        # run-to-convergence loop.
        def cond(carry):
            return (carry[1] != 0) & (carry[2] < NUM_CELLS)

    c, _, _ = jax.lax.while_loop(
        cond, body, (c, jnp.ones((), I32), jnp.asarray(PREFIX, I32))
    )

    # Slim unpack (r5): hand the FSM's packed readers the RAW 3-bit
    # (vis | rank << 1) field per agent in byte lanes -- consumers decode
    # ok = field & 1, rank = field >> 1 directly, so the old 0xFF-visited
    # expansion and separate rank plane (~48 ops) shrink to one
    # shift/mask/merge per agent/half (~24) plus per-agent vis-bit planes
    # for the flee-window test (vb, bit 0 of each byte).
    frs = []
    for h in range(halves):
        ch = c >> (12 * h)
        f = jnp.zeros((Q, LANES), I32)
        for i in range(4):
            f = f | (((ch >> (3 * i)) & 7) << (8 * i))
        frs.append(f)
    fr = frs[0] if halves == 1 else jnp.concatenate(frs, axis=0)
    return fr


def _rank_to_move_arr(rank):
    mv = jnp.full(rank.shape, _RANK_TO_MOVE[0], I32)
    for rk in (1, 2, 3):
        mv = jnp.where(rank == rk, _RANK_TO_MOVE[rk], mv)
    return mv


def _move_towards(v_at, r_at):
    """Toolkit move_towards_cell: IDLE unless the cell is BFS-reached.

    ``v_at`` is the visited byte (0xFF/0); callers guarantee the cell is
    never the agent's own (the toolkit's dist==0 exclusion)."""
    ok = v_at != 0
    return jnp.where(ok, _rank_to_move_arr(r_at), M_IDLE).astype(I32)


def _mv_dxdy(mv):
    dx = jnp.zeros_like(mv)
    dy = jnp.zeros_like(mv)
    dx = jnp.where(mv == M_LEFT, -1, jnp.where(mv == M_RIGHT, 1, dx))
    dy = jnp.where(mv == M_UP, -1, jnp.where(mv == M_DOWN, 1, dy))
    return dx, dy


def _enc_pos(px, py):
    """Position (incl. out-of-bounds -1..11) -> unique ring-slot code."""
    return (px + 1) + 13 * (py + 1)


def fsm_block(board, btimer, bstr, ac, abc, amb, adead, rand,
              rp_pk, rpc, mq_pk, inv=None):
    """SimpleAgent joint act on kernel tiles.

    ``rand``: i32[block,4] in [0,5) (one draw per agent-act, like
    simple_agent_cell_joint).  ``rp_pk``: the 4 ring slots (encoded
    positions <= 168) PACKED as bytes of one i32[block,4] word (slot k at
    bits [8k, 8k+8); logical order, slot 0 oldest); ``rpc``: ring count;
    ``mq_pk``: the 4 persistent moveQueue slots packed as nibbles (slot k
    at bits [4k, 4k+4)).  The packing (r5) shrinks the chunk loop carry
    from 10 FSM arrays to 3.  Returns (moves, rp_pk', rpc', mq_pk').
    """
    block = board.shape[0]
    inv = inv or {}
    lane = inv.get("lane")
    if lane is None:
        lane = _lane_iota(block)
    lane4 = _iota4(block)
    valid = inv.get("valid")
    if valid is None:
        valid = lane < NUM_CELLS
    lx = lane % BOARD_SIZE
    ly = lane // BOARD_SIZE
    walk1 = _is_walkable_t(board) & valid

    acx = ac % BOARD_SIZE
    acy = ac // BOARD_SIZE
    alive = adead == 0

    # --- shared maps ------------------------------------------------------
    # (fsm_danger / fsm_bfs / fsm_sort in PALLAS_SKIP_PHASES stub a phase
    # out for cost attribution; never set in production.)
    if "fsm_danger" in _SKIP:
        dmap = jnp.zeros((block, LANES), I32)
    else:
        dmap = danger_map_tile(btimer, bstr, valid)
    safe1 = (dmap == 0) | (dmap >= 2)
    if "fsm_bfs" in _SKIP:
        fr_pl = jnp.zeros((block, LANES), I32)  # nothing visited
    else:
        fr_pl = swar_bfs(board, ac, valid, alive, pmQ=inv.get("pmQ"))

    oh_ac = [lane == ac[:, i : i + 1] for i in range(4)]

    # Per-agent scalars, r4 merged reads: the own-cell danger value (4-bit
    # fields, bits [16,32)) and ALL 16 SafeDirections neighbor predicates
    # (walkable & safe(2), 1-bit fields, bits [0,16)) share ONE lane
    # reduction -- the neighbor probe only ever consumes the conjunction,
    # never the separate bits.  wood-adjacency rides the later
    # destination-predicate reduction (it is consumed late, in b4).
    wood = (board == C_WOOD) & valid
    wood_adj_pl = wood
    for dd in (1, 2, 3, 4):
        wood_adj_pl = wood_adj_pl | _push(wood, dd, False)

    # Neighbor cells for SafeDirections, order RIGHT, LEFT, DOWN, UP
    # (strategy.cpp:197-221).
    n_off = ((1, 0, M_RIGHT), (-1, 0, M_LEFT), (0, 1, M_DOWN), (0, -1, M_UP))
    inbs = []
    for (dx, dy, mv) in n_off:
        nx = acx + dx
        ny = acy + dy
        inb = (nx >= 0) & (nx < BOARD_SIZE) & (ny >= 0) & (ny < BOARD_SIZE)
        inbs.append(inb)

    s1w = (safe1 & walk1).astype(I32)
    # Neighbor weight plane from 4 PUSHES of one packed agent-bit plane
    # (r5): onehot(ac + delta_s) = push_s(onehot(ac)), so the 16 one-hot
    # compares + shift/add pairs collapse to one packed build + 4 pushes
    # (~24 fewer ops; OOB neighbors drop out of the push mask, and ok_s
    # is gated on inbs anyway).
    w0 = oh_ac[0].astype(I32)
    for i in (1, 2, 3):
        w0 = w0 | (oh_ac[i].astype(I32) << i)
    w_nb = jnp.zeros((block, LANES), I32)
    for s, (_, _, mv) in enumerate(n_off):
        w_nb = w_nb | (_push(w0, mv, False) << (4 * s))
    w_own = jnp.zeros((block, LANES), I32)
    for i in range(4):
        w_own = w_own + (oh_ac[i].astype(I32) << (16 + 4 * i))
    red_on = jnp.zeros((block, 1), I32) if "fsm_red" in _SKIP else \
        jnp.sum(s1w * w_nb + jnp.clip(dmap, 0, 15) * w_own,
                axis=1, keepdims=True)
    ok_s = [
        inbs[s] & (((red_on >> (4 * s + lane4)) & 1) != 0) for s in range(4)
    ]
    danger_self = (red_on >> (16 + 4 * lane4)) & 15
    in_danger = danger_self > 0

    # Second neighbor read (r5, replaces the r4 red_de stage): walkable &
    # safe(5) at the 4 neighbors (bits [0,16), reusing w_nb) + the
    # own-cell wood-adjacency bit (bits [16,20)).  Independent of red_se,
    # so the two can overlap.
    safe5 = (dmap == 0) | (dmap >= 5)
    s5w = (safe5 & walk1).astype(I32)
    w_wd = jnp.zeros((block, LANES), I32)
    for i in range(4):
        w_wd = w_wd + (oh_ac[i].astype(I32) << (16 + i))
    red_on2 = jnp.zeros((block, 1), I32) if "fsm_red" in _SKIP else \
        jnp.sum(s5w * w_nb + wood_adj_pl.astype(I32) * w_wd,
                axis=1, keepdims=True)
    ok5_s = [
        inbs[s] & (((red_on2 >> (4 * s + lane4)) & 1) != 0) for s in range(4)
    ]
    wood_adj = ((red_on2 >> (16 + lane4)) & 1) != 0

    # --- path A: flee -----------------------------------------------------
    # Safe-place candidate per agent: first window cell (row-major),
    # replicating the reference's buggy bounds (strategy.cpp:126-128).
    # r4: the four per-agent min-reductions became ONE bitwise doubling
    # prefix-or over a 4-bit packed mask plane -- first-set-lane IS the
    # row-major minimum, and the bitwise scan serves all four agents at
    # once (reductions cost ~an order more than element-wise ops).
    if "fsm_flee" in _SKIP:  # cost attribution only
        first4 = jnp.zeros((block, LANES), I32)
    else:
        m4 = jnp.zeros((block, LANES), I32)
        for i in range(4):
            rad = danger_self[:, i : i + 1]
            ox = acx[:, i : i + 1]
            oy = acy[:, i : i + 1]
            manh = jnp.abs(lx - ox) + jnp.abs(ly - oy)
            # The reference's buggy window is (ly in [oy-rad, rad)) x (lx
            # in [ox-rad, rad)) & manh <= rad; the two LOWER bounds are
            # implied by manh <= rad (|ly-oy| <= manh), so only the buggy
            # upper bounds remain.  Reachable and not the agent's own
            # cell (the toolkit's dist != 0 && dist != unreachable
            # filter).
            vf = (fr_pl >> (8 * i)) & 1
            mask = (
                (ly < rad) & (lx < rad) & (manh <= rad) & (vf != 0)
                & (lane != ac[:, i : i + 1]) & safe1 & valid
            )
            m4 = m4 | (mask.astype(I32) << i)
        pref = m4
        for sh in (1, 2, 4, 8, 16, 32, 64):
            pref = pref | jnp.where(lane >= sh, pltpu.roll(pref, sh, 1), 0)
        excl = jnp.where(lane >= 1, pltpu.roll(pref, 1, 1), 0)
        first4 = m4 & ~excl  # bit i: THE first masked lane per agent
    oh_sc = [((first4 >> i) & 1) != 0 for i in range(4)]

    # Enemy target: first live agent (id order) within manhattan 7 not on
    # my cell (strategy.cpp:163-186).  Computed here so the enemy-cell and
    # safe-cell (vis|rank) lookups share ONE packed lane reduction.
    manh_k = [None] + [
        jnp.abs(_rot4(acx, k) - acx) + jnp.abs(_rot4(acy, k) - acy)
        for k in (1, 2, 3)
    ]
    alive_k = [None] + [_rot4(alive, k) for k in (1, 2, 3)]
    # "First live agent in ID order within manhattan 7" == the candidate
    # with MINIMAL target id j = (i+k) & 3 (each k names a distinct j per
    # lane, so min-j selection replaces the r4 4x3 priority sweep -- ~70
    # fewer [block,4] ops, r5).
    ecell = jnp.full((block, 4), _NOCELL, I32)
    best_j = jnp.full((block, 4), 4, I32)
    for k in (1, 2, 3):
        jv = (lane4 + k) & 3
        take = (
            alive_k[k] & (manh_k[k] <= 7) & (manh_k[k] > 0)
            & (jv < best_j)
        )
        best_j = jnp.where(take, jv, best_j)
        ecell = jnp.where(take, _rot4(ac, k), ecell)

    # One merged read for BOTH lookups: byte i carries agent i's safe-cell
    # (vis|rank) field in its low nibble and its enemy-cell field in the
    # high nibble (field values are 3 bits, so fr_pl << 4 stays in-byte).
    w_sc = _mkw_bytes(oh_sc)
    w_ec = _mkw_hi([lane == ecell[:, i : i + 1] for i in range(4)])
    red_se = jnp.zeros((block, 1), I32) if "fsm_red" in _SKIP else \
        jnp.sum((fr_pl & w_sc) + ((fr_pl << 4) & w_ec),
                axis=1, keepdims=True)
    s_at = (red_se >> (8 * lane4)) & 7
    e_at = (red_se >> (8 * lane4 + 4)) & 7
    m_safe = _move_towards(s_at & 1, s_at >> 1)
    m_enemy = _move_towards(e_at & 1, e_at >> 1)

    # Destination checks for m_safe / m_enemy (r5): the destinations are
    # always the agent's 4-NEIGHBORS (or its own cell when IDLE, where
    # both predicates are vacuously false -- the agent occupies it, so
    # walkable is false), and red_on/red_on2 already read every neighbor's
    # predicate.  Selecting the m_safe/m_enemy direction's neighbor bit
    # replaces the r4 red_de reduction AND its dynamic one-hot weight
    # build (~40 ops), and red_on2 has no data dependency on red_se, so
    # the chain of cross-lane reductions shortens by one stage.
    a_ok = jnp.zeros((block, 4), jnp.bool_)
    b3_ok = jnp.zeros((block, 4), jnp.bool_)
    for s, (_, _, mv) in enumerate(n_off):
        a_ok = a_ok | ((m_safe == mv) & ok_s[s])
        b3_ok = b3_ok | ((m_enemy == mv) & ok5_s[s])
    a_ok = in_danger & a_ok
    a_else = in_danger & ~a_ok

    # --- moveQueue recompute: SafeDirections + SortDirections -------------
    # (ok_s / inbs / ncells computed up top, merged into the own-cell
    # danger reduction.)
    # Compress ok moves in order into the first `count` slots.
    rank_s = []
    acc = jnp.zeros((block, 4), I32)
    for s in range(4):
        rank_s.append(acc)
        acc = acc + ok_s[s]
    mq_count = acc
    new_mq = []
    for rslot in range(4):
        val = jnp.zeros((block, 4), I32)
        for s, (_, _, mv) in enumerate(n_off):
            val = jnp.where(ok_s[s] & (rank_s[s] == rslot), mv, val)
        new_mq.append(
            jnp.where(rslot < mq_count, val, (mq_pk >> (4 * rslot)) & 7)
        )

    # r4: the ring is STORED in logical order (slot 0 = oldest; the ring
    # head is a constant 0 and not carried at all), so the 16-where
    # physical->logical gather the sort and rp-loop used to pay per step
    # disappears; a full ring pushes by shifting bytes down (see the
    # update at the end).  Stale-slot semantics are unchanged: byte slots
    # >= count hold _RP_STALE exactly as the head-0 physical layout did.
    rpl = [(rp_pk >> (8 * j)) & 255 for j in range(4)]

    # SortDirections: replicate the RemoveAt+AddElem aliasing walk
    # (strategy.hpp:130-152 via strategy/moves.py:sort_directions).
    #
    # r4 packed form: a slot's identity never changes during the walk --
    # only its POSITION -- and its visited predicate depends only on its
    # value + the (fixed) agent cell and ring.  So the walk runs on ONE
    # [block,4] integer per agent holding all four slots as nibbles
    # (bits [4k,4k+3) = move value, bit 4k+3 = precomputed visited), and
    # each application is ~20 element-wise ops (shift-window removal +
    # nibble append) instead of ~66 slot-array selects.
    z4 = jnp.zeros((block, 4), I32)
    if "fsm_sort" in _SKIP:
        s0, s1, s2, s3 = new_mq
    else:
        q = jnp.zeros((block, 4), I32)
        for k in range(4):
            v = jnp.clip(new_mq[k], 0, 5)
            dx, dy = _mv_dxdy(v)
            enc = _enc_pos(acx + dx, acy + dy)
            vis = jnp.zeros((block, 4), jnp.bool_)
            for j in range(4):
                vis = vis | ((j < rpc) & (rpl[j] == enc))
            q = q | ((v | (vis.astype(I32) << 3)) << (4 * k))
        # Walk-invariant masks: count is fixed for the whole walk.
        cm1 = jnp.clip(mq_count - 1, 0, 4)
        up_mask = (1 << (4 * cm1)) - 1      # nibbles < count-1
        sh_c = 4 * jnp.clip(mq_count - 1, 0, 3)
        app_clear = ~(15 << sh_c)

        i = z4
        removes = z4
        # The walk provably terminates within 8 applications (i advances
        # on every non-removing application, count <= 4 and removes is
        # capped at 4); past-termination applications are no-ops (the
        # `active` guard).  Straight-line, no reductions.
        for _ in range(8):
            active = (i < mq_count) & (removes < 4)
            sh_i = 4 * jnp.minimum(i, 7)    # i can run past 4; bound shift
            nib = (q >> sh_i) & 15
            do = active & (nib >= 8)        # bit 3 = visited
            low = (1 << sh_i) - 1
            win = up_mask & ~low            # nibbles [i, count-1)
            shifted = (q & ~win) | ((q >> 4) & win)
            val = (shifted >> sh_i) & 15
            appended = (shifted & app_clear) | (val << sh_c)
            q = jnp.where(do, appended, q)
            i = jnp.where(do, i - 1, i) + 1
            removes = removes + do
        s0, s1, s2, s3 = (q & 7, (q >> 4) & 7, (q >> 8) & 7,
                          (q >> 12) & 7)
    sorted_mq = [s0, s1, s2, s3]
    mq_empty = mq_count == 0
    m_queue = jnp.where(
        mq_empty, M_IDLE, jnp.where(rand % 2 == 1, s1, s0)
    ).astype(I32)

    # --- path B: aggression ----------------------------------------------
    # (manh_k / alive_k / ecell were computed up in path A so the enemy
    # lookup could share the safe-cell lane reduction.)
    adj1 = jnp.zeros((block, 4), jnp.bool_)
    adj7 = jnp.zeros((block, 4), jnp.bool_)
    for k in (1, 2, 3):
        adj1 = adj1 | (alive_k[k] & (manh_k[k] <= 1))
        adj7 = adj7 | (alive_k[k] & (manh_k[k] <= 7))

    # rp loop: rp[i] == rp[i+2] for i < count/2 (vacuously true otherwise).
    loop_eq = jnp.ones((block, 4), jnp.bool_)
    for i in range(2):
        act_i = i < (rpc // 2)
        loop_eq = loop_eq & ((rpl[i] == rpl[i + 2]) | ~act_i)
    rp_loop = loop_eq

    can_bomb = abc < amb
    b1 = ~in_danger & can_bomb & adj1
    b2 = ~in_danger & can_bomb & ~b1 & adj7 & rp_loop
    b3 = ~in_danger & can_bomb & ~b1 & ~b2 & adj7 & b3_ok
    b4 = ~in_danger & can_bomb & ~b1 & ~b2 & ~b3 & wood_adj
    c_path = ~in_danger & ~b1 & ~b2 & ~b3 & ~b4

    move = jnp.where(
        a_ok, m_safe,
        jnp.where(
            a_else, m_queue,
            jnp.where(
                b1, M_BOMB,
                jnp.where(
                    b2, (rand % 4).astype(I32),
                    jnp.where(b3, m_enemy, jnp.where(b4, M_BOMB, m_queue)),
                ),
            ),
        ),
    ).astype(I32)

    if "fsm_state_upd" in _SKIP:  # cost attribution only
        return move, rp_pk, rpc, mq_pk

    # moveQueue persists only when the queue path actually ran.  The sort
    # walk's q already holds the sorted slots as nibbles (bit 3 of each =
    # the visited flag), so the packed write is ONE select.
    mq_written = a_else | c_path
    if "fsm_sort" in _SKIP:
        q_vals = jnp.zeros((block, 4), I32)
        for k in range(4):
            q_vals = q_vals | (sorted_mq[k] << (4 * k))
    else:
        q_vals = q & 0x7777
    mq_out = jnp.where(mq_written, q_vals, mq_pk)

    # recentPositions ring update with the final move's desired position
    # (_mv_dxdy gives (0,0) for IDLE and BOMB, like DesiredPosition).
    # Logical-order push in byte space: a full ring shifts bytes down
    # (dropping the oldest; mask off the arithmetic-shift sign smear) and
    # appends at slot 3; a filling ring appends at slot ``count`` with a
    # masked byte write (stale slots keep _RP_STALE).
    fdx, fdy = _mv_dxdy(move)
    enc_new = _enc_pos(acx + fdx, acy + fdy)
    full = rpc == 4
    base = jnp.where(full, (rp_pk >> 8) & 0x00FFFFFF, rp_pk)
    slot8 = 8 * jnp.where(full, 3, rpc)
    rp_out = (base & ~(255 << slot8)) | (enc_new << slot8)
    return move, rp_out, jnp.minimum(rpc + 1, 4), mq_out
