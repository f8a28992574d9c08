"""In-kernel SimpleAgent FSM: the scripted-self-play policy fused into the
Pallas chunk kernel.

Re-implements the decision cascade of ``agents/simple_cellular.py`` (itself
the plane-based production mirror of the conformance FSM in
``agents/simple.py``, reference src/agents/simple_agent.cpp:12-139) on
kernel tiles, so SimpleAgent self-play -- the reference's checked-in
benchmark configuration (performance_test.cpp:38) -- runs entirely inside
the fused chunk kernel with state resident in VMEM.

The throughput trick is the 4-agent SWAR BFS: all four agents' distance
fields live in ONE [block,128] plane as 8-bit bytes and relax together
(classic SWAR compare-select with per-byte guard bits), so one relaxation
round costs ~24 vector ops for all agents instead of 4x that.  Direction
priority (DOWN, UP, RIGHT, LEFT -- the reference's TryAdd order,
strategy.cpp:82-89) is preserved by relaxing directions sequentially with
strict less-than, exactly like strategy/cellular_toolkit.fill_reach_map;
root labels ride in a second byte-packed plane.

Equivalence with simple_agent_cell_joint (same rand stream) is asserted in
tests/test_pallas_fsm.py (interpret mode).
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp
import numpy as np

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
from .pallas_step import LANES, _SKIP, _is_agent, _lane_iota, _push

# SWAR constants (int32 bit patterns; field i = byte i = agent i).
_WALLB = 0x7E
_WALL4 = np.int32(np.uint32(0x7E7E7E7E))
_ONE4 = np.int32(np.uint32(0x01010101))
_H4 = np.int32(np.uint32(0x80808080))
_BYTE = 0xFF

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


def _read_w(plane, w):
    """sum over lanes of plane & w -- disjoint-field packed read."""
    return jnp.sum(plane & w, axis=1, keepdims=True)


_BYTE_AT = tuple(np.int32(np.uint32(0xFF << (8 * i))) for i in range(4))


def _mkw_bytes(oh):
    """One-hot list (len 4) -> byte-field weight plane (field i = 0xFF)."""
    w = jnp.zeros(oh[0].shape, I32)
    for i in range(4):
        w = w + (oh[i].astype(I32) * _BYTE_AT[i])
    return w


def danger_map_tile(btimer, bstr, valid):
    """Per-cell min ticks-to-blast (cf. cellular_toolkit.danger_map_cell)."""
    has_bomb = (btimer > 0) & valid
    danger = jnp.where(has_bomb, btimer, _BIGD)
    t0 = jnp.where(has_bomb, btimer, 0)
    s0 = jnp.where(has_bomb, bstr, 0)
    max_s = jnp.max(s0)

    def body(carry):
        t1, s1, t2, s2, t3, s3, t4, s4, danger, k = carry
        outs = []
        for d, (t_sh, s_sh) in zip(
            (1, 2, 3, 4), ((t1, s1), (t2, s2), (t3, s3), (t4, s4))
        ):
            t_sh = _push(t_sh, d, 0)
            s_sh = _push(s_sh, d, 0)
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


def swar_bfs(board, ac, valid):
    """4-agent BFS -> (D, R): byte-packed distances and root ranks.

    D byte i: BFS distance from agent i (0x7E = unreachable/wall).
    R byte i: root rank (index into _RANK_TO_MOVE) of the first move from
    agent i's cell on the shortest path; only meaningful where 0 < D < 0x7E.
    Semantics == cellular_toolkit.fill_reach_map per agent (priority
    tie-breaks included: directions relax sequentially with strict <).
    """
    block = board.shape[0]
    lane = _lane_iota(block)
    walk = _is_walkable_t(board) & valid
    enterable = walk | (_is_agent(board) & valid)

    oh_src = [lane == ac[:, i : i + 1] for i in range(4)]
    src_bytes = _mkw_bytes(oh_src)

    d0 = _WALL4 & ~src_bytes  # walls everywhere, 0 at each src field
    r0 = jnp.zeros((block, LANES), I32)
    ent_h = jnp.where(enterable, _H4, 0)

    # Per-direction invariants: rank value/mask planes for src-adjacent
    # cells (their root is the move that steps off the source).
    sam = {}
    sav = {}
    for rank, mv in enumerate(_PRIORITY):
        m = _push(src_bytes, mv, 0)
        sam[mv] = m
        sav[mv] = m & (rank * _ONE4)

    def body(carry):
        d, r, _, k = carry
        # Jacobi within the round: candidates push from the ROUND-START
        # planes but compare against the accumulating d -- exactly the
        # toolkit's update rule, so root tie-breaks match bit-for-bit.
        d_in, r_in = d, r
        # Source fields expand regardless of walkability; the override is
        # a BITWISE blend -- subtracting a per-field constant here borrows
        # across fields when the src cell is walkable (a dead agent's
        # stale position: its field holds 0, 0 - 0x7E underflows into the
        # next agent's byte and propagates fake distances).
        masked = jnp.where(walk, d_in, _WALL4)
        masked = (masked & ~src_bytes) | (d_in & src_bytes)
        for mv in _PRIORITY:
            cand = _push(masked, mv, _WALL4) + _ONE4
            cand_r = _push(r_in, mv, 0)
            cand_r = (cand_r & ~sam[mv]) | sav[mv]
            ge = ((cand | _H4) - d) & _H4  # byte i set iff d_i <= cand_i
            lt = (~ge) & ent_h            # cand < d, enterable
            mm = lt | (lt - ((lt >> 7) & _ONE4))
            d = (d & ~mm) | (cand & mm)
            r = (r & ~mm) | (cand_r & mm)
        changed = jnp.any(d != d_in)
        return d, r, changed.astype(I32), k + 1

    # FSM_BFS_FIXED=N (profiling only): run exactly N rounds, no
    # convergence check -- isolates per-round cost vs round count.
    _fixed = int(_os.environ.get("FSM_BFS_FIXED", "0"))
    if _fixed:
        def cond(carry):
            return carry[3] < _fixed
    else:
        # The convergence check is the real terminator (measured ~23
        # rounds on generated boards; one round advances every frontier
        # by one cell).  The cap only exists as a compile-time bound and
        # must cover the worst possible shortest path on the board
        # (a serpentine corridor can reach ~120 cells), else far cells
        # would silently read unreachable and diverge from
        # cellular_toolkit.fill_reach_map's run-to-convergence loop.
        def cond(carry):
            return (carry[2] != 0) & (carry[3] < NUM_CELLS)

    d, r, _, _ = jax.lax.while_loop(
        cond, body, (d0, r0, jnp.ones((), I32), jnp.zeros((), I32))
    )
    return d, r


def _rank_to_move_arr(rank):
    mv = jnp.full(rank.shape, _RANK_TO_MOVE[0], I32)
    for rk in (1, 2, 3):
        mv = jnp.where(rank == rk, _RANK_TO_MOVE[rk], mv)
    return mv


def _move_towards(d_at, r_at):
    """Toolkit move_towards_cell: IDLE unless 0 < dist < unreachable."""
    ok = (d_at > 0) & (d_at < _WALLB)
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
              rp, rph, rpc, mq):
    """SimpleAgent joint act on kernel tiles.

    ``rand``: i32[block,4] in [0,5) (one draw per agent-act, like
    simple_agent_cell_joint).  ``rp``: list of 4 [block,4] ring slots
    (encoded positions), ``rph``/``rpc``: ring head/count, ``mq``: list of
    4 [block,4] persistent moveQueue slots.  Returns (moves, rp', rph',
    rpc', mq').
    """
    block = board.shape[0]
    lane = _lane_iota(block)
    lane4 = _iota4(block)
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
        d_pl = jnp.full((block, LANES), _WALL4, I32)
        r_pl = jnp.zeros((block, LANES), I32)
    else:
        d_pl, r_pl = swar_bfs(board, ac, valid)

    oh_ac = [lane == ac[:, i : i + 1] for i in range(4)]
    w_ac = _mkw_bytes(oh_ac)

    def read_bytes(plane, w):
        red = _read_w(plane, w)
        return (red >> (8 * lane4)) & _BYTE

    def read_packed(vals, cells, bits):
        """vals plane (< 2^bits) read at per-agent cells -> [block,4]."""
        w = jnp.zeros((block, LANES), I32)
        for i in range(4):
            w = w + ((lane == cells[:, i : i + 1]).astype(I32) << (bits * i))
        red = jnp.sum(vals * w, axis=1, keepdims=True)
        return (red >> (bits * lane4)) & ((1 << bits) - 1)

    # Per-agent scalars at own cell: danger (4 bits) + adjacent-wood bit.
    wood = (board == C_WOOD) & valid
    wood_adj_pl = wood
    for dd in (1, 2, 3, 4):
        wood_adj_pl = wood_adj_pl | _push(wood, dd, False)
    own = read_packed(
        jnp.clip(dmap, 0, 15) + 16 * wood_adj_pl.astype(I32), ac, 5
    )
    danger_self = own & 15
    wood_adj = (own >> 4) != 0
    in_danger = danger_self > 0

    # --- path A: flee -----------------------------------------------------
    # Safe-place candidate per agent: first window cell (row-major),
    # replicating the reference's buggy bounds (strategy.cpp:126-128).
    scand = []
    for i in range(4):
        rad = danger_self[:, i : i + 1]
        ox = acx[:, i : i + 1]
        oy = acy[:, i : i + 1]
        window = (ly >= oy - rad) & (ly < rad) & (lx >= ox - rad) & (lx < rad)
        manh = jnp.abs(lx - ox) + jnp.abs(ly - oy)
        df = (d_pl >> (8 * i)) & _BYTE
        mask = (
            window & (manh <= rad) & (df != 0) & (df < _WALLB)
            & safe1 & valid
        )
        scand.append(
            jnp.min(jnp.where(mask, lane, _NOCELL), axis=1, keepdims=True)
        )
    scell = jnp.concatenate(scand, axis=1)
    w_sc = _mkw_bytes([lane == scell[:, i : i + 1] for i in range(4)])
    sd_at = read_bytes(d_pl, w_sc)
    sr_at = read_bytes(r_pl, w_sc)
    m_safe = _move_towards(sd_at, sr_at)

    # Destination check for m_safe: walkable & safe_condition(d, 2).
    sdx, sdy = _mv_dxdy(m_safe)
    sdc = ac + sdx + BOARD_SIZE * sdy
    s_inb = (
        (acx + sdx >= 0) & (acx + sdx < BOARD_SIZE)
        & (acy + sdy >= 0) & (acy + sdy < BOARD_SIZE)
    )
    sdc_safe = jnp.where(s_inb, sdc, 127)
    dst = read_packed(
        jnp.clip(dmap, 0, 15) + 16 * walk1.astype(I32), sdc_safe, 5
    )
    a_ok = (
        in_danger & s_inb & ((dst >> 4) != 0)
        & (((dst & 15) == 0) | ((dst & 15) >= 2))
    )
    a_else = in_danger & ~a_ok

    # --- moveQueue recompute: SafeDirections + SortDirections -------------
    # Neighbor order RIGHT, LEFT, DOWN, UP (strategy.cpp:197-221).
    n_off = ((1, 0, M_RIGHT), (-1, 0, M_LEFT), (0, 1, M_DOWN), (0, -1, M_UP))
    ok_s = []
    for (dx, dy, mv) in n_off:
        nx = acx + dx
        ny = acy + dy
        inb = (nx >= 0) & (nx < BOARD_SIZE) & (ny >= 0) & (ny < BOARD_SIZE)
        ncell = jnp.where(inb, nx + BOARD_SIZE * ny, 127)
        nb = read_packed(
            safe1.astype(I32) + 2 * walk1.astype(I32), ncell, 2
        )
        ok_s.append(inb & (nb == 3))
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
        new_mq.append(jnp.where(rslot < mq_count, val, mq[rslot]))

    # Ring in logical order (loop-invariant for the sort).
    rpl = []
    for j in range(4):
        logical = (rph + j) % 4
        v = jnp.zeros((block, 4), I32)
        for k in range(4):
            v = jnp.where(logical == k, rp[k], v)
        rpl.append(v)

    # SortDirections: replicate the RemoveAt+AddElem aliasing walk
    # (strategy.hpp:130-152 via strategy/moves.py:sort_directions).
    def sort_body(carry):
        s0, s1, s2, s3, count, i, removes, _ = carry
        slots = (s0, s1, s2, s3)
        active = (i < mq_count) & (removes < 4) & (i >= 0)
        slot_val = jnp.zeros((block, 4), I32)
        for k in range(4):
            slot_val = jnp.where(i == k, slots[k], slot_val)
        mvv = jnp.clip(slot_val, 0, 5)
        dx, dy = _mv_dxdy(mvv)
        enc = _enc_pos(acx + dx, acy + dy)
        vis = jnp.zeros((block, 4), jnp.bool_)
        for j in range(4):
            vis = vis | ((j < rpc) & (rpl[j] == enc))
        do = active & vis

        shifted = []
        for k in range(4):
            nxt = slots[k + 1] if k < 3 else slots[3]
            cond_k = (k >= i) & (k < count - 1)
            shifted.append(jnp.where(cond_k, nxt, slots[k]))
        count2 = count - 1
        val = jnp.zeros((block, 4), I32)
        for k in range(4):
            val = jnp.where(i == k, shifted[k], val)
        out = []
        for k in range(4):
            app = jnp.where(jnp.clip(count2, 0, 3) == k, val, shifted[k])
            out.append(jnp.where(do, app, slots[k]))
        i2 = jnp.where(do, i - 1, i) + 1
        removes2 = removes + do
        return (out[0], out[1], out[2], out[3], count, i2, removes2,
                jnp.any(active).astype(I32))

    def sort_cond(carry):
        return (carry[7] != 0) & jnp.any(carry[5] < 8)

    z4 = jnp.zeros((block, 4), I32)
    if "fsm_sort" in _SKIP:
        s0, s1, s2, s3 = new_mq
    else:
        s0, s1, s2, s3, _, _, _, _ = jax.lax.while_loop(
            sort_cond, sort_body,
            (new_mq[0], new_mq[1], new_mq[2], new_mq[3], mq_count, z4, z4,
             jnp.ones((), I32)),
        )
    sorted_mq = [s0, s1, s2, s3]
    mq_empty = mq_count == 0
    m_queue = jnp.where(
        mq_empty, M_IDLE, jnp.where(rand % 2 == 1, s1, s0)
    ).astype(I32)

    # --- path B: aggression ----------------------------------------------
    manh_k = [None] + [
        jnp.abs(_rot4(acx, k) - acx) + jnp.abs(_rot4(acy, k) - acy)
        for k in (1, 2, 3)
    ]
    alive_k = [None] + [_rot4(alive, k) for k in (1, 2, 3)]
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

    # Enemy target: first live agent (id order) within manhattan 7 not on
    # my cell (strategy.cpp:163-186).
    ecell = jnp.full((block, 4), _NOCELL, I32)
    chosen = jnp.zeros((block, 4), jnp.bool_)
    for jv in range(4):
        for k in (1, 2, 3):
            is_j = ((lane4 + k) & 3) == jv
            okk = (
                is_j & alive_k[k] & (manh_k[k] <= 7) & (manh_k[k] > 0)
                & ~chosen
            )
            ecell = jnp.where(okk, _rot4(ac, k), ecell)
            chosen = chosen | okk
    w_ec = _mkw_bytes([lane == ecell[:, i : i + 1] for i in range(4)])
    ed_at = read_bytes(d_pl, w_ec)
    er_at = read_bytes(r_pl, w_ec)
    m_enemy = _move_towards(ed_at, er_at)
    edx, edy = _mv_dxdy(m_enemy)
    e_inb = (
        (acx + edx >= 0) & (acx + edx < BOARD_SIZE)
        & (acy + edy >= 0) & (acy + edy < BOARD_SIZE)
    )
    edc = jnp.where(e_inb, ac + edx + BOARD_SIZE * edy, 127)
    edst = read_packed(
        jnp.clip(dmap, 0, 15) + 16 * walk1.astype(I32), edc, 5
    )
    b3_ok = (
        e_inb & ((edst >> 4) != 0)
        & (((edst & 15) == 0) | ((edst & 15) >= 5))
    )

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

    # moveQueue persists only when the queue path actually ran.
    mq_written = a_else | c_path
    mq_out = [
        jnp.where(mq_written, sorted_mq[k], mq[k]) for k in range(4)
    ]

    # recentPositions ring update with the final move's desired position
    # (_mv_dxdy gives (0,0) for IDLE and BOMB, like DesiredPosition).
    fdx, fdy = _mv_dxdy(move)
    enc_new = _enc_pos(acx + fdx, acy + fdy)
    full = rpc == 4
    head2 = jnp.where(full, (rph + 1) % 4, rph)
    cnt2 = jnp.where(full, rpc - 1, rpc)
    slot = (head2 + cnt2) % 4
    rp_out = [
        jnp.where(slot == k, enc_new, rp[k]) for k in range(4)
    ]
    return move, rp_out, head2, cnt2 + 1, mq_out
