#!/usr/bin/env python
"""BFS round histogram for the in-kernel FSM (VERDICT r2 item 2 evidence).

The SWAR BFS while_loop (engine/pallas_fsm.py:swar_bfs) runs until NO cell
in the whole [block, 128] tile changes.  This script measures, over real
SimpleAgent self-play states:

1. rounds-to-convergence per BOARD (max over its 4 agents' BFS
   eccentricity, +1 no-change round) and per BLOCK (the kernel's actual
   terminator is the max over all boards in the tile);
2. the ORACLE early-exit round: the earliest round after which every
   BFS cell the FSM actually consumes this step is final.  A consumed
   cell is final when its distance is set; a consumed cell that is
   UNREACHABLE is only certifiably final at full convergence (BFS can
   still reach it later from any live frontier), so boards with
   unreachable consumed cells pin the early exit to convergence.

Consumed cells per agent (fsm_block):
  - in danger: every cell of the safe-place window scan up to the first
    qualifying candidate (reachability filters the row-major argmin);
  - bomb available, enemy within manhattan 7, no closer trigger: the
    enemy's cell (reachability + root rank);
  - nothing else reads the BFS.

Output: histograms + the implied ceiling speedup of an exact early exit.
"""

from __future__ import annotations

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from pomcpp_tpu.agents.simple_cellular import (
    simple_agent_cell_joint,
    simple_agent_init_batch,
)
from pomcpp_tpu.core.board_gen import random_cell_state
from pomcpp_tpu.core.constants import (
    BOARD_SIZE,
    C_EXTRABOMB,
    C_KICK,
    C_PASSAGE,
    NUM_CELLS,
)
from pomcpp_tpu.engine.cellular import cellular_step
from pomcpp_tpu.strategy.cellular_toolkit import danger_map_cell

N = BOARD_SIZE


def bfs_rounds(board, ax, ay, dead):
    """Synchronous-relaxation BFS per agent -> (rounds_to_converge,
    dist[4,121]).  rounds = #body iterations the kernel loop runs
    (eccentricity + 1 final no-change round)."""
    walk = (board == C_PASSAGE) | (
        (board >= C_EXTRABOMB) & (board <= C_KICK)
    )
    agent_cell = board >= 10
    enterable = walk | agent_cell
    INF = 10**6
    dist = np.full((4, NUM_CELLS), INF, np.int64)
    for i in range(4):
        dist[i, ax[i] + N * ay[i]] = 0
    rounds = 0
    while True:
        rounds += 1
        changed = False
        for i in range(4):
            d = dist[i]
            src = ax[i] + N * ay[i]
            # push from walkable cells (and the source) into enterable ones
            for off, ok in (
                (N, np.arange(NUM_CELLS) // N < N - 1),
                (-N, np.arange(NUM_CELLS) // N > 0),
                (1, np.arange(NUM_CELLS) % N < N - 1),
                (-1, np.arange(NUM_CELLS) % N > 0),
            ):
                src_ok = (walk | (np.arange(NUM_CELLS) == src)) & ok
                cand = np.full(NUM_CELLS, INF, np.int64)
                idx = np.nonzero(src_ok)[0]
                cand[idx + off] = d[idx] + 1
                upd = (cand < d) & enterable
                if upd.any():
                    d[upd] = cand[upd]
                    changed = True
        if not changed:
            break
    return rounds, dist


def consumed_requirement(board, ax, ay, dead, dmap, bomb_avail, conv_rounds,
                         dist):
    """Earliest exact-exit round for this board's step (see module doc)."""
    lane = np.arange(NUM_CELLS)
    lx, ly = lane % N, lane // N
    walk = (board == C_PASSAGE) | (
        (board >= C_EXTRABOMB) & (board <= C_KICK)
    )
    safe1 = (dmap == 0) | (dmap >= 2)
    need = 0
    for i in range(4):
        if dead[i]:
            continue
        cx, cy = ax[i], ay[i]
        danger = min(int(dmap[cx + N * cy]), 15)
        if danger > 0:
            rad = danger
            window = (
                (ly >= cy - rad) & (ly < rad) & (lx >= cx - rad) & (lx < rad)
                & (np.abs(lx - cx) + np.abs(ly - cy) <= rad) & safe1
            )
            cells = np.nonzero(window)[0]
            # row-major first reachable cell; everything up to it consumed
            for c in cells:
                d = dist[i, c]
                if d >= 10**6:
                    need = conv_rounds  # unreachable consumed cell
                else:
                    need = max(need, int(d))
                if 0 < d < 10**6:
                    break
            continue
        if not bomb_avail[i]:
            continue
        manh = [
            abs(ax[j] - cx) + abs(ay[j] - cy)
            for j in range(4) if j != i and not dead[j]
        ]
        if manh and min(manh) <= 1:
            continue  # b1: bomb, no BFS read
        if manh and min(manh) <= 7:
            # b2 (rp loop) might preempt, but conservatively assume the
            # enemy cell is read (b3's move_towards consumes it).
            for j in range(4):
                if j == i or dead[j]:
                    continue
                if abs(ax[j] - cx) + abs(ay[j] - cy) <= 7:
                    d = dist[i, ax[j] + N * ay[j]]
                    need = (
                        conv_rounds if d >= 10**6 else max(need, int(d))
                    )
                    break
    return max(need, 1)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--boards", type=int, default=128)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--sample-every", type=int, default=10)
    args = p.parse_args()

    b = args.boards
    cs = jax.jit(jax.vmap(random_cell_state))(
        jax.random.split(jax.random.PRNGKey(0), b)
    )
    asts = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (b,) + x.shape),
        simple_agent_init_batch(),
    )

    joint = jax.jit(jax.vmap(simple_agent_cell_joint))
    stepf = jax.jit(jax.vmap(cellular_step))
    dmapf = jax.jit(jax.vmap(danger_map_cell))

    conv_all, need_all = [], []
    key = jax.random.PRNGKey(1)
    for t in range(args.steps):
        if t % args.sample_every == 0:
            board = np.asarray(cs.board)
            axs = np.asarray(cs.agent_x)
            ays = np.asarray(cs.agent_y)
            dead = np.asarray(cs.agent_dead)
            dm = np.asarray(dmapf(cs))
            avail = np.asarray(cs.agent_bomb_count < cs.agent_max_bombs)
            for g in range(b):
                conv, dist = bfs_rounds(board[g], axs[g], ays[g], dead[g])
                need = consumed_requirement(
                    board[g], axs[g], ays[g], dead[g], dm[g], avail[g],
                    conv, dist,
                )
                conv_all.append(conv)
                need_all.append(need)
        key, k = jax.random.split(key)
        moves, asts = joint(jax.random.split(k, b), cs, asts)
        moves = jnp.where(cs.agent_dead, 0, moves).astype(jnp.int32)
        cs = stepf(cs, moves)

    conv = np.asarray(conv_all)
    need = np.asarray(need_all)
    print(f"samples: {len(conv)} board-steps")
    print("rounds-to-convergence per board: "
          f"mean {conv.mean():.1f} p50 {np.percentile(conv, 50):.0f} "
          f"p95 {np.percentile(conv, 95):.0f} max {conv.max()}")
    print("histogram:", dict(sorted(collections.Counter(conv).items())))
    print("oracle early-exit rounds per board: "
          f"mean {need.mean():.1f} p50 {np.percentile(need, 50):.0f} "
          f"p95 {np.percentile(need, 95):.0f} max {need.max()}")
    frac_pinned = float((need == conv).mean())
    print(f"boards pinned to convergence by an unreachable consumed cell: "
          f"{100 * frac_pinned:.1f}%")
    # Kernel terminator = max over the block; simulate block sizes.
    for blk in (32, 128):
        k = len(conv) // blk * blk
        c = conv[:k].reshape(-1, blk).max(axis=1)
        n = np.maximum.reduceat(
            np.maximum(need, 1)[:k].reshape(-1, blk), [0], axis=1
        )
        n = need[:k].reshape(-1, blk).max(axis=1)
        print(f"block={blk}: convergence mean {c.mean():.1f}, "
              f"oracle-early-exit mean {n.mean():.1f} "
              f"(ceiling BFS speedup {c.mean() / n.mean():.2f}x)")


if __name__ == "__main__":
    main()
