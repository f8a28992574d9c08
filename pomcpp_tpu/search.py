"""Rollout-based lookahead and MCTS over the batched engine.

The reference exists "so tree search / RL becomes computationally feasible"
(pomcpp README.md:4) but ships no search itself.  This module supplies the
missing capability the TPU-native way: candidate moves are evaluated by
MANY parallel random playouts batched through the engine -- one jitted
call evaluates every (board, candidate, playout) combination at once, so a
6-way lookahead over thousands of boards rides the same throughput path as
the benchmarks (the fused chunk kernel on TPU, the cellular engine on CPU).

Two planners:

- ``lookahead_moves``: 1-ply expansion + flat Monte-Carlo playouts;
  argmax over candidate moves of mean playout return.
- ``mcts_moves``: full UCT tree search, vectorized the mctx way -- the
  tree is a set of fixed-size arrays (visit counts / value sums / child
  indices), every simulation is one scan iteration, and the whole search
  for every board in the batch is a single jitted program.  The tree is
  *open-loop* (a node stores no game state): each simulation re-steps the
  live state from the root along the selected action path with freshly
  sampled opponent moves, which is the textbook treatment of stochastic
  opponents (no determinization bias) and keeps tree memory at
  O(nodes * 6) scalars instead of O(nodes * board).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .core.constants import AGENT_COUNT
from .core.state import I32
from .engine.cellular import CellState, cellular_step


def _random_moves(key, n, batch_shape):
    return jax.random.randint(key, batch_shape + (AGENT_COUNT,), 0, 6, I32)


def playout_value(cs: CellState, agent_id, key, depth: int = 12):
    """Survival/win value of one random playout from ``cs`` (single board).

    Returns 1.0 + win_bonus if the agent outlives the playout (2.0 if it
    wins outright), else the fraction of the horizon it survived.
    """

    def body(carry, k):
        cs, death_t, t = carry
        moves = jnp.where(
            cs.agent_dead, 0, jax.random.randint(k, (4,), 0, 6, I32)
        )
        cs = cellular_step(cs, moves)
        died_now = cs.agent_dead[agent_id] & (death_t < 0)
        death_t = jnp.where(died_now, t, death_t)
        return (cs, death_t, t + 1), None

    keys = jax.random.split(key, depth)
    (cs, death_t, _), _ = jax.lax.scan(
        body, (cs, jnp.full((), -1, I32), jnp.zeros((), I32)), keys
    )
    alive = ~cs.agent_dead[agent_id]
    won = alive & (cs.alive_count == 1)
    return jnp.where(
        alive,
        1.0 + won.astype(jnp.float32),
        death_t.astype(jnp.float32) / depth,
    )


@functools.partial(jax.jit, static_argnames=("depth", "n_playouts"))
def lookahead_moves(cs_batch: CellState, agent_id, key,
                    depth: int = 12, n_playouts: int = 8):
    """Best move per board by 1-ply expansion + random playouts.

    For each board and each of the 6 candidate moves: apply the candidate
    (other agents random), then run ``n_playouts`` random playouts of
    ``depth`` steps and average the acting agent's value.  Returns i32[B]
    moves.  Everything is one vmapped computation -- B x 6 x n_playouts
    playouts evaluated in a single device program.
    """
    b = cs_batch.board.shape[0]
    k_other, k_play = jax.random.split(key)

    def eval_candidate(cs, mv, k):
        ko, kp = jax.random.split(k)
        others = jax.random.randint(ko, (4,), 0, 6, I32)
        moves = jnp.where(jnp.arange(4) == agent_id, mv, others)
        moves = jnp.where(cs.agent_dead, 0, moves)
        cs1 = cellular_step(cs, moves)
        vals = jax.vmap(
            lambda kk: playout_value(cs1, agent_id, kk, depth)
        )(jax.random.split(kp, n_playouts))
        return vals.mean()

    def per_board(cs, k):
        ks = jax.random.split(k, 6)
        vals = jax.vmap(
            lambda mv, kk: eval_candidate(cs, mv, kk)
        )(jnp.arange(6, dtype=I32), ks)
        return jnp.argmax(vals).astype(I32), vals

    keys = jax.random.split(k_play, b)
    moves, vals = jax.vmap(per_board)(cs_batch, keys)
    return moves, vals


@functools.partial(
    jax.jit, static_argnames=("n_sim", "depth", "max_tree_depth")
)
def mcts_moves(cs_batch: CellState, agent_id, key, n_sim: int = 24,
               depth: int = 12, max_tree_depth: int = 8,
               c_uct: float = 1.25):
    """UCT move per board; one jitted program searches the whole batch.

    Per simulation: walk the tree from the root by UCB1 (unvisited edges
    first, in action order), stepping the live state along the way (our
    move = tree edge, opponents = fresh random draws), until an
    unexpanded edge or ``max_tree_depth``; allocate one node; score the
    leaf with a ``depth``-step random playout (``playout_value``); add
    the value to every edge on the path.  Final move = root visit-count
    argmax (robust child).  Returns ``(moves i32[B], root_visits
    i32[B,6], root_q f32[B,6])``.
    """
    b = cs_batch.board.shape[0]
    max_nodes = n_sim + 1  # <=1 expansion per simulation, node 0 = root

    def per_board(root: CellState, k):
        n_vis = jnp.zeros((max_nodes, 6), I32)
        w_sum = jnp.zeros((max_nodes, 6), jnp.float32)
        child = jnp.full((max_nodes, 6), -1, I32)

        def simulate(carry, k):
            n_vis, w_sum, child, n_used = carry
            k_opp, k_play = jax.random.split(k)
            opp_keys = jax.random.split(k_opp, max_tree_depth)

            def sel_step(c, inp):
                d, ko = inp
                cs, node, stopped, en, ea, path_n, path_a = c
                nv = n_vis[node].astype(jnp.float32)
                q = w_sum[node] / jnp.maximum(nv, 1.0)
                u = c_uct * jnp.sqrt(
                    jnp.log(nv.sum() + 1.0) / jnp.maximum(nv, 1.0)
                )
                # Unvisited edges outrank everything, tried in move order.
                score = jnp.where(
                    nv == 0.0,
                    1e9 - jnp.arange(6, dtype=jnp.float32),
                    q + u,
                )
                a = jnp.argmax(score).astype(I32)
                path_n = path_n.at[d].set(jnp.where(stopped, -1, node))
                path_a = path_a.at[d].set(a)
                # Step the live state along the edge (opponents random).
                others = jax.random.randint(ko, (4,), 0, 6, I32)
                moves = jnp.where(jnp.arange(4) == agent_id, a, others)
                moves = jnp.where(cs.agent_dead, 0, moves)
                cs1 = cellular_step(cs, moves)
                cs = jax.tree.map(
                    lambda old, new: jnp.where(stopped, old, new), cs, cs1
                )
                nxt = child[node, a]
                stop_now = (~stopped) & (nxt < 0)
                en = jnp.where(stop_now, node, en)
                ea = jnp.where(stop_now, a, ea)
                node = jnp.where(stopped | stop_now, node, nxt)
                stopped = stopped | stop_now
                return (cs, node, stopped, en, ea, path_n, path_a), None

            init = (
                root, jnp.zeros((), I32), jnp.zeros((), bool),
                jnp.full((), -1, I32), jnp.zeros((), I32),
                jnp.zeros((max_tree_depth,), I32),
                jnp.zeros((max_tree_depth,), I32),
            )
            (leaf, _, expanding, en, ea, path_n, path_a), _ = jax.lax.scan(
                sel_step, init,
                (jnp.arange(max_tree_depth, dtype=I32), opp_keys),
            )

            # Expansion: bind the fresh edge (en, ea) to a new node index.
            new_idx = n_used
            child = child.at[en, ea].set(
                jnp.where(expanding, new_idx, child[en, ea])
            )
            n_used = n_used + expanding.astype(I32)

            value = playout_value(leaf, agent_id, k_play, depth)

            # Backprop along the recorded path (slot -1 = unused).
            def backp(c, pe):
                n_vis, w_sum = c
                pn, pa = pe
                valid = pn >= 0
                pn = jnp.maximum(pn, 0)
                n_vis = n_vis.at[pn, pa].add(valid.astype(I32))
                w_sum = w_sum.at[pn, pa].add(
                    jnp.where(valid, value, 0.0)
                )
                return (n_vis, w_sum), None

            (n_vis, w_sum), _ = jax.lax.scan(
                backp, (n_vis, w_sum), (path_n, path_a)
            )
            return (n_vis, w_sum, child, n_used), None

        (n_vis, w_sum, _, _), _ = jax.lax.scan(
            simulate,
            (n_vis, w_sum, child, jnp.ones((), I32)),
            jax.random.split(k, n_sim),
        )
        root_q = w_sum[0] / jnp.maximum(n_vis[0].astype(jnp.float32), 1.0)
        mv = jnp.argmax(n_vis[0]).astype(I32)
        mv = jnp.where(root.agent_dead[agent_id], 0, mv)
        return mv, n_vis[0], root_q

    keys = jax.random.split(key, b)
    return jax.vmap(per_board)(cs_batch, keys)
