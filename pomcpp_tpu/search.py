"""Rollout-based lookahead and MCTS over the batched engine.

The reference exists "so tree search / RL becomes computationally feasible"
(pomcpp README.md:4) but ships no search itself.  This module supplies the
missing capability the TPU-native way: candidate moves are evaluated by
MANY parallel random playouts batched through the engine -- one jitted
call evaluates every (board, candidate, playout) combination at once.

Three planners:

- ``lookahead_moves``: 1-ply expansion + flat Monte-Carlo playouts over
  the cellular engine; argmax over candidate moves of mean playout
  return.
- ``mcts_moves``: full UCT tree search, vectorized the mctx way -- the
  tree is a set of fixed-size arrays (visit counts / value sums / child
  indices), every simulation is one scan iteration, and the whole search
  for every board in the batch is a single jitted program.  The tree is
  *open-loop* (a node stores no game state): each simulation re-steps the
  live state from the root along the selected action path with freshly
  sampled opponent moves, which is the textbook treatment of stochastic
  opponents (no determinization bias) and keeps tree memory at
  O(nodes * 6) scalars instead of O(nodes * board).
- ``mcts_moves_pallas``: the same search restructured batch-level so the
  engine work runs through the fused Pallas chunk kernel (the benchmark
  throughput path) and the tree ops are gather-free one-hot
  contractions.
- ``mcts_moves_net``: PUCT guided by the trained actor-critic (priors +
  value-head leaf evaluation; AlphaZero-style) — the search half of the
  distill.py <-> search self-improvement loop.
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

    keys = jax.random.split(key, b)
    moves, vals = jax.vmap(per_board)(cs_batch, keys)
    return moves, vals


def _tree_search(root: CellState, k, agent_id, n_sim: int,
                 max_tree_depth: int, score_fn, leaf_fn, root_prior):
    """Open-loop array-tree search for ONE board (vmapped by the callers).

    The machinery shared by ``mcts_moves`` (UCB1 + random playouts) and
    ``mcts_moves_net`` (PUCT + value-head leaves): the tree is fixed-size
    stat arrays (visits / value sums / child indices / priors), each
    simulation is one scan iteration whose selection walk re-steps the
    live state from the root along the chosen action path (opponents
    random), one node is expanded per simulation, and the playout/net
    value is backed up the recorded path.

    - ``score_fn(nv, q, prior_row) -> f32[6]`` ranks a node's edges for
      selection (nv = per-edge visit counts, q = mean values).
    - ``leaf_fn(leaf_state, k_play) -> (prior_row f32[6], value f32)``
      evaluates the reached leaf and supplies the expanded node's priors
      (zeros for prior-free searches).
    - ``root_prior`` seeds node 0's prior row.

    Returns ``(move, root_visits i32[6], root_q f32[6])``; the final move
    is the root visit-count argmax (robust child), IDLE if dead.
    """
    max_nodes = n_sim + 1  # <=1 expansion per simulation, node 0 = root

    n_vis0 = jnp.zeros((max_nodes, 6), I32)
    w_sum0 = jnp.zeros((max_nodes, 6), jnp.float32)
    child0 = jnp.full((max_nodes, 6), -1, I32)
    prior0 = jnp.zeros((max_nodes, 6), jnp.float32).at[0].set(root_prior)

    def simulate(carry, k):
        n_vis, w_sum, child, prior, n_used = carry
        k_opp, k_play = jax.random.split(k)
        opp_keys = jax.random.split(k_opp, max_tree_depth)

        def sel_step(c, inp):
            d, ko = inp
            cs, node, stopped, en, ea, path_n, path_a = c
            nv = n_vis[node].astype(jnp.float32)
            q = w_sum[node] / jnp.maximum(nv, 1.0)
            a = jnp.argmax(score_fn(nv, q, prior[node])).astype(I32)
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
        leaf_prior, value = leaf_fn(leaf, k_play)
        prior = prior.at[new_idx].set(
            jnp.where(expanding, leaf_prior, prior[new_idx])
        )
        n_used = n_used + expanding.astype(I32)

        # Backprop along the recorded path (slot -1 = unused).
        def backp(c, pe):
            n_vis, w_sum = c
            pn, pa = pe
            valid = pn >= 0
            pn = jnp.maximum(pn, 0)
            n_vis = n_vis.at[pn, pa].add(valid.astype(I32))
            w_sum = w_sum.at[pn, pa].add(jnp.where(valid, value, 0.0))
            return (n_vis, w_sum), None

        (n_vis, w_sum), _ = jax.lax.scan(
            backp, (n_vis, w_sum), (path_n, path_a)
        )
        return (n_vis, w_sum, child, prior, n_used), None

    (n_vis, w_sum, _, _, _), _ = jax.lax.scan(
        simulate,
        (n_vis0, w_sum0, child0, prior0, jnp.ones((), I32)),
        jax.random.split(k, n_sim),
    )
    root_q = w_sum[0] / jnp.maximum(n_vis[0].astype(jnp.float32), 1.0)
    mv = jnp.argmax(n_vis[0]).astype(I32)
    mv = jnp.where(root.agent_dead[agent_id], 0, mv)
    return mv, n_vis[0], root_q


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

    def score_ucb1(nv, q, _prior):
        u = c_uct * jnp.sqrt(
            jnp.log(nv.sum() + 1.0) / jnp.maximum(nv, 1.0)
        )
        # Unvisited edges outrank everything, tried in move order.
        return jnp.where(
            nv == 0.0, 1e9 - jnp.arange(6, dtype=jnp.float32), q + u
        )

    def leaf_playout(leaf, k_play):
        return (jnp.zeros((6,), jnp.float32),
                playout_value(leaf, agent_id, k_play, depth))

    zeros6 = jnp.zeros((6,), jnp.float32)
    keys = jax.random.split(key, b)
    return jax.vmap(
        lambda root, kk: _tree_search(
            root, kk, agent_id, n_sim, max_tree_depth,
            score_ucb1, leaf_playout, zeros6,
        )
    )(cs_batch, keys)


def mcts_moves_net(cs_batch: CellState, agent_id, key, apply_fn, params,
                   n_sim: int = 32, max_tree_depth: int = 8,
                   c_puct: float = 1.5, view_range: int | None = None):
    """AlphaZero-style PUCT search guided by the actor-critic net.

    Same open-loop array tree as ``mcts_moves`` (shared ``_tree_search``
    machinery), but the net replaces both random components: expanded
    nodes store the policy head's move priors (selection score
    Q + c_puct * P * sqrt(sum N)/(1 + n), the PUCT rule), and leaf
    evaluation is the value head instead of a random playout -- except
    terminal leaves, which score exactly (+1 win / -1 dead).  The
    classic search/learning composition: distill.py teaches the net from
    search visits, the net then sharpens the search.

    ``apply_fn`` is the actor-critic apply (e.g. ``ppo._MODEL.apply``;
    passed in so search stays import-independent of the learner); it maps
    ``(params, feats[H,W,C]) -> (logits[6], value)``.  Not jitted here --
    wrap the call site (apply_fn is not a valid static jit argument).
    ``view_range`` must match the checkpoint's training view (None = the
    default radius); a mismatched radius fails at Dense apply time.
    Returns ``(moves i32[B], root_visits i32[B,6], root_q f32[B,6])``.
    """
    from .env.observation import DEFAULT_VIEW_RANGE, observe_ego
    from .models.actor_critic import obs_to_features

    if view_range is None:
        view_range = DEFAULT_VIEW_RANGE
    b = cs_batch.board.shape[0]

    def net_eval(cs):
        logits, value = apply_fn(params, obs_to_features(
            observe_ego(cs, agent_id, view_range=view_range), view_range
        ))
        # Terminal states score exactly; the net only guesses the rest.
        dead = cs.agent_dead[agent_id]
        won = ~dead & (cs.alive_count == 1)
        value = jnp.where(dead, -1.0, jnp.where(won, 1.0, value))
        return jax.nn.softmax(logits), value

    def score_puct(nv, q, prior_row):
        return q + c_puct * prior_row * (
            jnp.sqrt(nv.sum() + 1.0) / (1.0 + nv)
        )

    def leaf_net(leaf, _k_play):
        return net_eval(leaf)

    keys = jax.random.split(key, b)
    return jax.vmap(
        lambda root, kk: _tree_search(
            root, kk, agent_id, n_sim, max_tree_depth,
            score_puct, leaf_net, net_eval(root)[0],
        )
    )(cs_batch, keys)


@functools.partial(
    jax.jit,
    static_argnames=("n_sim", "depth", "max_tree_depth", "interpret"),
)
def mcts_moves_pallas(cs_batch: CellState, agent_id, key, n_sim: int = 24,
                      depth: int = 12, max_tree_depth: int = 8,
                      c_uct: float = 1.25, interpret: bool = False):
    """``mcts_moves`` restructured to ride the fused Pallas chunk kernel.

    Same UCT tree policy, but organized batch-level so every engine step
    is one kernel launch over the whole batch: the selection walk steps
    all B boards together (one injected-move launch per tree depth), and
    the playout is a single ``depth``-step chunk launch with host-drawn
    random moves injected (dead agents' moves are inert inside the
    kernel, proven by the record/replay equivalence suite).  All tree
    reads/writes are one-hot contractions over the [B, nodes, 6] stat
    arrays -- no gathers/scatters anywhere (TPU serializes those).

    Divergence from ``mcts_moves``: playout value is binary survival
    (+win bonus) rather than fractional survival time -- the chunk kernel
    reports final state, not per-step death times.  Returns the same
    ``(moves, root_visits, root_q)`` triple.
    """
    from .engine.pallas_step import pallas_rollout_chunk

    b = cs_batch.board.shape[0]
    max_nodes = n_sim + 1
    a6f = jnp.arange(6, dtype=jnp.float32)

    def oh(idx, n, dt):  # [B] -> [B, n] one-hot
        return (idx[:, None] == jnp.arange(n)).astype(dt)

    def keep_old(keep, old, new):  # per-board select, any leaf rank
        k = keep.reshape((b,) + (1,) * (old.ndim - 1))
        return jnp.where(k, old, new)

    def step_all(cs, moves):  # one fused engine step for the whole batch
        return pallas_rollout_chunk(
            cs, 0, steps=1, moves=moves[None], auto_reset=False,
            interpret=interpret,
        )

    def simulate(carry, k):
        n_vis, w_sum, child, n_used = carry
        k_sel, k_play = jax.random.split(k)

        def sel_step(c, inp):
            ko = inp
            cs, node, stopped, en, ea = c
            ohf = oh(node, max_nodes, jnp.float32)          # [B, N]
            ohi = oh(node, max_nodes, I32)
            nv = jnp.einsum("bn,bnk->bk", ohf, n_vis)       # [B, 6]
            ws = jnp.einsum("bn,bnk->bk", ohf, w_sum)
            ch = jnp.sum(ohi[:, :, None] * child, axis=1)   # [B, 6]
            q = ws / jnp.maximum(nv, 1.0)
            u = c_uct * jnp.sqrt(
                jnp.log(nv.sum(1, keepdims=True) + 1.0)
                / jnp.maximum(nv, 1.0)
            )
            score = jnp.where(nv == 0.0, 1e9 - a6f, q + u)
            a = jnp.argmax(score, axis=1).astype(I32)       # [B]
            rec_n = jnp.where(stopped, -1, node)
            others = jax.random.randint(ko, (b, 4), 0, 6, I32)
            moves = jnp.where(
                jnp.arange(4)[None, :] == agent_id, a[:, None], others
            )
            cs1 = step_all(cs, moves)
            cs = jax.tree.map(
                lambda o, n: keep_old(stopped, o, n), cs, cs1
            )
            nxt = jnp.sum(oh(a, 6, I32) * ch, axis=1)       # [B]
            stop_now = (~stopped) & (nxt < 0)
            en = jnp.where(stop_now, node, en)
            ea = jnp.where(stop_now, a, ea)
            node = jnp.where(stopped | stop_now, node, nxt)
            stopped = stopped | stop_now
            return (cs, node, stopped, en, ea), (rec_n, a)

        init = (
            cs_batch, jnp.zeros((b,), I32), jnp.zeros((b,), bool),
            jnp.full((b,), -1, I32), jnp.zeros((b,), I32),
        )
        (leaf, _, expanding, en, ea), (path_n, path_a) = jax.lax.scan(
            sel_step, init, jax.random.split(k_sel, max_tree_depth)
        )

        # Expansion: bind edge (en, ea) to node index n_used where a fresh
        # edge was reached (one-hot masked write, no scatter).
        m_edge = (
            oh(jnp.maximum(en, 0), max_nodes, I32)[:, :, None]
            * oh(ea, 6, I32)[:, None, :]
        ) * expanding[:, None, None].astype(I32)
        child = jnp.where(
            m_edge > 0,
            jnp.broadcast_to(n_used[:, None, None], child.shape),
            child,
        )
        n_used = n_used + expanding.astype(I32)

        # Playout: one chunk launch, host-drawn moves injected.
        pmoves = jax.random.randint(k_play, (depth, b, 4), 0, 6, I32)
        fin = pallas_rollout_chunk(
            leaf, 0, steps=depth, moves=pmoves, auto_reset=False,
            interpret=interpret,
        )
        dead = jnp.sum(
            fin.agent_dead.astype(I32)
            * (jnp.arange(4)[None, :] == agent_id), axis=1,
        ) > 0
        alive = ~dead
        value = alive.astype(jnp.float32) + (
            alive & (fin.alive_count == 1)
        ).astype(jnp.float32)

        def backp(c, pe):
            n_vis, w_sum = c
            pn, pa = pe
            m = (
                oh(jnp.maximum(pn, 0), max_nodes, jnp.float32)[:, :, None]
                * oh(pa, 6, jnp.float32)[:, None, :]
            ) * (pn >= 0).astype(jnp.float32)[:, None, None]
            return (n_vis + m, w_sum + m * value[:, None, None]), None

        (n_vis, w_sum), _ = jax.lax.scan(
            backp, (n_vis, w_sum), (path_n, path_a)
        )
        return (n_vis, w_sum, child, n_used), None

    (n_vis, w_sum, _, _), _ = jax.lax.scan(
        simulate,
        (
            jnp.zeros((b, max_nodes, 6), jnp.float32),
            jnp.zeros((b, max_nodes, 6), jnp.float32),
            jnp.full((b, max_nodes, 6), -1, I32),
            jnp.ones((b,), I32),
        ),
        jax.random.split(key, n_sim),
    )
    root_v = n_vis[:, 0]
    root_q = w_sum[:, 0] / jnp.maximum(root_v, 1.0)
    mv = jnp.argmax(root_v, axis=1).astype(I32)
    dead_root = jnp.sum(
        cs_batch.agent_dead.astype(I32)
        * (jnp.arange(4)[None, :] == agent_id), axis=1,
    ) > 0
    mv = jnp.where(dead_root, 0, mv)
    return mv, root_v.astype(I32), root_q
