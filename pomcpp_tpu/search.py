"""Rollout-based lookahead search over the batched engine.

The reference exists "so tree search / RL becomes computationally feasible"
(pomcpp README.md:4) but ships no search itself.  This module supplies the
missing capability the TPU-native way: candidate moves are evaluated by
MANY parallel random playouts batched through the engine -- one jitted
call evaluates every (board, candidate, playout) combination at once, so a
6-way lookahead over thousands of boards rides the same throughput path as
the benchmarks (the fused chunk kernel on TPU, the cellular engine on CPU).

``lookahead_moves`` is a drop-in policy: argmax over candidate moves of
mean playout return (survival + win bonus) for the acting agent.
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
