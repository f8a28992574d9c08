"""Batched evaluation arena: play line-ups of policies, keep Elo ratings.

The reference's only evaluation is watching rendered games
(live_testing.cpp); this module is the framework's measurement story:
``play_games`` runs a 4-slot line-up over a batch of boards fully jitted
(mixed scripted/learned agents), and ``League`` maintains Elo ratings over
a roster by sampling line-ups and scoring pairwise outcomes.

Used by scripts/evaluate.py (one line-up) and scripts/league.py
(round-robin Elo tournament).
"""

from __future__ import annotations

import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .agents import harmless_agent, lazy_agent, random_agent
from .agents.simple_cellular import (
    simple_agent_cell_policy,
    simple_agent_init_batch,
)
from .core.state import I32
from .env import env_reset
from .env.environment import env_step

_STATELESS = {
    "random": random_agent,
    "harmless": harmless_agent,
    "lazy": lazy_agent,
}


class GameResults(NamedTuple):
    done: np.ndarray     # bool[G]
    winners: np.ndarray  # i32[G] agent id (or team id in team mode), -1 none
    draws: np.ndarray    # bool[G]
    steps: int


def play_games(names, games: int, steps: int, ppo_params=None,
               seed: int = 0, team: bool = False,
               search_kwargs=None, check_every: int = 32,
               view_range: int = 4) -> GameResults:
    """Play ``games`` batched games with the 4-slot line-up ``names``.

    ``names[i]`` is one of random/harmless/lazy/simple/ppo/mcts/lookahead
    (``ppo`` uses ``ppo_params``; the planners take ``search_kwargs``,
    e.g. ``{"n_sim": 24, "depth": 12}`` for mcts).  Jit-compiled per
    distinct line-up.

    Multi-net line-ups (league over generations): pass ``ppo_params`` as a
    DICT and use roster names of the form ``ppo:<key>`` / ``azmcts:<key>``;
    each slot then loads ``ppo_params[name]`` -- e.g.
    ``["ppo:gen2", "ppo:gen1", "simple", "simple"]`` with
    ``{"ppo:gen2": p2, "ppo:gen1": p1}``.

    The all-done early exit is only polled every ``check_every`` steps:
    a host fetch is the one real barrier on the remote-TPU path, and
    polling per step serializes the loop on tunnel latency.  Terminal
    states are latched by ``env_step``, so overshooting costs nothing
    but (cheap) frozen steps.
    """
    assert len(names) == 4

    def net_params(name):
        """Slot params: ``ppo_params[name]`` for a dict roster, else the
        single shared pytree.  A flax params pytree is itself a dict, so
        roster mode is detected by ROSTER-SHAPED KEYS (containing ':',
        which flax's ``params`` key never does); in roster mode an
        unknown net slot name is a hard KeyError rather than a fall-
        through to the whole dict (which would surface as a cryptic flax
        apply shape error, ADVICE r4)."""
        if isinstance(ppo_params, dict):
            if name in ppo_params:
                return ppo_params[name]
            if any(":" in k for k in ppo_params):
                raise KeyError(
                    f"net slot {name!r} not in roster params "
                    f"{sorted(ppo_params)}"
                )
        return ppo_params

    def act_one(key, game, aid, pstate, name):
        kind = name.split(":", 1)[0]
        if name == "simple":
            return simple_agent_cell_policy(key, game, aid, pstate)
        if kind in ("mcts", "lookahead", "azmcts"):
            from .search import lookahead_moves, mcts_moves, mcts_moves_net

            gb = jax.tree.map(lambda x: x[None], game)
            if kind == "azmcts":
                from .learner.ppo import _MODEL

                mv, _, _ = mcts_moves_net(
                    gb, aid, key, _MODEL.apply, net_params(name),
                    view_range=view_range, **(search_kwargs or {}),
                )
            elif kind == "mcts":
                mv, _, _ = mcts_moves(gb, aid, key, **(search_kwargs or {}))
            else:
                mv, _ = lookahead_moves(gb, aid, key,
                                        **(search_kwargs or {}))
            return mv[0], pstate
        if kind == "ppo":
            from .env.observation import observe_ego
            from .learner.ppo import _MODEL
            from .models.actor_critic import obs_to_features

            feats = obs_to_features(
                observe_ego(game, aid, view_range=view_range), view_range
            )
            logits, _ = _MODEL.apply(net_params(name), feats)
            return jax.random.categorical(key, logits).astype(I32), pstate
        return _STATELESS[name](key, game, aid), pstate

    es = jax.vmap(lambda k: env_reset(k, engine="cellular"))(
        jax.random.split(jax.random.PRNGKey(seed), games)
    )
    ps = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (games,) + x.shape),
        simple_agent_init_batch(),
    )

    @jax.jit
    def run_step(es, ps, key):
        def one(e, p, k):
            keys = jax.random.split(k, 4)
            moves, new_p = [], []
            for i in range(4):
                mv, pi = act_one(
                    keys[i], e.game, jnp.asarray(i),
                    jax.tree.map(lambda x: x[i], p), names[i],
                )
                moves.append(mv)
                new_p.append(pi)
            mv = jnp.where(
                e.game.agent_dead, 0, jnp.stack(moves)
            ).astype(I32)
            p2 = jax.tree.map(lambda *xs: jnp.stack(xs), *new_p)
            return env_step(e, mv, team_mode=team), p2

        keys = jax.random.split(key, games)
        return jax.vmap(one)(es, ps, keys)

    key = jax.random.PRNGKey(seed + 1)
    t = 0
    for t in range(steps):
        key, k = jax.random.split(key)
        es, ps = run_step(es, ps, k)
        if (t + 1) % check_every == 0 and bool(np.asarray(es.done).all()):
            break
    return GameResults(
        done=np.asarray(es.done),
        winners=np.asarray(es.winner),
        draws=np.asarray(es.is_draw),
        steps=t + 1,
    )


# --- Elo league ---------------------------------------------------------------


def elo_expected(ra: float, rb: float) -> float:
    return 1.0 / (1.0 + 10 ** ((rb - ra) / 400.0))


class League:
    """Elo ratings over a roster of named policies (FFA line-ups).

    Each finished game scores every (winner, loser) pair as a win and every
    pair among non-winners as a draw; unfinished games are ignored.
    """

    def __init__(self, roster, k: float = 16.0, initial: float = 1200.0):
        self.roster = list(roster)
        self.k = k
        self.ratings = {n: float(initial) for n in self.roster}
        self.games_played = {n: 0 for n in self.roster}

    def record(self, lineup, results: GameResults) -> None:
        """Fold a batch of games of ``lineup`` (4 roster names) in.

        All pairwise expectations within one game are computed from the
        ratings as they stood *before* the game (standard multiplayer
        Elo); otherwise earlier pairs' updates leak into later pairs'
        expected scores and the result depends on pair iteration order.
        """
        for g in range(len(results.done)):
            if not results.done[g]:
                continue
            win = int(results.winners[g])
            pre = dict(self.ratings)
            for i, j in itertools.combinations(range(4), 2):
                a, b = lineup[i], lineup[j]
                if a == b:
                    continue
                if results.draws[g] or (win != i and win != j):
                    score_a = 0.5
                else:
                    score_a = 1.0 if win == i else 0.0
                ea = elo_expected(pre[a], pre[b])
                self.ratings[a] += self.k * (score_a - ea)
                self.ratings[b] += self.k * ((1.0 - score_a) - (1.0 - ea))
            for n in set(lineup):
                self.games_played[n] += 1

    def table(self):
        return sorted(
            ((n, self.ratings[n], self.games_played[n]) for n in self.roster),
            key=lambda r: -r[1],
        )
