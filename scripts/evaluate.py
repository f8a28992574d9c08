#!/usr/bin/env python
"""Policy evaluation: win rates over batched games (learned or scripted).

Plays N cellular-engine games with a chosen policy per agent slot and
reports win/draw statistics -- the framework's arena (the reference's only
evaluation was watching rendered games).

Usage:
  python scripts/evaluate.py --games 64 --steps 400 \
      --agents simple,simple,random,random [--ckpt build/ppo_ckpt]
`ppo` as an agent name loads the checkpoint given by --ckpt.
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


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--games", type=int, default=64)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--agents", type=str, default="simple,simple,simple,simple")
    p.add_argument("--ckpt", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--team", action="store_true",
                   help="2v2 team mode ({0,2} vs {1,3}); reports team win rates")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from pomcpp_tpu.agents import harmless_agent, lazy_agent, random_agent
    from pomcpp_tpu.agents.simple_cellular import (
        simple_agent_cell_policy,
        simple_agent_init_batch,
    )
    from pomcpp_tpu.env import env_reset
    from pomcpp_tpu.env.environment import env_step
    from pomcpp_tpu.core.state import I32

    names = args.agents.split(",")
    assert len(names) == 4, "--agents needs 4 comma-separated names"

    ppo_params = None
    if "ppo" in names:
        from pomcpp_tpu.learner import ppo_init
        from pomcpp_tpu.utils import restore_checkpoint

        ts = ppo_init(jax.random.PRNGKey(0))
        ts = restore_checkpoint(args.ckpt, ts)
        ppo_params = ts.params

    def make_policy(name):
        if name == "simple":
            return "simple"
        if name == "ppo":
            from pomcpp_tpu.env.observation import observe_ego
            from pomcpp_tpu.models.actor_critic import _MODEL_SENTINEL  # noqa
        return {
            "random": random_agent,
            "harmless": harmless_agent,
            "lazy": lazy_agent,
        }[name]

    stateless = {
        "random": random_agent,
        "harmless": harmless_agent,
        "lazy": lazy_agent,
    }

    def act_one(key, game, aid, pstate, name):
        if name == "simple":
            return simple_agent_cell_policy(key, game, aid, pstate)
        if name == "ppo":
            from pomcpp_tpu.env.observation import observe_ego
            from pomcpp_tpu.learner.ppo import _MODEL
            from pomcpp_tpu.models.actor_critic import obs_to_features

            feats = obs_to_features(observe_ego(game, aid))
            logits, _ = _MODEL.apply(ppo_params, feats)
            return jax.random.categorical(key, logits).astype(I32), pstate
        return stateless[name](key, game, aid), pstate

    batch = args.games
    es = jax.vmap(lambda k: env_reset(k, engine="cellular"))(
        jax.random.split(jax.random.PRNGKey(args.seed), batch)
    )
    ps = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape),
        simple_agent_init_batch(),
    )

    @jax.jit
    def run_step(es, ps, key):
        def one(e, p, k):
            keys = jax.random.split(k, 4)
            moves = []
            new_p = []
            for i in range(4):
                mv, pi = act_one(
                    keys[i], e.game, jnp.asarray(i), jax.tree.map(lambda x: x[i], p),
                    names[i],
                )
                moves.append(mv)
                new_p.append(pi)
            moves = jnp.stack(moves)
            moves = jnp.where(e.game.agent_dead, 0, moves).astype(I32)
            p2 = jax.tree.map(lambda *xs: jnp.stack(xs), *new_p)
            return env_step(e, moves, team_mode=args.team), p2

        keys = jax.random.split(key, batch)
        return jax.vmap(one)(es, ps, keys)

    key = jax.random.PRNGKey(args.seed + 1)
    for t in range(args.steps):
        key, k = jax.random.split(key)
        es, ps = run_step(es, ps, k)
        if bool(np.asarray(es.done).all()):
            break

    done = np.asarray(es.done)
    winners = np.asarray(es.winner)
    draws = np.asarray(es.is_draw)
    counts = collections.Counter()
    for g in range(batch):
        if not done[g]:
            counts["timeout"] += 1
        elif draws[g]:
            counts["draw"] += 1
        elif args.team:
            members = [i for i in (0, 1, 2, 3) if i % 2 == winners[g]]
            label = "+".join(names[i] for i in members)
            counts[f"team{winners[g]}({label})"] += 1
        else:
            counts[f"agent{winners[g]}({names[winners[g]]})"] += 1
    total = batch
    print(f"games={total} steps_played<={t + 1}")
    for k_, v in sorted(counts.items()):
        print(f"  {k_}: {v} ({100 * v / total:.1f}%)")


if __name__ == "__main__":
    main()
