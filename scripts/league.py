#!/usr/bin/env python
"""Elo league over a roster of policies: sampled 4-slot line-ups, batched
games, ratings table.

Usage:
  python scripts/league.py --roster simple,random,harmless,lazy \
      --rounds 6 --games 32 --steps 300 [--ckpt build/ppo_ckpt] [--cpu]
Include ``ppo`` (raw net) or ``azmcts`` (net-guided PUCT) in the roster
to rate a trained checkpoint.

Multi-generation league: name checkpoints with ``--ckpt gen1=PATH,gen2=PATH``
and use roster entries ``ppo:gen1,ppo:gen2,azmcts:gen2`` -- each slot loads
its own params (arena.play_games dict mode), so generations can be rated
against each other (VERDICT r3 item 3).
"""

from __future__ import annotations

import argparse
import itertools
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Serialize against other TPU clients on this host (a concurrent
# second client wedges the axon tunnel; see utils/device_lock.py).
from pomcpp_tpu.utils.device_lock import hold_tpu_client_lock  # noqa: E402

import jax


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--roster", type=str, default="simple,random,harmless,lazy")
    p.add_argument("--rounds", type=int, default=6,
                   help="line-ups to play (cycled from all 2v2-ish pairings)")
    p.add_argument("--games", type=int, default=32)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--ckpt", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--all4", action="store_true",
                   help="four distinct roster members per game instead of "
                        "2+2 pair line-ups (avoids two-net stalemates)")
    p.add_argument("--view-range", type=int, default=4,
                   help="observation radius for net slots (matches the "
                        "checkpoints' training view; 10 = full board)")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # The platform decision is final here: lock only when the
    # real TPU client may open (no-op under --cpu).
    hold_tpu_client_lock()

    from pomcpp_tpu.arena import League, play_games

    roster = args.roster.split(",")
    net_names = [n for n in roster if n.split(":")[0] in ("ppo", "azmcts")]
    ppo_params = None
    if net_names:
        from pomcpp_tpu.learner import PPOConfig, ppo_init
        from pomcpp_tpu.utils import restore_checkpoint

        ts0 = ppo_init(jax.random.PRNGKey(0),
                       PPOConfig(view_range=args.view_range))
        if "=" in args.ckpt:
            # Named checkpoints: gen1=PATH,gen2=PATH -> dict params keyed
            # by the full roster name (ppo:gen1, azmcts:gen2, ...).
            paths = dict(kv.split("=", 1) for kv in args.ckpt.split(","))
            ppo_params = {}
            for n in net_names:
                key = n.split(":", 1)[1] if ":" in n else n
                ppo_params[n] = restore_checkpoint(paths[key], ts0).params
        else:
            ts = restore_checkpoint(args.ckpt, ts0)
            ppo_params = ts.params

    league = League(roster)
    # Balanced 2+2 line-ups over all roster pairs, alternating seats.
    # --all4 instead seats four DISTINCT roster members per game (random
    # seat permutations): with >= 2 trained nets in a 2+2 line-up both
    # survivors dodge to the step cap and no game decides (the FFA
    # stalemate equilibrium, docs/TRAINING.md); mixed 4-policy games keep
    # enough chaos that Elo gets decided games to score.
    pairs = list(itertools.combinations(roster, 2)) or [(roster[0],) * 2]
    rng = random.Random(args.seed)
    for rd in range(args.rounds):
        if args.all4 and len(roster) >= 4:
            lineup = rng.sample(roster, 4)
        else:
            a, b = pairs[rd % len(pairs)]
            lineup = [a, b, a, b] if rd % 2 == 0 else [b, a, b, a]
        res = play_games(
            lineup, args.games, args.steps, ppo_params=ppo_params,
            seed=args.seed + 1000 * rd + rng.randint(0, 999),
            view_range=args.view_range,
        )
        league.record(lineup, res)
        finished = int(res.done.sum())
        print(f"round {rd}: {lineup} -> {finished}/{args.games} finished "
              f"in <={res.steps} steps", flush=True)

    print("\nElo table:")
    for name, rating, games in league.table():
        print(f"  {name:10s} {rating:7.1f}  ({games} games)")


if __name__ == "__main__":
    main()
