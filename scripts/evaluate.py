#!/usr/bin/env python
"""Policy evaluation: win rates over batched games (learned or scripted).

Plays N cellular-engine games with a chosen policy per agent slot and
reports win/draw statistics -- the framework's arena (the reference's only
evaluation was watching rendered games).  Thin CLI over
``pomcpp_tpu.arena.play_games``.

Usage:
  python scripts/evaluate.py --games 64 --steps 400 \
      --agents simple,simple,random,random [--ckpt build/ppo_ckpt]
Agent names: random/harmless/lazy/simple/ppo/mcts/azmcts/lookahead (`ppo`
and `azmcts` load --ckpt; the planners take --mcts-sims/--mcts-depth).
"""

from __future__ import annotations

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Serialize against other TPU clients on this host (a concurrent
# second client wedges the axon tunnel; see utils/device_lock.py).
from pomcpp_tpu.utils.device_lock import hold_tpu_client_lock  # noqa: E402

import jax


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
    p.add_argument("--mcts-sims", type=int, default=24)
    p.add_argument("--mcts-depth", type=int, default=12)
    p.add_argument("--view-range", type=int, default=4,
                   help="observation radius for ppo slots (matches the "
                        "checkpoint's training view; 10 = full board)")
    p.add_argument("--rotate", action="store_true",
                   help="play games/4 per seat rotation of the line-up and "
                        "aggregate per POLICY (seat position biases FFA "
                        "win rates); with --team, plays all 4 team "
                        "seatings (diagonal swap x within-team swap, "
                        "games/4 each) and aggregates per named pair")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # The platform decision is final here: lock only when the
    # real TPU client may open (no-op under --cpu).
    hold_tpu_client_lock()

    from pomcpp_tpu.arena import play_games

    names = args.agents.split(",")
    assert len(names) == 4, "--agents needs 4 comma-separated names"

    ppo_params = None
    kinds = [n.split(":")[0] for n in names]
    if "ppo" in kinds or "azmcts" in kinds:
        from pomcpp_tpu.learner import PPOConfig, ppo_init
        from pomcpp_tpu.utils import restore_checkpoint

        ts0 = ppo_init(jax.random.PRNGKey(0),
                       PPOConfig(view_range=args.view_range))
        if "=" in args.ckpt:
            # Named checkpoints (--ckpt gen1=PATH,gen2=PATH) for multi-net
            # line-ups like ppo:gen2,ppo:gen1,... (arena dict mode).
            paths = dict(kv.split("=", 1) for kv in args.ckpt.split(","))
            ppo_params = {}
            for n in set(names):
                if n.split(":")[0] in ("ppo", "azmcts"):
                    key = n.split(":", 1)[1] if ":" in n else n
                    ppo_params[n] = restore_checkpoint(paths[key], ts0).params
        else:
            ppo_params = restore_checkpoint(args.ckpt, ts0).params

    search_kwargs = None
    if "azmcts" in kinds:
        search_kwargs = {"n_sim": args.mcts_sims}
    elif "mcts" in kinds:
        search_kwargs = {"n_sim": args.mcts_sims, "depth": args.mcts_depth}
    elif "lookahead" in kinds:
        search_kwargs = {"depth": args.mcts_depth}

    if args.rotate and args.team:
        # 2v2 teams are {0,2} vs {1,3}.  Four seatings cover both which
        # DIAGONAL a team sits on (swap 0<->1, 2<->3) and which corner of
        # its diagonal each MEMBER takes (swap 0<->2, 1<->3) -- without
        # the within-team swaps a heterogeneous pair (e.g. ppo+simple)
        # would keep each member in a fixed corner, leaving residual
        # positional bias (ADVICE r2).
        a, b_, c, d = names
        rotations = [
            (a, b_, c, d),
            (b_, a, d, c),   # teams swap diagonals
            (c, d, a, b_),   # members swap within teams
            (d, c, b_, a),   # both
        ]
    elif args.rotate:
        rotations = [tuple(names[-r:] + names[:-r]) for r in range(4)]
    else:
        rotations = [tuple(names)]
    games_per = args.games // len(rotations)

    counts = collections.Counter()
    seat_wins = collections.Counter()  # (policy, seat) -> wins, FFA rotate
    max_steps = 0
    total = 0
    for ri, lineup in enumerate(rotations):
        res = play_games(
            list(lineup), games=games_per, steps=args.steps,
            ppo_params=ppo_params, seed=args.seed + ri, team=args.team,
            search_kwargs=search_kwargs, view_range=args.view_range,
        )
        max_steps = max(max_steps, res.steps)
        total += games_per
        for g in range(games_per):
            if not res.done[g]:
                counts["timeout"] += 1
            elif res.draws[g]:
                counts["draw"] += 1
            elif args.team:
                members = [i for i in (0, 1, 2, 3) if i % 2 == res.winners[g]]
                if args.rotate:
                    # Aggregate by named pair across all 4 seatings: build
                    # the label in canonical (sorted) member order so e.g.
                    # ppo+simple and simple+ppo count as one pair.
                    label = "+".join(sorted(lineup[i] for i in members))
                    counts[f"win({label})"] += 1
                else:
                    label = "+".join(lineup[i] for i in members)
                    counts[f"team{res.winners[g]}({label})"] += 1
            elif args.rotate:
                counts[f"win({lineup[res.winners[g]]})"] += 1
                seat_wins[(lineup[res.winners[g]], int(res.winners[g]))] += 1
            else:
                counts[
                    f"agent{res.winners[g]}({lineup[res.winners[g]]})"
                ] += 1
    print(f"games={total} steps_played<={max_steps}")
    for k_, v in sorted(counts.items()):
        print(f"  {k_}: {v} ({100 * v / total:.1f}%)")
    if args.rotate and not args.team:
        # Per-seat breakdown for policies seated once per rotation: the
        # seat-conditional win rates (and their spread) expose positional
        # bias -- a net trained with randomize_positions should show a
        # visibly smaller spread than a fixed-seat-trained one.
        for name in sorted(set(names)):
            if names.count(name) != 1:
                continue
            rates = [100 * seat_wins[(name, s)] / games_per for s in range(4)]
            mean = sum(rates) / 4
            sd = (sum((r - mean) ** 2 for r in rates) / 4) ** 0.5
            print(
                f"  seats({name}): "
                + " ".join(f"{r:.1f}%" for r in rates)
                + f"  (sd {sd:.1f})"
            )


if __name__ == "__main__":
    main()
