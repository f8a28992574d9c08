#!/usr/bin/env python
"""Measure how often the cellular production engine diverges from the exact
conformance engine in real random play (VERDICT r4 item 3).

Protocol: step both engines in lockstep over batches of full-length random
games (the exact engine is the oracle — bit-parity with the compiled C++
reference, tests/test_parity.py).  After every step, compare all CellState
fields per board; a board's FIRST divergent step is classified against the
four documented divergence classes (engine/cellular.py header; classifier
shared with tests/test_cellular.py) and the board is then frozen out of
the census.  First-divergence semantics matter: a class-1 event (the
reference stacks two bombs on one cell) leaves the exact state OUTSIDE the
cellular representable space (one bomb per cell), so no resync can restore
sync and every later step on that board re-diverges as a cascade artifact
of the first event — counting them would double-charge class 1 and (worse)
report the cascades as unclassified.

Reports per-class counts and first-divergences-per-synced-live-board-step
(ppm).  An UNCLASSIFIED first divergence is a bug — exit non-zero.

Usage:
  python scripts/divergence_census.py --games 10000 --steps 800 \
      [--batch 512] [--seed 0]

Runs on CPU (the exact engine's jaxpr is TPU-hostile, CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--games", type=int, default=10000)
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--batch", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--policy", choices=["random", "simple"], default="random",
                   help="simple = SimpleAgent FSM self-play (the realistic-"
                        "policy census; random is the worst case)")
    args = p.parse_args()

    from pomcpp_tpu.agents.simple_cellular import (
        simple_agent_cell_joint,
        simple_agent_init_batch,
    )
    from pomcpp_tpu.core.board_gen import init_state_np
    from pomcpp_tpu.engine.cellular import CellState, cellular_step, from_state
    from pomcpp_tpu.engine.step import step
    from pomcpp_tpu.testing.divergence import divergence_classes

    cmp_fields = [f for f in CellState._fields if f != "timestep"]
    simple = args.policy == "simple"

    @jax.jit
    def census_step(s, c, key, ps):
        """One lockstep batch step: exact + cellular + per-board equality.

        Moves come from the in-batch PRNG (random census) or from the
        SimpleAgent FSM acting on the SYNCED cellular state (both engines
        then execute the identical joint move)."""
        if simple:
            keys = jax.random.split(key, s.agent_x.shape[0])
            mv, ps = jax.vmap(simple_agent_cell_joint)(keys, c, ps)
            mv = jnp.where(c.agent_dead, 0, mv).astype(jnp.int32)
        else:
            mv = jax.random.randint(key, s.agent_x.shape[:1] + (4,), 0, 6,
                                    dtype=jnp.int32)
        s2 = jax.vmap(step)(s, mv)
        e2 = jax.vmap(from_state)(s2)
        c2 = jax.vmap(cellular_step)(c, mv)
        eq = jnp.ones(mv.shape[0], bool)
        for f in cmp_fields:
            a, b = getattr(e2, f), getattr(c2, f)
            d = (a != b).reshape(mv.shape[0], -1).any(axis=1) \
                if a.ndim > 1 else (a != b)
            eq = eq & ~d
        live = s.alive_count > 1
        return s2, c2, eq, live, mv, ps

    counts = {"1:stacked-plant": 0, "2:stale-plant-direction": 0,
              "3:multi-bomb-chain": 0, "4:multi-bomb-pileup": 0}
    multi = 0          # divergent steps with >1 candidate class
    unclassified = []  # (batch, t, board)
    total_live_steps = 0
    total_div = 0
    t_start = time.time()

    n_batches = (args.games + args.batch - 1) // args.batch
    for bi in range(n_batches):
        b = min(args.batch, args.games - bi * args.batch)
        seeds = [args.seed + bi * args.batch + g for g in range(b)]
        states = [init_state_np(s) for s in seeds]
        s = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        # Half the games play with kicks enabled (both rule modes matter).
        kick = jnp.asarray([(g % 2) == 1 for g in range(b)])
        s = s._replace(agent_can_kick=jnp.broadcast_to(kick[:, None], (b, 4)))
        c = jax.vmap(from_state)(s)
        ps = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (b,) + x.shape),
            simple_agent_init_batch(),
        )
        key = jax.random.PRNGKey(args.seed * 7919 + bi)
        synced = np.ones(b, bool)

        for t in range(args.steps):
            key, k = jax.random.split(key)
            s_pre = s
            s, c, eq, live, mv, ps = census_step(s, c, k, ps)
            live_np = np.asarray(live)
            neq = np.asarray(~eq) & live_np & synced
            total_live_steps += int((live_np & synced).sum())
            if neq.any():
                idx = np.nonzero(neq)[0]
                total_div += len(idx)
                synced[idx] = False  # freeze: first divergence only
                pre_cell = jax.vmap(from_state)(s_pre)
                post_cell = jax.vmap(from_state)(s)
                for i in idx:
                    one_pre = jax.tree.map(lambda x: x[i], pre_cell)
                    one_post = jax.tree.map(lambda x: x[i], post_cell)
                    one_pre_exact = jax.tree.map(lambda x: x[i], s_pre)
                    cl = divergence_classes(one_pre, np.asarray(mv)[i],
                                            one_post,
                                            pre_exact=one_pre_exact)
                    if not cl:
                        unclassified.append((bi, t, int(i)))
                    else:
                        if len(cl) > 1:
                            multi += 1
                        for name in cl:
                            counts[name] += 1
            if not bool((live_np & synced).any()):
                break
        done_games = bi * args.batch + b
        ppm = 1e6 * total_div / max(total_live_steps, 1)
        print(f"batch {bi + 1}/{n_batches}: games={done_games} "
              f"live_steps={total_live_steps} div={total_div} "
              f"({ppm:.1f} ppm)  [{time.time() - t_start:.0f}s]",
              flush=True)

    out = {
        "policy": args.policy,
        "games": args.games,
        "steps_cap": args.steps,
        "synced_live_board_steps": total_live_steps,
        "first_divergences": total_div,
        "divergence_ppm": round(1e6 * total_div / max(total_live_steps, 1), 2),
        "class_counts": counts,
        "multi_class_steps": multi,
        "unclassified": len(unclassified),
    }
    print(json.dumps(out))
    if unclassified:
        print(f"UNCLASSIFIED divergences at (batch,t,board): "
              f"{unclassified[:10]}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
