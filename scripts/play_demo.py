#!/usr/bin/env python
"""Rendered demo game: four SimpleAgents on a random board.

TPU-native equivalent of the reference demo (src/main.cpp:8-25): builds a
fresh board, gives every agent kick (like the reference forces canKick),
and renders a full game in the terminal.

Usage: python scripts/play_demo.py [--seed N] [--steps N] [--fps N]
       [--policy simple|random|harmless] [--no-render]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Interactive host tool: a single rendered game gains nothing from an
# accelerator and CPU compiles in seconds.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
if os.environ.get("JAX_PLATFORMS") not in ("cpu",):
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0x1337)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--fps", type=float, default=12.0)
    p.add_argument(
        "--policy", choices=("simple", "random", "harmless"), default="simple"
    )
    p.add_argument("--no-render", action="store_true")
    p.add_argument("--pause", action="store_true", help="step-by-step: wait for Enter")
    args = p.parse_args()

    from pomcpp_tpu.agents import harmless_agent, random_agent
    from pomcpp_tpu.agents.simple import (
        simple_agent_init_batch,
        simple_agent_policy,
    )
    from pomcpp_tpu.core.board_gen import init_state_np
    from pomcpp_tpu.core.constants import AGENT_COUNT
    from pomcpp_tpu.engine.step import step
    from pomcpp_tpu.render import print_state

    s = init_state_np(args.seed)
    s = s._replace(agent_can_kick=jnp.ones((AGENT_COUNT,), bool))
    key = jax.random.PRNGKey(args.seed)

    if args.policy == "simple":
        pstate = simple_agent_init_batch()

        @jax.jit
        def act(key, game, pstate):
            keys = jax.random.split(key, AGENT_COUNT)
            ids = jnp.arange(AGENT_COUNT, dtype=jnp.int32)
            moves, pstate = jax.vmap(
                simple_agent_policy, in_axes=(0, None, 0, 0)
            )(keys, game, ids, pstate)
            return jnp.where(game.agent_dead, 0, moves), pstate
    else:
        policy = random_agent if args.policy == "random" else harmless_agent
        pstate = None

        @jax.jit
        def act(key, game, pstate):
            keys = jax.random.split(key, AGENT_COUNT)
            ids = jnp.arange(AGENT_COUNT, dtype=jnp.int32)
            moves = jax.vmap(policy, in_axes=(0, None, 0))(keys, game, ids)
            return jnp.where(game.agent_dead, 0, moves), pstate

    jstep = jax.jit(step)
    for t in range(args.steps):
        key, k = jax.random.split(key)
        moves, pstate = act(k, s, pstate)
        s = jstep(s, moves)
        s = s._replace(timestep=s.timestep + 1)
        if not args.no_render:
            print_state(s, clear=True)
            if args.pause:
                input()
            else:
                time.sleep(1.0 / args.fps)
        if int(s.alive_count) <= 1:
            break

    print_state(s, clear=False)
    alive = [i for i in range(4) if not bool(s.agent_dead[i])]
    if len(alive) == 1:
        print(f"Finished! The winner is Agent {alive[0]}")
    elif not alive:
        print("Draw! All agents are dead")
    else:
        print("Draw! Max timesteps reached")


if __name__ == "__main__":
    main()
