#!/usr/bin/env python
"""Replay-driven debugging: record a game to npz, then page through it.

The reference's only debugging UX is watching a live rendered game
(src/main.cpp:8-25, environment.cpp:68-116).  Here a game is data
(utils/replay.py): record once, then scrub back and forth through the
trajectory, jump to the step where something went wrong, and read the
joint moves that caused it.

Usage:
  record: python scripts/replay_viewer.py --record build/game.npz \
              [--seed N] [--steps N] [--policy simple|random|harmless]
  view:   python scripts/replay_viewer.py --view build/game.npz
              (keys: Enter/n next, p prev, g <t> goto, q quit)
  dump:   python scripts/replay_viewer.py --view build/game.npz \
              --frames 10:14        # non-interactive, for tests/CI
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Host debugging tool: CPU only (the shell pins JAX_PLATFORMS=axon; the env
# var alone does not stick — the in-process config update below is required).
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

_MOVE_NAMES = ("idle", "up", "down", "left", "right", "bomb")


def record(args) -> None:
    from pomcpp_tpu.agents import harmless_agent, random_agent
    from pomcpp_tpu.agents.simple import (
        simple_agent_init_batch,
        simple_agent_policy,
    )
    from pomcpp_tpu.core.board_gen import init_state_np
    from pomcpp_tpu.core.constants import AGENT_COUNT
    from pomcpp_tpu.engine.step import step
    from pomcpp_tpu.utils.replay import record_game, save_replay

    s = init_state_np(args.seed)
    key = jax.random.PRNGKey(args.seed)
    pstate = simple_agent_init_batch() if args.policy == "simple" else None

    @jax.jit
    def act(key, game, pstate):
        keys = jax.random.split(key, AGENT_COUNT)
        ids = jnp.arange(AGENT_COUNT, dtype=jnp.int32)
        if args.policy == "simple":
            moves, pstate = jax.vmap(
                simple_agent_policy, in_axes=(0, None, 0, 0)
            )(keys, game, ids, pstate)
        else:
            policy = (random_agent if args.policy == "random"
                      else harmless_agent)
            moves = jax.vmap(policy, in_axes=(0, None, 0))(keys, game, ids)
        return jnp.where(game.agent_dead, 0, moves), pstate

    jstep = jax.jit(step)
    box = {"key": key, "pstate": pstate}

    def moves_fn(t, game):
        box["key"], k = jax.random.split(box["key"])
        mv, box["pstate"] = act(k, game, box["pstate"])
        return mv

    def step_fn(game, mv):
        game = jstep(game, mv)
        return game._replace(timestep=game.timestep + 1)

    states, moves = record_game(s, step_fn, moves_fn, args.steps)
    save_replay(args.record, states, moves)
    print(f"recorded {args.steps} steps (seed {args.seed}, "
          f"{args.policy} policies) -> {args.record}")


def _frame_text(states, moves, t, n_steps) -> str:
    from pomcpp_tpu.render import render_state
    from pomcpp_tpu.utils.replay import replay_frame

    s = replay_frame(states, t)
    lines = [f"--- step {t}/{n_steps} ---"]
    lines.append(render_state(s, color=sys.stdout.isatty()))
    if t < n_steps:
        mv = [_MOVE_NAMES[int(m)] for m in moves[t]]
        lines.append(f"next joint move: {mv}")
    else:
        lines.append("(final state)")
    return "\n".join(lines)


def view(args) -> None:
    from pomcpp_tpu.core.state import empty_state
    from pomcpp_tpu.utils.replay import load_replay

    states, moves = load_replay(args.view, empty_state())
    n_steps = moves.shape[0]

    if args.frames:
        a, _, b = args.frames.partition(":")
        lo = int(a or 0)
        hi = int(b) if b else lo + 1
        for t in range(lo, min(hi, n_steps + 1)):
            print(_frame_text(states, moves, t, n_steps))
        return

    t = 0
    while True:
        print("\033[2J\033[H", end="")
        print(_frame_text(states, moves, t, n_steps))
        try:
            cmd = input("[n]ext p)rev g <t> q)uit > ").strip()
        except EOFError:
            return
        if cmd in ("q", "quit"):
            return
        if cmd in ("p", "prev"):
            t = max(0, t - 1)
        elif cmd.startswith("g"):
            try:
                t = max(0, min(n_steps, int(cmd.split()[-1])))
            except (ValueError, IndexError):
                pass
        else:
            t = min(n_steps, t + 1)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--record", type=str, help="record a game to this npz")
    p.add_argument("--view", type=str, help="view a recorded npz")
    p.add_argument("--seed", type=int, default=0x1337)
    p.add_argument("--steps", type=int, default=120)
    p.add_argument(
        "--policy", choices=("simple", "random", "harmless"), default="simple"
    )
    p.add_argument("--frames", type=str, default="",
                   help="A:B non-interactive frame dump")
    args = p.parse_args()
    if args.record:
        record(args)
    elif args.view:
        view(args)
    else:
        p.error("need --record or --view")


if __name__ == "__main__":
    main()
