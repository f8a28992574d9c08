#!/usr/bin/env python
"""Capture a jax.profiler trace of the batched rollout (aux tracing story).

The reference's only profiling is a wall-clock wrapper in its perf test
(performance_test.cpp:17-28); here a real device trace lands in
``build/profile/`` for TensorBoard / xprof.

Usage: python scripts/profile_step.py [--batch N] [--chunk N] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16384)
    p.add_argument("--chunk", type=int, default=64)
    p.add_argument("--out", type=str, default="build/profile")
    args = p.parse_args()

    from pomcpp_tpu.agents import random_agent
    from pomcpp_tpu.env import env_reset, rollout

    es = jax.jit(jax.vmap(lambda k: env_reset(k, engine="cellular")))(
        jax.random.split(jax.random.PRNGKey(0), args.batch)
    )
    run = jax.jit(
        jax.vmap(lambda e: rollout(e, random_agent, args.chunk))
    )
    es, _ = run(es)  # compile + warm
    jax.block_until_ready(es)

    with jax.profiler.trace(args.out):
        es, _ = run(es)
        jax.block_until_ready(es)
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
