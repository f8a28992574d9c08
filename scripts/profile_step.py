#!/usr/bin/env python
"""Capture a jax.profiler trace of the batched rollout (aux tracing story).

The reference's only profiling is a wall-clock wrapper in its perf test
(performance_test.cpp:17-28); here a real device trace lands in
``build/profile/`` for TensorBoard / xprof.

``--path pallas`` traces the production fused chunk kernel
(pallas_rollout_chunk, the exact entry point bench.py drives) with the
chosen policy; ``--path xla`` traces the vmapped cellular engine.

Usage: python scripts/profile_step.py [--path pallas|xla]
           [--policy harmless|random|simple] [--batch N] [--chunk N]
           [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Serialize against other TPU clients on this host (a concurrent
# second client wedges the axon tunnel; see utils/device_lock.py).
from pomcpp_tpu.utils.device_lock import hold_tpu_client_lock  # noqa: E402
hold_tpu_client_lock()

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--path", choices=["pallas", "xla"], default="pallas")
    p.add_argument("--policy", type=str, default="harmless")
    p.add_argument("--batch", type=int, default=16384)
    p.add_argument("--chunk", type=int, default=64)
    p.add_argument("--out", type=str, default="build/profile")
    args = p.parse_args()

    import jax.numpy as jnp

    if args.path == "pallas":
        from pomcpp_tpu.core.board_gen import random_cell_state
        from pomcpp_tpu.engine.pallas_step import (
            pallas_rollout_chunk,
            simple_fsm_state_init,
        )

        cs = jax.jit(jax.vmap(random_cell_state))(
            jax.random.split(jax.random.PRNGKey(0), args.batch)
        )
        fsm = (simple_fsm_state_init(args.batch)
               if args.policy == "simple" else None)

        def run(cs, fsm, seed):
            if args.policy == "simple":
                return pallas_rollout_chunk(
                    cs, seed, steps=args.chunk, policy="simple",
                    fsm_state=fsm,
                )
            return pallas_rollout_chunk(
                cs, seed, steps=args.chunk, policy=args.policy
            ), fsm

        cs, fsm = run(cs, fsm, 7)  # compile + warm
        float(jnp.sum(cs.alive_count))
        with jax.profiler.trace(args.out):
            cs, fsm = run(cs, fsm, 8)
            float(jnp.sum(cs.alive_count))
    else:
        from pomcpp_tpu.agents import random_agent
        from pomcpp_tpu.env import env_reset, rollout

        es = jax.jit(jax.vmap(lambda k: env_reset(k, engine="cellular")))(
            jax.random.split(jax.random.PRNGKey(0), args.batch)
        )
        run = jax.jit(
            jax.vmap(lambda e: rollout(e, random_agent, args.chunk))
        )
        es, _ = run(es)  # compile + warm
        float(jnp.sum(es.game.alive_count))  # host fetch = real barrier
        with jax.profiler.trace(args.out):
            es, _ = run(es)
            float(jnp.sum(es.game.alive_count))
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
