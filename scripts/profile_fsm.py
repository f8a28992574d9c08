#!/usr/bin/env python
"""Cost attribution for the in-kernel SimpleAgent FSM (engine/pallas_fsm.py).

Runs the fused simple-policy chunk kernel with FSM sub-phases stubbed out
(PALLAS_SKIP_PHASES) and reports steps/s per variant; the delta vs the full
kernel attributes wall time to each phase.  TPU only; each variant is a
fresh compile (~minutes first time, cached after).

Usage: python scripts/profile_fsm.py --skip fsm_bfs [--batch 16384]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

p = argparse.ArgumentParser()
p.add_argument("--skip", type=str, default="")
p.add_argument("--batch", type=int, default=16384)
p.add_argument("--chunk", type=int, default=64)
p.add_argument("--rounds", type=int, default=3)
args = p.parse_args()

if args.skip:
    os.environ["PALLAS_SKIP_PHASES"] = args.skip

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Serialize against other TPU clients on this host (a concurrent
# second client wedges the axon tunnel; see utils/device_lock.py).
from pomcpp_tpu.utils.device_lock import hold_tpu_client_lock  # noqa: E402
hold_tpu_client_lock()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from pomcpp_tpu.core.board_gen import random_cell_state  # noqa: E402
from pomcpp_tpu.engine.pallas_step import (  # noqa: E402
    pallas_rollout_chunk,
    simple_fsm_state_init,
)


def main() -> None:
    cs = jax.jit(jax.vmap(random_cell_state))(
        jax.random.split(jax.random.PRNGKey(0), args.batch)
    )
    fsm = simple_fsm_state_init(args.batch)

    def run(cs, fsm, seed):
        return pallas_rollout_chunk(
            cs, seed, steps=args.chunk, policy="simple", fsm_state=fsm
        )

    t0 = time.perf_counter()
    cs, fsm = run(cs, fsm, 7)
    float(jnp.sum(cs.alive_count))
    print(f"skip=[{args.skip}] first call {time.perf_counter() - t0:.0f}s",
          flush=True)
    best = 0.0
    for r in range(args.rounds):
        t0 = time.perf_counter()
        for k in range(4):
            cs, fsm = run(cs, fsm, 100 + r * 4 + k)
        float(jnp.sum(cs.alive_count))
        dt = time.perf_counter() - t0
        best = max(best, args.batch * args.chunk * 4 / dt)
    print(f"RESULT skip=[{args.skip}] {best / 1e6:.2f}M steps/s "
          f"({args.batch * args.chunk * 4 / best * 1e3:.1f} ms/4chunks)",
          flush=True)


if __name__ == "__main__":
    main()
