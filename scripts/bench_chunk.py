"""Direct pallas-chunk timing: both policies, no fallback, long budget.

Usage: python scripts/bench_chunk.py [harmless random] [--batch N] [--chunk K]
Prints per-config steps/s (honest host-fetch timing).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Serialize against other TPU clients on this host (a concurrent
# second client wedges the axon tunnel; see utils/device_lock.py).
from pomcpp_tpu.utils.device_lock import hold_tpu_client_lock  # noqa: E402
hold_tpu_client_lock()

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp  # noqa: E402

from pomcpp_tpu.core.board_gen import random_cell_state  # noqa: E402
from pomcpp_tpu.engine.pallas_step import pallas_rollout_chunk  # noqa: E402


def bench(policy: str, batch: int, chunk: int, rounds: int = 3,
          per_round: int = 4) -> float:
    from pomcpp_tpu.engine.pallas_step import simple_fsm_state_init

    cs = jax.jit(jax.vmap(random_cell_state))(
        jax.random.split(jax.random.PRNGKey(0), batch)
    )
    fsm = simple_fsm_state_init(batch) if policy == "simple" else None

    def run(cs, fsm, seed):
        if policy == "simple":
            cs, fsm = pallas_rollout_chunk(
                cs, seed, steps=chunk, policy=policy, fsm_state=fsm
            )
        else:
            cs = pallas_rollout_chunk(cs, seed, steps=chunk, policy=policy)
        return cs, fsm

    t0 = time.perf_counter()
    cs, fsm = run(cs, fsm, 7)
    float(jnp.sum(cs.alive_count))
    print(f"  [{policy}] first call (compile+run): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    best = 0.0
    for r in range(rounds):
        t0 = time.perf_counter()
        for k in range(per_round):
            cs, fsm = run(cs, fsm, 100 + r * per_round + k)
        float(jnp.sum(cs.alive_count))
        dt = time.perf_counter() - t0
        sps = batch * chunk * per_round / dt
        print(f"  [{policy}] round {r}: {sps / 1e6:.2f}M steps/s "
              f"({dt * 1e3:.0f} ms)", flush=True)
        best = max(best, sps)
    return best


if __name__ == "__main__":
    batch = 16384
    chunk = 64
    policies = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--batch") or a.startswith("--chunk"):
            # Accept both --batch=N and --batch N.
            if "=" in a:
                val = a.split("=", 1)[1]
            else:
                i += 1
                val = argv[i]
            if a.startswith("--batch"):
                batch = int(val)
            else:
                chunk = int(val)
        elif not a.startswith("--"):
            policies.append(a)
        i += 1
    policies = policies or ["harmless", "random"]
    print(f"device: {jax.devices()[0].platform}, batch {batch}, chunk {chunk}")
    for p in policies:
        best = bench(p, batch, chunk)
        print(f"{p}: {best / 1e6:.2f}M steps/s  "
              f"(vs 5.86M baseline: {best / 5.8633e6:.2f}x)", flush=True)
# (simple policy support: bench() passes fsm_state when policy == "simple")
