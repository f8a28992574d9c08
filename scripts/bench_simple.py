"""SimpleAgent self-play throughput (the reference's checked-in benchmark
config, performance_test.cpp:38) at several batch sizes.

Usage: python scripts/bench_simple.py [--batches 2048,8192,16384] [--steps 32]
"""

import sys
import time

import jax

# Serialize against other TPU clients on this host (a concurrent
# second client wedges the axon tunnel; see utils/device_lock.py).
from pomcpp_tpu.utils.device_lock import hold_tpu_client_lock  # noqa: E402
hold_tpu_client_lock()

jax.config.update("jax_compilation_cache_dir", "/root/repo/build/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp  # noqa: E402

from pomcpp_tpu.agents.simple import simple_agent_init  # noqa: E402
from pomcpp_tpu.agents.simple_cellular import (  # noqa: E402
    simple_agent_cell_joint,
)
from pomcpp_tpu.env import env_reset  # noqa: E402
from pomcpp_tpu.env.environment import rollout_stateful  # noqa: E402


def bench(batch: int, steps: int, rounds: int = 3) -> float:
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    es = jax.jit(jax.vmap(lambda k: env_reset(k, engine="cellular")))(keys)
    ps0 = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (4,) + x.shape),
        simple_agent_init(),
    )
    psb = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), ps0
    )

    run = jax.jit(
        jax.vmap(
            lambda e, p: rollout_stateful(
                e, simple_agent_cell_joint, p, steps,
                reset_policy_state=ps0, joint=True,
            )[:2]
        )
    )
    t0 = time.perf_counter()
    es, psb = run(es, psb)
    float(jnp.sum(es.game.alive_count))
    print(f"  b{batch}: first call {time.perf_counter() - t0:.0f}s",
          flush=True)
    best = 0.0
    for _ in range(rounds):
        t0 = time.perf_counter()
        es, psb = run(es, psb)
        float(jnp.sum(es.game.alive_count))
        dt = time.perf_counter() - t0
        best = max(best, batch * steps / dt)
        print(f"  b{batch}: {best / 1e3:.0f}k steps/s ({dt * 1e3:.0f} ms)",
              flush=True)
    return best


if __name__ == "__main__":
    batches = [2048, 8192]
    steps = 32
    for a in sys.argv[1:]:
        if a.startswith("--batches"):
            batches = [int(x) for x in a.split("=")[1].split(",")]
        if a.startswith("--steps"):
            steps = int(a.split("=")[1])
    print(f"device: {jax.devices()[0].platform}")
    for b in batches:
        best = bench(b, steps)
        print(f"batch {b}: {best / 1e3:.0f}k env-steps/s", flush=True)
