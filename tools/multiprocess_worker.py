"""Worker for the multi-host-shaped distributed test (SURVEY.md §2.6 P3).

Launched N times by tests/test_multiprocess.py (or by hand):

    python tools/multiprocess_worker.py <pid> <nprocs> <port> <outdir>

Each process owns 4 virtual CPU devices; `jax.distributed.initialize` joins
them into one 4N-device SPMD world -- the same program shape as one process
per TPU host on a pod slice (docs/SCALING.md "Multi-host").  The worker
builds a global boards-sharded env batch, runs a sharded rollout and one
PPO train step over the GLOBAL batch, and dumps the replicated results; the
test asserts all processes agree bit-for-bit.
"""

import json
import os
import sys


def main() -> int:
    pid, nprocs, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert len(jax.devices()) == 4 * nprocs, jax.devices()
    assert len(jax.local_devices()) == 4

    import hashlib

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pomcpp_tpu.env import env_reset
    from pomcpp_tpu.learner import PPOConfig, ppo_init, ppo_train_step
    from pomcpp_tpu.parallel import BOARDS_AXIS, boards_mesh

    mesh = boards_mesh()  # 1-D over all 4N global devices
    batch = 16

    def make_global(x):
        """Identical host-local array -> global boards-sharded array."""
        np_x = np.asarray(x)
        spec = P(BOARDS_AXIS, *([None] * (np_x.ndim - 1)))
        return jax.make_array_from_callback(
            np_x.shape, NamedSharding(mesh, spec), lambda idx: np_x[idx]
        )

    # Same seed on every process -> identical logical global batch.
    keys = jax.random.split(jax.random.PRNGKey(7), batch)
    es_local = jax.vmap(lambda k: env_reset(k, engine="cellular"))(keys)
    es = jax.tree.map(make_global, es_local)

    cfg = PPOConfig(rollout_len=8, epochs=1, minibatches=2)
    ts = ppo_init(jax.random.PRNGKey(0), cfg)  # replicated by default use
    ts, es, metrics = jax.jit(
        lambda ts, es: ppo_train_step(ts, es, cfg)
    )(ts, es)

    # Replicated outputs: params hash + scalar metrics must agree across
    # processes (the gradient all-reduce is the only collective).
    leaves = jax.tree.leaves(jax.device_get(ts.params))
    h = hashlib.sha256()
    for leaf in leaves:
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    result = {
        "pid": pid,
        "n_global_devices": len(jax.devices()),
        "params_sha256": h.hexdigest(),
        "loss": float(metrics["loss"]),
        "reward_mean": float(metrics["reward_mean"]),
        "episodes": float(metrics["episodes"]),
    }
    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
        json.dump(result, f)
    print(f"worker {pid}: {result}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
