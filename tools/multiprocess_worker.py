"""Worker for the multi-host-shaped distributed test (SURVEY.md §2.6 P3).

Launched N times by tests/test_multiprocess.py (or by hand):

    python tools/multiprocess_worker.py <pid> <nprocs> <port> <outdir> [mode]

Each process owns 4 virtual CPU devices; `jax.distributed.initialize` joins
them into one 4N-device SPMD world -- the same program shape as one process
per TPU host on a pod slice (docs/SCALING.md "Multi-host").

Modes:
  ppo (default) -- global boards-sharded env batch, sharded rollout + one
    PPO train step; dumps replicated params/metrics (every process must
    agree bit-for-bit: the gradient psum is the only collective).
  chunk -- the PRODUCTION throughput path: ``sharded_chunk_rollout`` (the
    fused Pallas chunk kernel under jax.shard_map, interpret mode with an
    injected move stream) over the global batch; dumps this process's
    local output rows + their sha256 so the test can diff them against a
    single-process 8-device run of the identical program (VERDICT r3
    item 4; maps performance_test.cpp:71-94's scale-out mode).
"""

import json
import os
import sys


def rows_hash(tree_np: dict, rows) -> str:
    """sha256 over the given global rows of every leaf, field order fixed."""
    import hashlib

    import numpy as np

    h = hashlib.sha256()
    for name in sorted(tree_np):
        leaf = tree_np[name]
        h.update(np.ascontiguousarray(leaf[np.asarray(rows)]).tobytes())
    return h.hexdigest()


def chunk_inputs():
    """The fixed global inputs of the chunk-mode program (identical in the
    workers and in the single-process reference run)."""
    import jax
    import numpy as np

    from pomcpp_tpu.core.board_gen import random_cell_state

    batch, steps = 16, 8
    keys = jax.random.split(jax.random.PRNGKey(11), batch)
    cs = jax.vmap(random_cell_state)(keys)
    rng = np.random.default_rng(5)
    moves = rng.integers(0, 6, size=(steps, batch, 4)).astype(np.int32)
    return cs, moves, batch, steps


def fsmchunk_inputs():
    """Fixed global inputs of the fsmchunk mode: the in-kernel SimpleAgent
    FSM chunk WITH the auto-reset path (VERDICT r4 item 5).  Two boards
    start finished so the reset merge fires; the fresh terrain is injected
    (the PRNG primitive is TPU-only)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pomcpp_tpu.core.board_gen import random_cell_state
    from pomcpp_tpu.engine.pallas_step import simple_fsm_state_init

    batch, steps = 16, 6
    cs = jax.vmap(random_cell_state)(
        jax.random.split(jax.random.PRNGKey(31), batch)
    )
    dead = np.zeros((batch, 4), bool)
    dead[2, 1:] = True
    dead[11, 1:] = True
    cs = cs._replace(
        agent_dead=jnp.asarray(dead),
        alive_count=jnp.asarray(4 - dead.sum(1), jnp.int32),
    )
    fsm = simple_fsm_state_init(batch)
    rng = np.random.default_rng(17)
    rand = rng.integers(0, 5, size=(steps, batch, 4)).astype(np.int32)
    fresh = jax.vmap(random_cell_state)(
        jax.random.split(jax.random.PRNGKey(87), batch)
    )
    return cs, fsm, rand, (fresh.board, fresh.hidden_pow), batch, steps


def main() -> int:
    pid, nprocs, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "ppo"
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

    if mode in ("chunk", "fsmchunk"):
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        from pomcpp_tpu.parallel import BOARDS_AXIS, boards_mesh
        from pomcpp_tpu.parallel.mesh import sharded_chunk_rollout

        mesh = boards_mesh()

        def make_global(x, axis=0):
            np_x = np.asarray(x)
            spec = [None] * np_x.ndim
            spec[axis] = BOARDS_AXIS
            return jax.make_array_from_callback(
                np_x.shape, NamedSharding(mesh, P(*spec)),
                lambda idx: np_x[idx],
            )

        if mode == "fsmchunk":
            cs_local, fsm_l, rand_np, reset_l, batch, steps = \
                fsmchunk_inputs()
            cs = jax.tree.map(make_global, cs_local)
            run = sharded_chunk_rollout(
                mesh, steps=steps, policy="simple", interpret=True,
                inject=True, auto_reset=True, inject_reset=True,
            )
            out, _fsm2 = run(
                cs, 0, fsm_state=jax.tree.map(make_global, fsm_l),
                moves=make_global(rand_np, axis=1),
                reset_boards=jax.tree.map(make_global, reset_l),
            )
        else:
            cs_local, moves_np, batch, steps = chunk_inputs()
            cs = jax.tree.map(make_global, cs_local)
            moves = make_global(moves_np, axis=1)
            run = sharded_chunk_rollout(
                mesh, steps=steps, policy="random", interpret=True,
                inject=True, auto_reset=False,
            )
            out = run(cs, 0, moves=moves)

        # Assemble THIS process's local rows of every output leaf.
        fields = {
            name: getattr(out, name) for name in type(out)._fields
            if getattr(out, name).ndim >= 1
            and getattr(out, name).shape[:1] == (batch,)
        }
        rows = sorted(
            sh.index[0].indices(batch)[0] + r
            for sh in fields["board"].addressable_shards
            for r in range(sh.data.shape[0])
        )
        local_np = {}
        for name, leaf in fields.items():
            buf = np.zeros((len(rows),) + leaf.shape[1:], np.asarray(
                leaf.addressable_shards[0].data).dtype)
            for sh in leaf.addressable_shards:
                start = sh.index[0].indices(batch)[0]
                for r in range(sh.data.shape[0]):
                    buf[rows.index(start + r)] = np.asarray(sh.data[r])
            local_np[name] = buf
        result = {
            "pid": pid,
            "n_global_devices": len(jax.devices()),
            "rows": rows,
            "rows_sha256": rows_hash(
                local_np, list(range(len(rows)))
            ),
        }
        with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
            json.dump(result, f)
        print(f"worker {pid}: {result}")
        return 0

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
