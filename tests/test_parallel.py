"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from pomcpp_tpu.agents import random_agent
from pomcpp_tpu.env import env_reset
from pomcpp_tpu.parallel import boards_mesh, shard_env_batch, sharded_rollout


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_rollout_matches_single_device():
    batch = 16
    keys = jax.random.split(jax.random.PRNGKey(5), batch)
    es = jax.vmap(env_reset)(keys)

    # Single-device run.
    from pomcpp_tpu.env import rollout

    ref_final, ref_metrics = jax.jit(
        jax.vmap(lambda e: rollout(e, random_agent, 20))
    )(es)

    # Sharded run over all 8 devices.
    mesh = boards_mesh()
    es_sharded = shard_env_batch(es, mesh)
    run = sharded_rollout(mesh, random_agent, 20)
    final, metrics = run(es_sharded)

    np.testing.assert_array_equal(
        np.asarray(ref_metrics["alive"]), np.asarray(metrics["alive"])
    )
    np.testing.assert_array_equal(
        np.asarray(ref_final.game.board), np.asarray(final.game.board)
    )
    # Leading axis is genuinely sharded over the boards mesh axis.
    shard_devs = {s.device for s in final.game.board.addressable_shards}
    assert len(shard_devs) == 8


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(min(8, len(jax.devices())))
