"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from pomcpp_tpu.agents import random_agent
from pomcpp_tpu.env import env_reset
from pomcpp_tpu.parallel import (
    boards_mesh,
    shard_batch,
    shard_env_batch,
    sharded_rollout,
)


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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_chunk_matches_unsharded():
    """The fused Pallas chunk kernel (the production throughput path,
    bench.py) under an 8-device boards mesh is bit-identical to the
    unsharded kernel on the same move stream (VERDICT r2 item 1).

    Interpret mode (no in-kernel PRNG on CPU) -> injected moves and
    auto_reset off, exactly like tests/test_pallas_step.py."""
    import jax.numpy as jnp

    from pomcpp_tpu.core.board_gen import random_cell_state
    from pomcpp_tpu.engine.pallas_step import pallas_rollout_chunk
    from pomcpp_tpu.parallel import sharded_chunk_rollout

    steps, b = 8, 16
    csb = jax.vmap(random_cell_state)(
        jax.random.split(jax.random.PRNGKey(11), b)
    )
    # Kick on a few boards so the slide/reversion paths execute.
    csb = csb._replace(
        agent_can_kick=jnp.zeros((b, 4), bool).at[:4].set(True)
    )
    rng = np.random.RandomState(3)
    moves = jnp.asarray(rng.randint(0, 6, size=(steps, b, 4)), jnp.int32)

    ref = pallas_rollout_chunk(
        csb, 0, steps=steps, interpret=True, moves=moves, auto_reset=False
    )

    mesh = boards_mesh()
    run = sharded_chunk_rollout(
        mesh, steps=steps, interpret=True, inject=True, auto_reset=False
    )
    got = run(shard_batch(csb, mesh), 0, moves=moves)

    for name in type(ref)._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name)),
            err_msg=f"field {name}",
        )
    assert len({s.device for s in got.board.addressable_shards}) == 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_chunk_simple_fsm_matches_unsharded():
    """In-kernel SimpleAgent FSM chunk over the mesh: state + FSM carries
    match the unsharded kernel bit-for-bit on the same rand stream."""
    import jax.numpy as jnp

    from pomcpp_tpu.core.board_gen import random_cell_state
    from pomcpp_tpu.engine.pallas_step import (
        pallas_rollout_chunk,
        simple_fsm_state_init,
    )
    from pomcpp_tpu.parallel import sharded_chunk_rollout

    steps, b = 6, 16
    csb = jax.vmap(random_cell_state)(
        jax.random.split(jax.random.PRNGKey(21), b)
    )
    fsm = simple_fsm_state_init(b)
    rng = np.random.RandomState(9)
    rand = jnp.asarray(rng.randint(0, 5, size=(steps, b, 4)), jnp.int32)

    ref, ref_fsm = pallas_rollout_chunk(
        csb, 0, steps=steps, interpret=True, policy="simple",
        moves=rand, auto_reset=False, fsm_state=fsm,
    )

    mesh = boards_mesh()
    run = sharded_chunk_rollout(
        mesh, steps=steps, policy="simple", interpret=True, inject=True,
        auto_reset=False,
    )
    got, got_fsm = run(shard_batch(csb, mesh), 0,
                       fsm_state=shard_batch(fsm, mesh), moves=rand)

    for name in type(ref)._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name)),
            err_msg=f"field {name}",
        )
    for i, (a, c) in enumerate(zip(ref_fsm, got_fsm)):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(c), err_msg=f"fsm carry {i}"
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_chunk_fsm_auto_reset_matches_unsharded():
    """FSM chunk WITH the auto-reset path under the mesh (VERDICT r4 item
    5): boards that finish mid-chunk are replaced through the real reset
    merge (fresh terrain injected -- the PRNG primitive is TPU-only), and
    the sharded run is bit-identical to the unsharded one."""
    import jax.numpy as jnp

    from pomcpp_tpu.core.board_gen import random_cell_state
    from pomcpp_tpu.core.constants import C_RIGID
    from pomcpp_tpu.engine.pallas_step import (
        pallas_rollout_chunk,
        simple_fsm_state_init,
    )
    from pomcpp_tpu.parallel import sharded_chunk_rollout

    steps, b = 6, 16
    csb = jax.vmap(random_cell_state)(
        jax.random.split(jax.random.PRNGKey(31), b)
    )
    # Boards 0 and 9 start finished (one live agent) -> reset at step 1.
    dead = np.zeros((b, 4), bool)
    dead[0, 1:] = True
    dead[9, 1:] = True
    csb = csb._replace(
        agent_dead=jnp.asarray(dead),
        alive_count=jnp.asarray(4 - dead.sum(1), jnp.int32),
    )
    fsm = simple_fsm_state_init(b)
    rng = np.random.RandomState(13)
    rand = jnp.asarray(rng.randint(0, 5, size=(steps, b, 4)), jnp.int32)
    fresh = jax.vmap(random_cell_state)(
        jax.random.split(jax.random.PRNGKey(77), b)
    )
    fb, fh = fresh.board, fresh.hidden_pow

    ref, ref_fsm = pallas_rollout_chunk(
        csb, 0, steps=steps, interpret=True, policy="simple",
        moves=rand, auto_reset=True, fsm_state=fsm, reset_boards=(fb, fh),
    )
    # The finished boards really went through the reset: all four agents
    # alive again (a fresh board has no bombs, so 6 steps cannot kill),
    # and the rigid terrain equals the injected fresh plane's (rigid cells
    # never change).
    for g in (0, 9):
        assert int(ref.alive_count[g]) == 4
        np.testing.assert_array_equal(
            np.asarray(ref.board[g] == C_RIGID),
            np.asarray(fb[g] == C_RIGID),
        )

    mesh = boards_mesh()
    run = sharded_chunk_rollout(
        mesh, steps=steps, policy="simple", interpret=True, inject=True,
        auto_reset=True, inject_reset=True,
    )
    got, got_fsm = run(
        shard_batch(csb, mesh), 0, fsm_state=shard_batch(fsm, mesh),
        moves=rand, reset_boards=shard_batch((fb, fh), mesh),
    )
    for name in type(ref)._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name)),
            err_msg=f"field {name}",
        )
    for i, (a, c) in enumerate(zip(ref_fsm, got_fsm)):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(c), err_msg=f"fsm carry {i}"
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_opponent_curriculum_train_step_sharded():
    """PPO-vs-SimpleAgent train step over the 8-device boards mesh: the
    opponent FSM state shards alongside the env and the update is finite."""
    from pomcpp_tpu.learner import PPOConfig, ppo_init, ppo_train_step
    from pomcpp_tpu.learner.ppo import opponent_state_init
    from pomcpp_tpu.parallel import shard_batch

    cfg = PPOConfig(rollout_len=2, epochs=1, minibatches=2,
                    opponent="simple", learner_slots=(0,))
    ts = ppo_init(jax.random.PRNGKey(0), cfg)
    batch = 16
    es = jax.vmap(lambda k: env_reset(k, engine="cellular"))(
        jax.random.split(jax.random.PRNGKey(1), batch)
    )
    mesh = boards_mesh()
    es = shard_env_batch(es, mesh)
    opp = shard_batch(opponent_state_init(batch), mesh)

    step = jax.jit(lambda ts, es, opp: ppo_train_step(ts, es, cfg, opp))
    ts2, es2, metrics, opp2 = step(ts, es, opp)
    assert int(ts2.update_count) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert len({s.device for s in opp2.rp_x.addressable_shards}) == 8
