"""Checkpoint save/restore roundtrip (npz backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pomcpp_tpu.learner import PPOConfig, ppo_init
from pomcpp_tpu.utils import restore_checkpoint, save_checkpoint


def test_train_state_roundtrip(tmp_path):
    ts = ppo_init(jax.random.PRNGKey(3), PPOConfig(rollout_len=4))
    ts = ts._replace(update_count=jnp.asarray(7, jnp.int32))
    save_checkpoint(str(tmp_path / "ck"), ts)

    fresh = ppo_init(jax.random.PRNGKey(99), PPOConfig(rollout_len=4))
    restored = restore_checkpoint(str(tmp_path / "ck"), fresh)
    assert int(restored.update_count) == 7
    for a, b in zip(jax.tree.leaves(ts), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_env_state_roundtrip(tmp_path):
    from pomcpp_tpu.env import env_reset

    es = jax.vmap(lambda k: env_reset(k, engine="cellular"))(
        jax.random.split(jax.random.PRNGKey(1), 4)
    )
    save_checkpoint(str(tmp_path / "env"), es)
    es2 = restore_checkpoint(str(tmp_path / "env"), es)
    for a, b in zip(jax.tree.leaves(es), jax.tree.leaves(es2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_replay_roundtrip(tmp_path):
    from pomcpp_tpu.core.board_gen import random_cell_state
    from pomcpp_tpu.engine.cellular import cellular_step
    from pomcpp_tpu.utils import load_replay, record_game, replay_frame, save_replay

    game = random_cell_state(jax.random.PRNGKey(4))
    rng = np.random.RandomState(0)
    jstep = jax.jit(cellular_step)
    states, moves = record_game(
        game, jstep, lambda t, g: jnp.asarray(rng.randint(0, 6, 4), jnp.int32), 10
    )
    p = str(tmp_path / "replay.npz")
    save_replay(p, states, moves)
    loaded, moves2 = load_replay(p, game)
    np.testing.assert_array_equal(moves, moves2)
    for a, b in zip(jax.tree.leaves(states), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Replaying a frame renders.
    from pomcpp_tpu.render import render_state

    out = render_state(replay_frame(loaded, 5), color=False)
    assert "t=" in out


def test_orbax_roundtrip():
    """The orbax backend (sync Checkpointer, r5 -- the async
    StandardCheckpointer commit barrier wedges in sandboxed containers)
    round-trips a TrainState like the npz default."""
    import tempfile

    import numpy as np

    ts = ppo_init(jax.random.PRNGKey(5), PPOConfig(rollout_len=4))
    ts = ts._replace(update_count=jnp.asarray(11, jnp.int32))
    d = tempfile.mkdtemp() + "/ck"
    save_checkpoint(d, ts._asdict(), backend="orbax")
    fresh = ppo_init(jax.random.PRNGKey(77), PPOConfig(rollout_len=4))
    restored = restore_checkpoint(d, fresh._asdict(), backend="orbax")
    assert int(restored["update_count"]) == 11
    for a, b in zip(jax.tree.leaves(ts._asdict()), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_artifact_checkpoint_matches_model_template():
    """The checked-in trained weights (artifacts/ppo_vs_simple/) restore
    into the current ActorCritic template -- guards model/artifact drift."""
    import os

    import jax
    import numpy as np

    from pomcpp_tpu.learner import ppo_init
    from pomcpp_tpu.utils import restore_checkpoint

    art = os.path.join(
        os.path.dirname(__file__), "..", "artifacts", "ppo_vs_simple"
    )
    ts = restore_checkpoint(art, ppo_init(jax.random.PRNGKey(0)))
    assert int(ts.update_count) == 2000
    assert all(
        np.isfinite(np.asarray(leaf)).all()
        for leaf in jax.tree.leaves(ts.params)
    )
